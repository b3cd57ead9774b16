"""Semi-dense feature detection with grid non-maximum suppression, jittable.

TPU re-design of the reference detector stack
(FeatureDetectorSemiDense.cpp:16-58 + FeatureDetectorBase.cpp:49-92):

  * candidate = every pixel whose gradient magnitude exceeds a threshold;
  * grid NMS keeps the max-response candidate per cell, cell size shrinking
    by 1/sqrt(2) per pyramid level;
  * instead of std::vector outputs, results are fixed-size [max_keypoints]
    arrays + a validity mask (top-k by response over cells), so detection
    jits and the downstream tracker keeps static shapes.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DetectorOptions:
    """Reference FeatureDetectorOptions (FeatureDetectorBase.h:19-29) +
    the tracker's hardwired choices (blur_aware_direct_tracker.cpp:355-360)."""

    score_threshold: float = 25.0
    cell_h: int = 30
    cell_w: int = 30
    max_keypoints: int = 512


def _cell_size_at_level(cell: int, level: int) -> int:
    """Cell shrinks by 1.414^level (FeatureDetectorBase.cpp:61-62)."""
    return max(1, int(cell / math.pow(1.414, level)))


def detect_semidense(
    grad_mag: jnp.ndarray,
    level: int,
    opts: DetectorOptions,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Detect up to max_keypoints semi-dense features on one pyramid level.

    grad_mag: [H, W] gradient-magnitude image of this level.
    Returns (kp_xy [M, 2] float, response [M], mask [M] float) with
    M = opts.max_keypoints; invalid slots have mask 0 and position (0, 0).
    """
    H, W = grad_mag.shape
    ch = _cell_size_at_level(opts.cell_h, level)
    cw = _cell_size_at_level(opts.cell_w, level)
    n_ch = H // ch + 1
    n_cw = W // cw + 1

    resp = jnp.where(grad_mag > opts.score_threshold, grad_mag, 0.0)
    padded = jnp.zeros((n_ch * ch, n_cw * cw), dtype=resp.dtype)
    padded = padded.at[:H, :W].set(resp)
    cells = padded.reshape(n_ch, ch, n_cw, cw).transpose(0, 2, 1, 3)
    cells = cells.reshape(n_ch, n_cw, ch * cw)

    best = jnp.argmax(cells, axis=-1)           # [n_ch, n_cw]
    best_val = jnp.take_along_axis(cells, best[..., None], axis=-1)[..., 0]

    cy = jax.lax.broadcasted_iota(jnp.int32, (n_ch, n_cw), 0)
    cx = jax.lax.broadcasted_iota(jnp.int32, (n_ch, n_cw), 1)
    py = cy * ch + best // cw
    px = cx * cw + best % cw

    flat_val = best_val.reshape(-1)
    flat_x = px.reshape(-1)
    flat_y = py.reshape(-1)

    m = opts.max_keypoints
    n_cells = flat_val.shape[0]
    if n_cells < m:
        pad = m - n_cells
        flat_val = jnp.concatenate([flat_val, jnp.zeros((pad,), flat_val.dtype)])
        flat_x = jnp.concatenate([flat_x, jnp.zeros((pad,), flat_x.dtype)])
        flat_y = jnp.concatenate([flat_y, jnp.zeros((pad,), flat_y.dtype)])
    top_val, top_idx = jax.lax.top_k(flat_val, m)

    xs = flat_x[top_idx].astype(grad_mag.dtype)
    ys = flat_y[top_idx].astype(grad_mag.dtype)
    # response must actually clear the threshold (cells with no candidate
    # have response 0; the reference drops response < 1e-6 cells,
    # FeatureDetectorBase.cpp:85-88)
    mask = (top_val > 1e-6).astype(grad_mag.dtype)
    kp_xy = jnp.stack([xs, ys], axis=-1) * mask[:, None]
    return kp_xy, top_val, mask


detect_semidense_jit = jax.jit(detect_semidense, static_argnums=(1, 2))


def refine_subpixel(
    resp: jnp.ndarray, kp_xy: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Sub-pixel corner refinement by per-axis parabola fit on the response.

    Parity with the reference's cv::cornerSubPix step
    (FeatureDetectorSparse.cpp:55-60), TPU-style: for each integer-pixel
    keypoint, the 1D quadratic through (r[-1], r[0], r[+1]) along each axis
    peaks at offset -0.5 (r[+1]-r[-1]) / (r[+1]-2 r[0]+r[-1]); offsets are
    clamped to +-0.5 px and zeroed at flat/invalid points. Integer-pixel
    detections carry +-0.5 px quantization noise that dominates reprojection
    BA at small baselines — this brings corners to ~0.1 px.
    """
    H, W = resp.shape
    xi = jnp.clip(kp_xy[:, 0].astype(jnp.int32), 1, W - 2)
    yi = jnp.clip(kp_xy[:, 1].astype(jnp.int32), 1, H - 2)

    def at(dy, dx):
        return resp[yi + dy, xi + dx]

    def axis_offset(rm, r0, rp):
        denom = rp - 2.0 * r0 + rm
        off = jnp.where(jnp.abs(denom) > 1e-12, -0.5 * (rp - rm) / denom, 0.0)
        return jnp.clip(off, -0.5, 0.5)

    ox = axis_offset(at(0, -1), at(0, 0), at(0, 1))
    oy = axis_offset(at(-1, 0), at(0, 0), at(1, 0))
    refined = kp_xy + jnp.stack([ox, oy], axis=-1).astype(kp_xy.dtype)
    return jnp.where(mask[:, None] > 0, refined, kp_xy)
