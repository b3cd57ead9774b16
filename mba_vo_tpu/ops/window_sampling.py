"""MXU-mapped bilinear sampling: per-keypoint windows + hat-weight matmuls.

Why: XLA lowers arbitrary-index gathers on TPU to scalar loops — the direct
sampling path achieves well under 1 GB/s effective gather bandwidth
(bench_kernels.py). But the blur-aware tracker's samples are not arbitrary:
for one keypoint, all patch-pixel x virtual-pose samples land inside a small
neighborhood of the warped anchor (patch radius + blur-kernel length). So:

  1. extract one [win, win] window per keypoint around its anchor with a
     vmapped ``lax.dynamic_slice`` — contiguous-row DMA, fast;
  2. evaluate bilinear interpolation *inside* the window as two small
     contractions with separable hat weights:
         value[s] = sum_ij hat(y_s - i) * window[i, j] * hat(x_s - j)
     where hat(d) = max(0, 1 - |d|) — exactly bilinear, built densely on the
     VPU and contracted on the MXU. No gather anywhere.

Samples outside the window or outside the image contribute 0 (consistent
with the reference's failed-warp convention). Window size bounds the blur
kernel length the model can represent; the tracker's keyframe criterion
(keyframe_max_blur_kernel_mag) bounds it in the same units.

The Lucas-Kanade derivative convention is preserved: windows carry 3
channels (I, dI/dx, dI/dy) and ``sample_windows_lk`` is a custom JVP whose
position-tangent samples the gradient channels.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def stack_image_channels(img: jnp.ndarray, grad: jnp.ndarray) -> jnp.ndarray:
    """[3, H, W] stacked (I, gx, gy) for windowed extraction."""
    return jnp.stack([img, grad[..., 0], grad[..., 1]], axis=0)


def extract_windows(
    chans: jnp.ndarray, centers: jnp.ndarray, win: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Extract [N, C, win, win] windows centered (as close as borders allow)
    on ``centers`` [N, 2] (x, y). Returns (windows, starts [N, 2] int32 (x0, y0)).
    """
    C, H, W = chans.shape
    cx = jnp.floor(centers[:, 0]).astype(jnp.int32) - win // 2
    cy = jnp.floor(centers[:, 1]).astype(jnp.int32) - win // 2
    x0 = jnp.clip(cx, 0, max(W - win, 0))
    y0 = jnp.clip(cy, 0, max(H - win, 0))

    zero = jnp.int32(0)

    def one(x0_, y0_):
        return lax.dynamic_slice(chans, (zero, y0_, x0_), (C, win, win))

    windows = jax.vmap(one)(x0, y0)
    return windows, jnp.stack([x0, y0], axis=-1)


def _hat_weights(coord: jnp.ndarray, win: int) -> jnp.ndarray:
    """[..., win] bilinear hat weights: w[i] = max(0, 1 - |coord - i|)."""
    grid = jnp.arange(win, dtype=coord.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coord[..., None] - grid))


def window_bilinear(
    windows: jnp.ndarray,   # [N, C, win, win]
    local_xy: jnp.ndarray,  # [N, S, 2] window-relative coords
    valid: jnp.ndarray,     # [N, S] bool/float — global validity
) -> jnp.ndarray:
    """[N, C, S] bilinear samples of every channel, via two MXU contractions.

    Out-of-window coords produce 0 automatically (hat weights vanish beyond
    the window); ``valid`` additionally masks samples whose *global* position
    is outside the image.
    """
    win = windows.shape[-1]
    wx = _hat_weights(local_xy[..., 0], win)   # [N, S, win]
    wy = _hat_weights(local_xy[..., 1], win)   # [N, S, win]
    # rows first: A[n, c, i, s] = sum_j windows[n,c,i,j] * wx[n,s,j]
    A = jnp.einsum("ncij,nsj->ncis", windows, wx)
    out = jnp.einsum("ncis,nsi->ncs", A, wy)
    return out * valid[:, None, :]


@jax.custom_jvp
def sample_windows_lk(
    windows: jnp.ndarray, local_xy: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """[N, S] intensity samples (channel 0) with the Lucas-Kanade JVP:
    position tangents sample the gradient channels (1, 2) — the windowed
    counterpart of ops.image.sample_lk."""
    return window_bilinear(windows[:, :1], local_xy, valid)[:, 0]


def _sample_windows_lk_jvp(primals, tangents):
    windows, local_xy, valid = primals
    dwin, dxy, _dvalid = tangents
    allc = window_bilinear(windows, local_xy, valid)   # [N, 3, S]
    val = allc[:, 0]
    tangent = jnp.zeros_like(val)
    if not isinstance(dxy, jax.custom_derivatives.SymbolicZero):
        tangent = tangent + (
            allc[:, 1] * dxy[..., 0] + allc[:, 2] * dxy[..., 1]
        )
    if not isinstance(dwin, jax.custom_derivatives.SymbolicZero):
        tangent = tangent + window_bilinear(dwin[:, :1], local_xy, valid)[:, 0]
    return val, tangent


sample_windows_lk.defjvp(_sample_windows_lk_jvp, symbolic_zeros=True)
