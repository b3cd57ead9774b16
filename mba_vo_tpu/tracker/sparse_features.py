"""Sparse corner features: Shi-Tomasi detection, oriented-BRIEF descriptors,
and MXU-friendly Hamming matching.

Parity for the reference's sparse detector (FeatureDetectorSparse.cpp:28-121:
ORB or Shi-Tomasi + cornerSubPix + ORB descriptors via OpenCV), re-designed
TPU-first:

  * Shi-Tomasi response = min eigenvalue of the box-summed structure tensor,
    computed densely and grid-NMS'd like the semi-dense detector;
  * descriptors are oriented BRIEF: a fixed seeded 256-pair pattern rotated
    by the intensity-centroid orientation (the ORB construction), sampled
    with bilinear gathers;
  * matching: descriptors as {-1,+1} float vectors, so the full Hamming
    distance matrix is ONE matmul on the MXU —
    ham = (bits - a.b)/2 — followed by a mutual-best + Lowe-ratio test, all
    jitted. The reference's k-d tree radius gating is available through the
    native runtime (runtime/bindings.KDTree2D) on the host side.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.image import bilinear_sample, image_gradients
from .detector import DetectorOptions, detect_semidense, refine_subpixel

NUM_BRIEF_BITS = 256
_PATCH_RADIUS = 15


def brief_pattern(seed: int = 7) -> np.ndarray:
    """[256, 4] (ax, ay, bx, by) BRIEF test pairs, Gaussian-distributed in a
    31x31 patch (the classic BRIEF-31 construction)."""
    rng = np.random.default_rng(seed)
    pts = np.clip(
        rng.normal(0.0, _PATCH_RADIUS / 2.5, (NUM_BRIEF_BITS, 4)),
        -_PATCH_RADIUS, _PATCH_RADIUS,
    )
    return pts.astype(np.float32)


class SparseFeatures(NamedTuple):
    kp_xy: jnp.ndarray       # [N, 2]
    response: jnp.ndarray    # [N]
    mask: jnp.ndarray        # [N]
    orientation: jnp.ndarray  # [N] radians
    descriptors: jnp.ndarray  # [N, 256] in {-1, +1} (0 rows for masked slots)


def shi_tomasi_response(img: jnp.ndarray, window: int = 3) -> jnp.ndarray:
    """Min-eigenvalue corner response of the box-summed structure tensor."""
    g = image_gradients(img)
    gx, gy = g[..., 0], g[..., 1]
    xx, yy, xy = gx * gx, gy * gy, gx * gy

    def box(a):
        k = jnp.ones((window, window), a.dtype) / (window * window)
        return jax.scipy.signal.convolve2d(a, k, mode="same")

    sxx, syy, sxy = box(xx), box(yy), box(xy)
    tr = sxx + syy
    det = sxx * syy - sxy * sxy
    disc = jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0))
    return 0.5 * (tr - disc)


def orientation_ic(img: jnp.ndarray, kp_xy: jnp.ndarray,
                   radius: int = 7) -> jnp.ndarray:
    """Intensity-centroid orientation (the ORB construction): theta =
    atan2(m01, m10) over a disc around each keypoint."""
    r = np.arange(-radius, radius + 1)
    ox, oy = np.meshgrid(r, r)
    keep = (ox ** 2 + oy ** 2) <= radius ** 2
    ox = jnp.asarray(ox[keep], img.dtype)
    oy = jnp.asarray(oy[keep], img.dtype)
    pos = kp_xy[:, None, :] + jnp.stack(
        [jnp.broadcast_to(ox, (kp_xy.shape[0], ox.shape[0])),
         jnp.broadcast_to(oy, (kp_xy.shape[0], oy.shape[0]))], axis=-1
    )
    vals = bilinear_sample(img, pos)  # [N, P]
    m10 = jnp.sum(vals * ox[None, :], axis=1)
    m01 = jnp.sum(vals * oy[None, :], axis=1)
    return jnp.arctan2(m01, m10)


def brief_descriptors(
    img: jnp.ndarray, kp_xy: jnp.ndarray, orientation: jnp.ndarray,
    pattern: jnp.ndarray,
) -> jnp.ndarray:
    """[N, 256] descriptors in {-1, +1}: sign of I(p + R a) - I(p + R b)."""
    c, s = jnp.cos(orientation), jnp.sin(orientation)

    def rotate(off_x, off_y):
        # [N, 256] rotated offsets
        rx = c[:, None] * off_x[None, :] - s[:, None] * off_y[None, :]
        ry = s[:, None] * off_x[None, :] + c[:, None] * off_y[None, :]
        return rx, ry

    ax, ay = rotate(pattern[:, 0], pattern[:, 1])
    bx, by = rotate(pattern[:, 2], pattern[:, 3])
    pa = kp_xy[:, None, :] + jnp.stack([ax, ay], axis=-1)
    pb = kp_xy[:, None, :] + jnp.stack([bx, by], axis=-1)
    va = bilinear_sample(img, pa)
    vb = bilinear_sample(img, pb)
    return jnp.where(va < vb, 1.0, -1.0).astype(img.dtype)


@partial(jax.jit, static_argnums=(1, 2))
def detect_sparse(
    img: jnp.ndarray, opts: DetectorOptions, level: int = 0,
    pattern: jnp.ndarray = None,
) -> SparseFeatures:
    """Shi-Tomasi corners + grid NMS + sub-pixel refinement + oriented
    BRIEF, one jitted call (reference FeatureDetectorSparse.cpp:28-121:
    Shi-Tomasi + cornerSubPix + ORB descriptors)."""
    if pattern is None:
        pattern = jnp.asarray(brief_pattern())
    resp = shi_tomasi_response(img)
    kp_xy, response, mask = detect_semidense(resp, level, opts)
    kp_xy = refine_subpixel(resp, kp_xy, mask)
    theta = orientation_ic(img, kp_xy)
    desc = brief_descriptors(img, kp_xy, theta, pattern)
    desc = desc * mask[:, None]
    return SparseFeatures(
        kp_xy=kp_xy, response=response, mask=mask,
        orientation=theta, descriptors=desc,
    )


@jax.jit
def match_descriptors(
    a: SparseFeatures, b: SparseFeatures,
    max_hamming: float = 80.0, ratio: float = 0.8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mutual-best Hamming matching with Lowe ratio test.

    Returns (match_idx [Na] int32 — index into b or -1, distance [Na]).
    The full distance matrix is one MXU matmul:
        hamming = (bits - a . b^T) / 2   for {-1,+1} descriptors.
    """
    dot = a.descriptors @ b.descriptors.T  # [Na, Nb] MXU
    ham = 0.5 * (NUM_BRIEF_BITS - dot)
    big = jnp.asarray(1e9, ham.dtype)
    valid = (a.mask[:, None] > 0) & (b.mask[None, :] > 0)
    ham = jnp.where(valid, ham, big)

    best_j = jnp.argmin(ham, axis=1)                    # [Na]
    best_d = jnp.take_along_axis(ham, best_j[:, None], axis=1)[:, 0]
    # second best for ratio test
    ham_wo = ham.at[jnp.arange(ham.shape[0]), best_j].set(big)
    second_d = jnp.min(ham_wo, axis=1)
    # mutual check
    best_i_of_b = jnp.argmin(ham, axis=0)               # [Nb]
    mutual = best_i_of_b[best_j] == jnp.arange(ham.shape[0])

    ok = (
        (best_d <= max_hamming)
        & (best_d <= ratio * second_d)
        & mutual
        & (a.mask > 0)
    )
    return jnp.where(ok, best_j, -1).astype(jnp.int32), best_d
