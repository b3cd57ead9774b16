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

import os
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
    """Extract [N, C, win_h, win_w] windows centered (as close as borders
    allow) on ``centers`` [N, 2] (x, y), with win_h = min(win, H) and
    win_w = min(win, W) — coarse pyramid levels can be smaller than the
    configured window, in which case the window IS the whole level axis.
    Returns (windows, starts [N, 2] int32 (x0, y0)).
    """
    C, H, W = chans.shape
    win_h = min(win, H)
    win_w = min(win, W)
    cx = jnp.floor(centers[:, 0]).astype(jnp.int32) - win_w // 2
    cy = jnp.floor(centers[:, 1]).astype(jnp.int32) - win_h // 2
    x0 = jnp.clip(cx, 0, max(W - win_w, 0))
    y0 = jnp.clip(cy, 0, max(H - win_h, 0))

    zero = jnp.int32(0)

    def one(x0_, y0_):
        return lax.dynamic_slice(chans, (zero, y0_, x0_), (C, win_h, win_w))

    windows = jax.vmap(one)(x0, y0)
    return windows, jnp.stack([x0, y0], axis=-1)


def _hat_weights(coord: jnp.ndarray, win: int) -> jnp.ndarray:
    """[..., win] bilinear hat weights: w[i] = max(0, 1 - |coord - i|)."""
    grid = jnp.arange(win, dtype=coord.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coord[..., None] - grid))


def _use_pallas(dtype) -> bool:
    """Route window sampling through the fused Mosaic kernel on TPU f32
    when MBA_VO_USE_PALLAS=1.

    Opt-IN, with r04 measurements behind the decision (kexp experiment
    sweep on the real chip, summarized in BENCH_KERNELS_r04.json notes):

      * XLA's lowering of the hat-weight contractions is the right TPU
        program at these shapes; reordering it y-first (window_bilinear_xla)
        beat the r03 ordering 1.6x at S=320 and 3.6x at the production
        S=40 shape — that is where the round's sampling-core win came from.
      * the Pallas dense-hat kernel's batched K=32 matmuls run ~5x slower
        than XLA's batched-dot emitter under this Mosaic version;
      * per-sample gather formulations are catastrophic (take_along_axis
        4-tap: ~550x slower — TPU scalarizes gathers), confirming dense
        contractions as the only viable structure;
      * restructured Mosaic variants (swapped contraction layouts,
        bf16 operands, lane-packed block-diagonal batching) either exceed
        VMEM at S=320 or crash this toolchain's remote Mosaic compiler.

    The kernel stays as the diff-tested fusion baseline; bench_kernels.py
    A/Bs both paths every round."""
    if not os.environ.get("MBA_VO_USE_PALLAS"):
        return False
    if dtype != jnp.float32:
        return False   # Mosaic TPU kernels are f32; f64 is the CPU test path
    from .pallas_sampling import pallas_available

    return pallas_available()


def window_bilinear_xla(
    windows: jnp.ndarray,   # [N, C, win_h, win_w]
    local_xy: jnp.ndarray,  # [N, S, 2] window-relative coords
    valid: jnp.ndarray,     # [N, S] bool/float — global validity
) -> jnp.ndarray:
    """Pure-XLA lowering: two einsum contractions with materialized hat
    weights. The differential-test reference for the Pallas kernel, and the
    fallback off-TPU / in f64. Windows may be rectangular (clamped at small
    pyramid levels, see extract_windows).

    Contraction order: the Y (sublane) axis of the windows contracts FIRST.
    Measured on chip this is 1.6x faster than x-first at S=320 and 3.6x at
    the production S=40 shape (kexp r04): contracting the lane axis (j)
    first forces an internal window transpose, while the sublane axis (i)
    contracts natively. Same math, different association — differences are
    bf16-MXU-pass rounding only."""
    wx = _hat_weights(local_xy[..., 0], windows.shape[-1])   # [N, S, win_w]
    wy = _hat_weights(local_xy[..., 1], windows.shape[-2])   # [N, S, win_h]
    # columns first: A[n, c, j, s] = sum_i windows[n,c,i,j] * wy[n,s,i]
    A = jnp.einsum("ncij,nsi->ncjs", windows, wy)
    out = jnp.einsum("ncjs,nsj->ncs", A, wx)
    return out * valid[:, None, :]


def window_bilinear(
    windows: jnp.ndarray,   # [N, C, win, win]
    local_xy: jnp.ndarray,  # [N, S, 2] window-relative coords
    valid: jnp.ndarray,     # [N, S] bool/float — global validity
) -> jnp.ndarray:
    """[N, C, S] bilinear samples of every channel.

    Out-of-window coords produce 0 automatically (hat weights vanish beyond
    the window); ``valid`` additionally masks samples whose *global* position
    is outside the image. On TPU f32 this dispatches to the fused Pallas
    kernel (ops.pallas_sampling); elsewhere to the XLA einsum pair.
    """
    if _use_pallas(windows.dtype):
        from .pallas_sampling import pallas_window_bilinear

        return pallas_window_bilinear(
            windows, local_xy.astype(windows.dtype),
            valid.astype(windows.dtype),
        )
    return window_bilinear_xla(windows, local_xy, valid)


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
