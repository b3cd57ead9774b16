"""Pallas TPU kernel for the windowed-bilinear sampling hot path.

The tracker's innermost op (ops.window_sampling.window_bilinear) evaluates,
for every keypoint n, bilinear samples of its [C, win, win] image window at
S = frames x patch x virtual-poses positions:

    out[n, c, s] = valid[n, s] * sum_ij W[n,c,i,j] hat(y_ns - i) hat(x_ns - j)

The XLA lowering materializes both separable hat-weight tensors
([N, S, win] each) and the row-contracted intermediate ([N, C, win, S]) in
HBM between fusions — ~3x the traffic of the inputs. This kernel fuses
weight construction + both contractions + masking into one VMEM-resident
pass per keypoint tile: HBM sees only the windows, the coordinates, and the
[N, C, S] output.

This is the TPU counterpart of the reference's fused
kernel_compute_pixel_jacobian_residual
(/root/reference/src/ba_tracker/compute_hessian_gradients_cost.cu:23-156),
whose inner loop is exactly a bilinear sample + shared-memory accumulate;
here one grid step owns a keypoint TILE and the per-sample loop becomes an
MXU contraction over the window rows.

Semantics are bit-compatible with window_bilinear (same operation order:
y/sublane contraction first, then the lane-axis reduction — the measured-
faster association, see window_bilinear_xla); `pallas_window_bilinear` is
differentiation-free by design — it is called under
ops.window_sampling.sample_windows_lk's custom JVP, which routes position
tangents through the gradient channels, so no grad rules are needed here.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# keypoints per grid step. VMEM per step scales with
# TILE_N * (C*win*win + ~4*S + C*win*S) * 4 B: the row-contracted
# intermediate [TN, C, win, S] dominates at large S (TN=128 @ S=320 would
# need ~16 MB and fails to compile), while small-S production shapes run
# measurably faster with bigger tiles (17.9 us @ TILE 128 vs 21 us @ 32 at
# S=40, r04). Chosen per call in pallas_window_bilinear.
TILE_N = 32


def _tile_for(S: int) -> int:
    return 128 if S <= 64 else TILE_N


def _kernel(win_ref, xy_ref, valid_ref, out_ref):
    """One keypoint tile: fused hat weights + two contractions + mask.

    win_ref:   [TN, C, win_h, win_w] VMEM
    xy_ref:    [TN, S, 2]            VMEM window-relative sample coordinates
    valid_ref: [TN, S]               VMEM validity mask
    out_ref:   [TN, C, S]            VMEM
    """
    TN, C, win_h, win_w = win_ref.shape
    S = xy_ref.shape[1]
    dtype = out_ref.dtype

    gx = jax.lax.broadcasted_iota(jnp.int32, (1, S, win_w), 2).astype(dtype)
    gy = jax.lax.broadcasted_iota(jnp.int32, (1, S, win_h), 2).astype(dtype)
    x = xy_ref[:, :, 0][:, :, None]                       # [TN, S, 1]
    y = xy_ref[:, :, 1][:, :, None]
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(x - gx))          # [TN, S, win_w]
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(y - gy))          # [TN, S, win_h]

    # Y (sublane axis) first — matches window_bilinear_xla's measured-faster
    # association: A[n, (c j), s] = sum_i W[n, c, i, j] wy[n, s, i]
    Wt = jnp.swapaxes(win_ref[:], 2, 3).reshape(TN, C * win_w, win_h)
    A = jax.lax.dot_general(
        Wt, wy,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=dtype,
    )                                                      # [TN, C*win_w, S]
    A = A.reshape(TN, C, win_w, S)
    # lane-axis reduction on the VPU: out[n,c,s] = sum_j A[n,c,j,s] wx[n,s,j]
    wxT = jnp.swapaxes(wx, 1, 2)[:, None]                  # [TN, 1, win_w, S]
    out = jnp.sum(A * wxT, axis=2)                         # [TN, C, S]
    out_ref[:] = out * valid_ref[:][:, None, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_window_bilinear(
    windows: jnp.ndarray,   # [N, C, win, win]
    local_xy: jnp.ndarray,  # [N, S, 2]
    valid: jnp.ndarray,     # [N, S]
    interpret: bool = False,
) -> jnp.ndarray:
    """[N, C, S] fused bilinear window sampling (see module docstring).

    N is padded to a TILE_N multiple internally; out-of-range tiles read
    zero-padded windows and write discarded rows.
    """
    N, C, win_h, win_w = windows.shape
    S = local_xy.shape[1]
    dtype = windows.dtype
    tile = _tile_for(S)

    n_pad = (-N) % tile
    if n_pad:
        windows = jnp.concatenate(
            [windows, jnp.zeros((n_pad, C, win_h, win_w), dtype)], axis=0
        )
        local_xy = jnp.concatenate(
            [local_xy, jnp.zeros((n_pad, S, 2), local_xy.dtype)], axis=0
        )
        valid = jnp.concatenate(
            [valid, jnp.zeros((n_pad, S), valid.dtype)], axis=0
        )
    Np = N + n_pad

    out = pl.pallas_call(
        _kernel,
        grid=(Np // tile,),
        in_specs=[
            pl.BlockSpec((tile, C, win_h, win_w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, S, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, C, S), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, C, S), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Np * C * win_h * win_w * S + 2 * Np * C * win_h * S,
            bytes_accessed=(Np * C * win_h * win_w + Np * S * 3
                            + Np * C * S) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(windows, local_xy.astype(dtype), valid.astype(dtype))
    return out[:N]


def pallas_available() -> bool:
    """True when the default backend can run Mosaic kernels (TPU)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
