"""Sampling-core kernel variant sweep (r04) — the measurements behind the
y-first contraction reorder in ops/window_sampling.py.

Measured on TPU v5 lite (remote-attached; two-scan-length differencing;
within-run comparisons are the meaningful ones):

  shape N=512, C=3, win=32        S=320        S=40 (production)
  xla_einsum (r03 x-first)        72.5 us      15.6 us
  xla_yfirst  (shipped)           45.3 us       4.3 us   <- 1.6x / 3.6x
  xla_triple (one 3-op einsum)    62.7 us      13.4 us
  xla_bf16 inputs                 48.6 us      14.2 us
  xla_4tap take_along_axis     24286   us    3507   us   (gathers scalarize)
  pallas v0 dense-hat            217   us      21   us
  pallas v0 TILE=64/128          VMEM-fail     17.9-19.2 us
  pallas swapped-contraction / bf16-operand / lane-packed variants:
     crash this toolchain's remote Mosaic compiler (HTTP 500) or exceed
     VMEM at S=320; lane-packed block-diagonal additionally hits an
     unimplemented scatter lowering.

Conclusion shipped: the dense hat-weight contraction IS the right TPU
program for scattered bilinear sampling (one-hot contraction == the
gather); the win is ordering it so the windows' sublane axis contracts
first. The Pallas kernel mirrors the shipped ordering and remains the
diff-tested opt-in baseline.

This file reproduces the sweep: PYTHONPATH=<repo> python
experiments/kernel_variants_r04.py (needs the real chip).
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from mba_vo_tpu.ops.window_sampling import window_bilinear_xla, _hat_weights
from mba_vo_tpu.ops.pallas_sampling import pallas_window_bilinear, _kernel
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, C, WIN = 512, 3, 32


def make_inputs(S, seed=0):
    rng = np.random.default_rng(seed)
    windows = jnp.asarray(rng.normal(0, 1, (N, C, WIN, WIN)), jnp.float32)
    xy = jnp.asarray(rng.uniform(-2, WIN + 1, (N, S, 2)), jnp.float32)
    valid = jnp.asarray(rng.integers(0, 2, (N, S)), jnp.float32)
    return windows, xy, valid


def bench(name, f, args, R1=200, R2=1200):
    def make(R):
        @jax.jit
        def run(*a):
            def body(c, _):
                out = f(a[0], a[1] + c, *a[2:])
                return out.sum() * 1e-30, None
            tot, _ = lax.scan(body, jnp.float32(0.0), None, length=R)
            return tot
        return run
    g1, g2 = make(R1), make(R2)
    float(g1(*args)); float(g2(*args))
    t0 = time.time(); float(g1(*args)); t1 = time.time()
    float(g2(*args)); t2 = time.time()
    per = ((t2 - t1) - (t1 - t0)) / (R2 - R1)
    print(f"{name:34s} {per*1e6:8.2f} us", flush=True)
    return per


def xla_triple(windows, local_xy, valid):
    wx = _hat_weights(local_xy[..., 0], windows.shape[-1])
    wy = _hat_weights(local_xy[..., 1], windows.shape[-2])
    out = jnp.einsum("ncij,nsj,nsi->ncs", windows, wx, wy)
    return out * valid[:, None, :]


def xla_yfirst(windows, local_xy, valid):
    wx = _hat_weights(local_xy[..., 0], windows.shape[-1])
    wy = _hat_weights(local_xy[..., 1], windows.shape[-2])
    A = jnp.einsum("ncij,nsi->ncjs", windows, wy)
    out = jnp.einsum("ncjs,nsj->ncs", A, wx)
    return out * valid[:, None, :]


def xla_bf16(windows, local_xy, valid):
    wx = _hat_weights(local_xy[..., 0], windows.shape[-1]).astype(jnp.bfloat16)
    wy = _hat_weights(local_xy[..., 1], windows.shape[-2])
    A = jnp.einsum("ncij,nsj->ncis", windows.astype(jnp.bfloat16), wx,
                   preferred_element_type=jnp.float32)
    out = jnp.einsum("ncis,nsi->ncs", A, wy)
    return out * valid[:, None, :]


def xla_4tap(windows, local_xy, valid):
    """Exact 4-tap via one-hot-free gather: take_along_axis on columns then
    rows (tests XLA's native gather lowering at this shape)."""
    Np, Cc, wh, ww = windows.shape
    S = local_xy.shape[1]
    x = local_xy[..., 0]
    y = local_xy[..., 1]
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, ww - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, wh - 1)
    x1 = jnp.minimum(x0 + 1, ww - 1)
    y1 = jnp.minimum(y0 + 1, wh - 1)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)

    def tap(yi, xi):
        # windows [N, C, wh, ww], indices [N, S]
        flat = windows.reshape(Np, Cc, wh * ww)
        idx = (yi * ww + xi)[:, None, :]                  # [N, 1, S]
        return jnp.take_along_axis(
            flat, jnp.broadcast_to(idx, (Np, Cc, S)), axis=2)

    # mask taps that fall outside the hat support (floor clip)
    in_x = (x >= 0) & (x <= ww - 1)
    in_y = (y >= 0) & (y <= wh - 1)
    m = (in_x & in_y).astype(windows.dtype)[:, None, :]
    out = (
        tap(y0, x0) * ((1 - fy) * (1 - fx))[:, None, :]
        + tap(y0, x1) * ((1 - fy) * fx)[:, None, :]
        + tap(y1, x0) * (fy * (1 - fx))[:, None, :]
        + tap(y1, x1) * (fy * fx)[:, None, :]
    )
    return out * m * valid[:, None, :]


def run_v0_tile(windows, xy, valid, TILE):
    Np, Cc, wh, ww = windows.shape
    S = xy.shape[1]
    return pl.pallas_call(
        _kernel,
        grid=(Np // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, Cc, wh, ww), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, S, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, Cc, S), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, Cc, S), windows.dtype),
    )(windows, xy, valid)


def main():
    for S in (320, 40):
        print(f"--- S={S} ---", flush=True)
        w, xy, v = make_inputs(S)
        ref = window_bilinear_xla(w, xy, v)
        R2 = 1200 if S == 40 else 600
        bench("xla_einsum", window_bilinear_xla, (w, xy, v), R2=R2)
        for name, fn in [
            ("xla_triple", xla_triple),
            ("xla_yfirst", xla_yfirst),
            ("xla_bf16", xla_bf16),
            ("xla_4tap_gather", xla_4tap),
            ("pallas_v0_tile64",
             lambda *a: run_v0_tile(*a, TILE=64)),
            ("pallas_v0_tile128",
             lambda *a: run_v0_tile(*a, TILE=128)),
        ]:
            try:
                out = fn(w, xy, v)
                err = float(jnp.abs(out - ref).max())
                bench(name, fn, (w, xy, v), R2=R2)
                print(f"   max_abs_diff={err:.2e}", flush=True)
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {str(e)[:140]}",
                      flush=True)


if __name__ == "__main__":
    main()
