"""Kernel-level benchmark: on-chip time of the blur-residual evaluation core
at production scales, with roofline context.

Times K chained evaluations inside one jit (a lax.scan over knot
perturbations with a carry dependence, so iterations can neither overlap
nor be hoisted), so per-call host/dispatch latency is amortized away and
the number reflects on-chip execution — meaningful even over a
remote-attached device link.

Sections:
  1. full evaluate() at three scales (direct vs windowed, +/- Jacobian);
  2. the window-sampling CORE op: XLA einsum lowering vs the fused Pallas
     kernel (ops.pallas_sampling), with min-HBM-traffic GB/s and
     dense-equivalent TFLOP/s against the chip's peaks — the roofline
     evidence for the sampling hot path.

--out FILE writes everything as one JSON artifact (BENCH_KERNELS_r{N}.json).
"""

import argparse
import json
import sys
import time

import numpy as np

# v5e (TPU v5 lite) peaks for roofline context
HBM_PEAK_GBPS = 819.0
BF16_PEAK_TFLOPS = 197.0


def bench_sampling_core(records):
    """Section 2: XLA vs Pallas window-sampling core with roofline context."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from mba_vo_tpu.ops.pallas_sampling import (
        pallas_available,
        pallas_window_bilinear,
    )
    from mba_vo_tpu.ops.window_sampling import window_bilinear_xla

    rng = np.random.default_rng(0)
    N, C, win = 512, 3, 32
    # S=320 = the historical bench shape (8-frame joint window);
    # S=40 = the PRODUCTION single-frame tracking shape (8 px x 5 poses)
    for S in (320, 40):
        windows = jnp.asarray(rng.normal(0, 1, (N, C, win, win)), jnp.float32)
        xy = jnp.asarray(rng.uniform(-2, win + 1, (N, S, 2)), jnp.float32)
        valid = jnp.asarray(rng.integers(0, 2, (N, S)), jnp.float32)

        # correctness gate first: the Pallas kernel must match XLA on-chip
        if pallas_available():
            ref = window_bilinear_xla(windows, xy, valid)
            out = pallas_window_bilinear(windows, xy, valid)
            maxdiff = float(jnp.abs(ref - out).max())
        else:
            maxdiff = None

        def make(f, R):
            @jax.jit
            def run(w, x, v):
                def body(c, _):
                    out = f(w, x + c, v)     # carry dependence: serialized
                    return out.sum() * 1e-30, None
                total, _ = lax.scan(body, jnp.float32(0.0), None, length=R)
                return total
            return run

        impls = [("xla_einsum", window_bilinear_xla)]
        if pallas_available():
            impls.append(
                ("pallas_fused",
                 lambda w, x, v: pallas_window_bilinear(w, x, v))
            )
        for name, f in impls:
            g1, g2 = make(f, 200), make(f, 5200)
            float(g1(windows, xy, valid))
            float(g2(windows, xy, valid))
            t0 = time.time(); float(g1(windows, xy, valid)); t1 = time.time()
            float(g2(windows, xy, valid)); t2 = time.time()
            per = ((t2 - t1) - (t1 - t0)) / 5000
            io_gb = (N * C * win * win + N * S * 3 + N * C * S) * 4 / 1e9
            flops = 2 * N * C * win * win * S + 2 * N * C * win * S
            rec = {
                "section": "sampling_core",
                "impl": name,
                "keypoints": N, "channels": C, "window": win, "samples": S,
                "iter_us": round(per * 1e6, 2),
                "min_traffic_GBps": round(io_gb / per, 1),
                "hbm_roofline_frac": round(io_gb / per / HBM_PEAK_GBPS, 3),
                "dense_equiv_TFLOPs": round(flops / per / 1e12, 2),
                "mxu_bf16_frac": round(
                    flops / per / 1e12 / BF16_PEAK_TFLOPS, 3),
                "pallas_vs_xla_max_abs_diff": maxdiff,
            }
            print(json.dumps(rec), flush=True)
            records.append(rec)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from mba_vo_tpu.core import lie
    from mba_vo_tpu.core.spline import make_knots, spline_retract
    from mba_vo_tpu.data.synthetic import synthesize_blurred_image, _box_filter_1d
    from mba_vo_tpu.ops import image as im
    from mba_vo_tpu.ops import residual as res
    from mba_vo_tpu.tracker.patterns import pattern_square, pattern_dso8

    H, W = 480, 640
    K = jnp.asarray([480.0, 480.0, (W - 1) / 2, (H - 1) / 2], jnp.float32)
    DEPTH, CAP, EXP, DEG = 2.0, 0.05, 0.03, 2

    img = np.random.default_rng(0).uniform(0, 255, (H, W))
    for _ in range(2):
        img = _box_filter_1d(img, 2, 0)
        img = _box_filter_1d(img, 2, 1)
    img0 = jnp.asarray(img, jnp.float32)

    kt = jnp.asarray([[0, 0, 0], [0.02, -0.013, 0.008]], jnp.float32)
    kq = jnp.stack([
        jnp.asarray([0, 0, 0, 1.0], jnp.float32),
        lie.quat_exp(jnp.asarray([0.004, -0.01, 0.02], jnp.float32)),
    ])
    knots = make_knots(kt, kq, CAP - 0.5 * EXP, EXP)
    blurred = synthesize_blurred_image(img0, knots, DEG, CAP, EXP, 5, DEPTH, K)

    # scales: (num_keypoints, patch, num_vir) up to the reference ceilings
    # (blur_aware_direct_tracker.h:42-47: <=500 kp, <=128 px, <=64 poses)
    scales = [
        ("tracking_default", 512, pattern_dso8(), 5),
        ("dense_patch", 512, pattern_square(5), 8),      # 121-px patches
        ("reference_ceiling", 512, pattern_square(5), 64),
    ]

    records = []
    REPS = 10
    rng = np.random.default_rng(1)

    for name, n_kp, pattern, num_vir in scales:
        kp = rng.uniform([12, 12], [W - 13, H - 13], (n_kp, 2)).astype(np.float32)
        data = res.TrackingLevelData(
            img_ref=img0,
            grad_ref=im.image_gradients(img0),
            cur_imgs=blurred[None],
            cap_times=jnp.asarray([CAP], jnp.float32),
            exp_times=jnp.asarray([EXP], jnp.float32),
            kp_xy=jnp.asarray(kp),
            kp_z=jnp.full((n_kp,), DEPTH, jnp.float32),
            kp_mask=jnp.ones((n_kp,), jnp.float32),
            pattern=jnp.asarray(pattern),
            K=K,
        )
        mask = jnp.ones((n_kp,), jnp.float32)

        cache = res.prepare_window_cache(data, 32)

        def chained(knots, data, with_jacobian, sampling):
            use_cache = sampling == "windowed_cached"

            def body(carry, eps):
                k = spline_retract(
                    knots,
                    jnp.zeros((2, 3), jnp.float32) + eps * 1e-9,
                    jnp.zeros((2, 3), jnp.float32),
                )
                ev = res.evaluate(
                    k, data, num_vir, DEG, 20.0, mask, with_jacobian,
                    sampling="windowed" if use_cache else sampling,
                    window=32, cache=cache if use_cache else None,
                )
                out = ev.cost if not with_jacobian else ev.cost + ev.hessian[0, 0]
                return carry + out, None

            total, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(REPS, dtype=jnp.float32))
            return total

        # windowed_cached = the production LM-loop configuration (window
        # extraction hoisted out of the iteration, ops.residual cache)
        for sampling in ("direct", "windowed", "windowed_cached"):
            for wj in (False, True):
                f = jax.jit(chained, static_argnums=(2, 3))
                out = f(knots, data, wj, sampling)
                jax.block_until_ready(out)  # compile + warm
                t0 = time.time()
                out = f(knots, data, wj, sampling)
                jax.block_until_ready(out)
                wall = (time.time() - t0) / REPS
                P = pattern.shape[0]
                samples = n_kp * P * num_vir
                taps = 12 if wj else 4
                gbytes = samples * taps * 4 / 1e9
                rec = {
                    "section": "evaluate",
                    "scale": name,
                    "sampling": sampling,
                    "with_jacobian": wj,
                    "num_keypoints": n_kp,
                    "patch": int(P),
                    "num_vir": num_vir,
                    "samples": samples,
                    "eval_ms": round(wall * 1e3, 3),
                    "msamples_per_s": round(samples / wall / 1e6, 1),
                    "approx_gather_GBps": round(gbytes / wall, 2),
                }
                print(json.dumps(rec), flush=True)
                records.append(rec)

    bench_sampling_core(records)

    if ARGS.out:
        artifact = {
            "platform": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "peaks": {"hbm_GBps": HBM_PEAK_GBPS,
                      "mxu_bf16_TFLOPs": BF16_PEAK_TFLOPS},
            "notes": [
                "evaluate-section numbers amortize dispatch over a 10-rep "
                "lax.scan; sampling_core numbers difference two scan lengths "
                "(200 vs 5200) so compile+link setup cancels.",
                "the sampling core is memory-bound: min_traffic counts only "
                "windows+coords+output (intermediates fused); "
                "dense_equiv_TFLOPs counts the dense hat-matmul formulation "
                "whose useful work is only ~4 taps/sample, so MXU fractions "
                "are a utilization ceiling, not a target.",
                "r04: sampling core reordered y-first (sublane axis "
                "contracts first; lane-first forced an internal window "
                "transpose) — 3.6x at the production S=40 shape. Variant "
                "sweep (per-sample gathers ~550x slower; Mosaic "
                "restructurings VMEM-bound or compiler-crashing) recorded "
                "in ops/window_sampling._use_pallas.",
                "r01->r02 tracked-fps regression (99.9 -> 89.9): bench.py "
                "wall time over the remote-attached chip includes tunnel "
                "dispatch latency (~5-7 ms per individual op dispatch, "
                "measured). r03 removed it structurally: the chunk program "
                "returns its final scan carry so no per-chunk slice ops "
                "remain, and track_frames keeps multiple chunk dispatches "
                "speculatively in flight (199.3 fps steady-state, 94% of "
                "the pure device-compute rate).",
            ],
            "records": records,
        }
        with open(ARGS.out, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {ARGS.out}")


ARGS = None

if __name__ == "__main__":
    sys.path.insert(0, ".")
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    ARGS = p.parse_args()
    main()
