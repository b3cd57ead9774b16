"""Kernel-level benchmark: on-chip time of the blur-residual evaluation core
at production scales, with roofline context.

Times K chained evaluations inside one jit (a lax.scan over knot
perturbations), so per-call host/dispatch latency is amortized away and the
number reflects on-chip execution — meaningful even over a remote-attached
device link.

Prints one JSON line per scale:
  samples = F * N * P * V  (pixel x virtual-pose samples per evaluation)
  bytes_touched ~ samples * (12 gather taps * 4B) + images  (rough)
"""

import json
import sys
import time

import numpy as np


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

        def chained(knots, data, with_jacobian, sampling):
            def body(carry, eps):
                k = spline_retract(
                    knots,
                    jnp.zeros((2, 3), jnp.float32) + eps * 1e-9,
                    jnp.zeros((2, 3), jnp.float32),
                )
                ev = res.evaluate(k, data, num_vir, DEG, 20.0, mask,
                                  with_jacobian, sampling=sampling, window=32)
                out = ev.cost if not with_jacobian else ev.cost + ev.hessian[0, 0]
                return carry + out, None

            total, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(REPS, dtype=jnp.float32))
            return total

        for sampling in ("direct", "windowed"):
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
                print(json.dumps({
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
                }), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
