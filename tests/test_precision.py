"""Precision story tests: compensated H/g accumulation vs an f64 oracle,
and a long-sequence f32 drift bound against the f64 tracker — the TPU
replacement for the reference's f64 accumulators (CustomType.h:6 FLOAT=
double; SURVEY.md §2.5 precision row)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mba_vo_tpu.core.spline import make_knots, spline_pose_at
from mba_vo_tpu.ops.residual import _kahan_chunked_normal_eq
from mba_vo_tpu.tracker.blur_tracker import BlurAwareTracker, TrackerConfig
from mba_vo_tpu.tracker.detector import DetectorOptions

from test_tracker import smooth_texture, world_spline


class TestKahanAccumulation:
    def test_recovers_catastrophic_cross_chunk_cancellation(self):
        """One row per chunk with partials [1e8, 1, 1, ..., 1, -1e8]: the
        exact gradient is 14. A plain f32 running sum absorbs every +1 into
        1e8's rounding (1e8 + 1 == 1e8 in f32) and returns 0; the Kahan
        carry keeps the lost low-order bits and returns 14 exactly."""
        M = 16  # == the kernel's chunk count -> one row per chunk
        J = jnp.ones((M, 1), jnp.float32)
        r = np.ones((M,), np.float32)
        r[0] = 1e8
        r[-1] = -1e8
        rw = jnp.asarray(r)

        # demonstrate the failure mode of the uncompensated reduction
        plain = np.float32(0.0)
        for v in r:
            plain = np.float32(plain + v)
        assert plain == 0.0, "construction no longer adversarial"

        g_k, H_k = _kahan_chunked_normal_eq(J, rw, None)
        err_plain = abs(float(plain) - 14.0)            # = 14
        err_kahan = abs(float(g_k[0]) - 14.0)
        # Kahan bounds the error to O(1 ulp of the largest partial) —
        # spacing(f32 @ 1e8) = 8 — instead of losing the tail entirely
        assert err_kahan <= 8.0, float(g_k[0])
        assert err_kahan < 0.25 * err_plain
        assert float(H_k[0, 0]) == float(M)

    def test_exact_on_benign_data(self):
        rng = np.random.default_rng(1)
        J = jnp.asarray(rng.normal(0, 1, (1000, 6)), jnp.float32)
        r = jnp.asarray(rng.normal(0, 1, (1000,)), jnp.float32)
        g_k, H_k = _kahan_chunked_normal_eq(J, r, None)
        np.testing.assert_allclose(np.asarray(g_k), np.asarray(J.T @ r),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(H_k), np.asarray(J.T @ J),
                                   rtol=1e-5, atol=1e-4)


class TestLongSequenceDrift:
    @pytest.mark.slow
    def test_f32_tracks_f64_over_100_frames(self):
        """100-frame chunked tracking, f32 (with the production precision
        options) vs the f64 oracle configuration on the identical sequence:
        the f32 trajectory must stay within 10% relative ATE of f64, and
        both under an absolute bound. This is the drift test the reference's
        f64-everything design never needed (CustomType.h:6)."""
        from mba_vo_tpu.data.synthetic import synthesize_blurred_image

        H, W, FX = 64, 80, 60.0
        KVEC = np.array([FX, FX, (W - 1) / 2, (H - 1) / 2])
        DEPTH, EXPOSURE, FRAME_DT = 2.0, 0.03, 0.1
        N_FRAMES = 100

        img0 = jnp.asarray(smooth_texture(H, W, seed=3))
        traj = world_spline(num_knots=N_FRAMES + 4, dt=FRAME_DT)
        K = jnp.asarray(KVEC)
        synth = jax.jit(
            lambda cap: synthesize_blurred_image(
                img0, traj, 2, cap, EXPOSURE, 3, DEPTH, K
            )
        )
        caps = [i * FRAME_DT for i in range(1, N_FRAMES + 1)]
        frames = [np.asarray(synth(jnp.float64(c))) for c in caps]
        depth = np.full((H, W), DEPTH, dtype=np.float32)

        def run(dtype, precision, compensated):
            cfg = TrackerConfig(
                num_pyramid_levels=2,
                num_virtual_poses=(3, 3),
                huber_a=10.0,
                min_abs_cost_decrease=1e-6,
                keyframe_max_flow_mag0=1e9,
                keyframe_max_flow_mag1=1e9,
                detector=DetectorOptions(score_threshold=5.0, cell_h=10,
                                         cell_w=10, max_keypoints=128),
                dtype=dtype,
                precision=precision,
                compensated_sum=compensated,
            )
            tracker = BlurAwareTracker(cfg, KVEC, (H, W))
            tracker.track_frame(np.asarray(img0), np.asarray(img0), 0.0,
                                EXPOSURE, depth)
            est = tracker.track_frames(
                frames, caps, [EXPOSURE] * N_FRAMES, chunk=10
            )
            errs = []
            for cap, p in zip(caps, est):
                tp = spline_pose_at(traj, cap, 2)
                errs.append(float(jnp.linalg.norm(
                    jnp.asarray(p.t, jnp.float64) - tp.t)))
            return float(np.sqrt(np.mean(np.square(errs))))

        ate64 = run("float64", "default", False)
        ate32 = run("float32", "highest", True)
        # absolute sanity on the oracle configuration
        assert ate64 < 2e-3, ate64
        # f32 with the precision options holds the f64 trajectory
        assert ate32 < max(1.1 * ate64, ate64 + 2e-4), (ate32, ate64)
