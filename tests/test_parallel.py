"""Multi-chip sharding tests on a virtual 8-device CPU mesh: the sharded LM
must produce results identical (up to reduction-order float noise) to the
single-device path, and the sharded evaluate's psum-assembled normal
equations must match (SURVEY.md §7 phase 6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from mba_vo_tpu.core import lie
from mba_vo_tpu.core.spline import SplineKnots, identity_knots, make_knots, spline_pose_at
from mba_vo_tpu.data.synthetic import synthesize_blurred_image, _box_filter_1d
from mba_vo_tpu.ops import image as im
from mba_vo_tpu.ops import residual as res
from mba_vo_tpu.parallel import mesh as pmesh
from mba_vo_tpu.parallel.sharded import optimize_level_sharded
from mba_vo_tpu.solver import lm

H, W = 64, 80
KMAT = jnp.asarray([60.0, 60.0, (W - 1) / 2, (H - 1) / 2])
DEPTH, NUM_VIR, DEGREE = 2.0, 3, 2
CAP, EXP = 0.05, 0.04
PATTERN = jnp.asarray(
    [[0, 0], [1, 0], [-1, 0], [0, 1], [0, -1], [1, 1], [-1, -1], [2, 0]],
    dtype=jnp.int32,
)


def smooth_texture(h, w, seed=0, passes=2):
    img = np.random.default_rng(seed).uniform(0, 255, (h, w))
    for _ in range(passes):
        img = _box_filter_1d(img, 2, 0)
        img = _box_filter_1d(img, 2, 1)
    return img


def true_knots():
    kt = jnp.asarray([[0.0, 0.0, 0.0], [0.015, -0.01, 0.006]], dtype=jnp.float64)
    kq = jnp.stack(
        [
            jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=jnp.float64),
            lie.quat_exp(jnp.asarray([0.003, -0.008, 0.015], dtype=jnp.float64)),
        ]
    )
    return make_knots(kt, kq, CAP - 0.5 * EXP, EXP)


def make_data(knots, n_kp=40, seed=2):
    img_ref = jnp.asarray(smooth_texture(H, W, seed=seed))
    blurred = synthesize_blurred_image(
        img_ref, knots, DEGREE, CAP, EXP, NUM_VIR, DEPTH, KMAT
    )
    rng = np.random.default_rng(seed + 10)
    kp = rng.uniform([10, 10], [W - 11, H - 11], (n_kp, 2))
    return res.TrackingLevelData(
        img_ref=img_ref,
        grad_ref=im.image_gradients(img_ref),
        cur_imgs=blurred[None],
        cap_times=jnp.asarray([CAP]),
        exp_times=jnp.asarray([EXP]),
        kp_xy=jnp.asarray(kp),
        kp_z=jnp.full((n_kp,), DEPTH),
        kp_mask=jnp.ones((n_kp,)),
        pattern=PATTERN,
        K=KMAT,
    )


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return pmesh.make_mesh(8)


class TestShardedEvaluate:
    def test_matches_single_device(self, mesh8):
        truth = true_knots()
        data = make_data(truth)
        # evaluate away from optimum for nontrivial H/g
        from mba_vo_tpu.core.spline import spline_retract

        at = spline_retract(truth, jnp.full((2, 3), 3e-3), jnp.zeros((2, 3)))
        mask = jnp.ones(data.kp_mask.shape)
        ev_ref = res.evaluate(at, data, NUM_VIR, DEGREE, 10.0, mask, True)

        sdata = pmesh.shard_level_data(data, mesh8)
        n_pad = sdata.kp_mask.shape[0]
        smask = jnp.ones((n_pad,))

        fn = shard_map(
            lambda k, d, m: res.evaluate(
                k, d, NUM_VIR, DEGREE, 10.0, m, True, axis_name=pmesh.KP_AXIS
            ),
            mesh=mesh8,
            in_specs=(
                SplineKnots(t=P(), q=P(), t0=P(), dt=P()),
                pmesh.level_data_specs(),
                P(pmesh.KP_AXIS),
            ),
            out_specs=res.Evaluation(
                cost=P(), gradient=P(), hessian=P(),
                patch_costs=P(None, pmesh.KP_AXIS),
            ),
            check_vma=False,
        )
        ev_sh = jax.jit(fn)(at, sdata, smask)

        np.testing.assert_allclose(float(ev_sh.cost), float(ev_ref.cost), rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(ev_sh.gradient), np.asarray(ev_ref.gradient), rtol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(ev_sh.hessian), np.asarray(ev_ref.hessian), rtol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(ev_sh.patch_costs)[:, : data.kp_mask.shape[0]],
            np.asarray(ev_ref.patch_costs),
            rtol=1e-9,
        )


class TestShardedWindowed:
    """The tracker's PRODUCTION sampling path (windowed, TrackerConfig
    default) under shard_map — vmapped dynamic_slice windows on replicated
    images with sharded keypoints (round-2 verdict: never executed sharded)."""

    def test_windowed_sharded_evaluate_matches(self, mesh8):
        truth = true_knots()
        data = make_data(truth)
        from mba_vo_tpu.core.spline import spline_retract

        at = spline_retract(truth, jnp.full((2, 3), 3e-3), jnp.zeros((2, 3)))
        mask = jnp.ones(data.kp_mask.shape)
        ev_ref = res.evaluate(at, data, NUM_VIR, DEGREE, 10.0, mask, True,
                              sampling="windowed", window=32)

        sdata = pmesh.shard_level_data(data, mesh8)
        smask = jnp.ones((sdata.kp_mask.shape[0],))
        fn = shard_map(
            lambda k, d, m: res.evaluate(
                k, d, NUM_VIR, DEGREE, 10.0, m, True,
                axis_name=pmesh.KP_AXIS, sampling="windowed", window=32,
            ),
            mesh=mesh8,
            in_specs=(
                SplineKnots(t=P(), q=P(), t0=P(), dt=P()),
                pmesh.level_data_specs(),
                P(pmesh.KP_AXIS),
            ),
            out_specs=res.Evaluation(
                cost=P(), gradient=P(), hessian=P(),
                patch_costs=P(None, pmesh.KP_AXIS),
            ),
            check_vma=False,
        )
        ev_sh = jax.jit(fn)(at, sdata, smask)
        np.testing.assert_allclose(float(ev_sh.cost), float(ev_ref.cost),
                                   rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(ev_sh.gradient), np.asarray(ev_ref.gradient), rtol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(ev_sh.hessian), np.asarray(ev_ref.hessian), rtol=1e-9
        )

    def test_windowed_sharded_lm_recovers(self, mesh8):
        truth = true_knots()
        data = make_data(truth)
        init = identity_knots(2, t0=float(truth.t0), dt=float(truth.dt),
                              dtype=jnp.float64)
        opts = lm.LMOptions(huber_a=100.0, max_chi_square_error=1e9,
                            min_abs_cost_decrease=1e-7,
                            sampling="windowed", window=32)
        sdata = pmesh.shard_level_data(data, mesh8)
        out_sh, sum_sh = optimize_level_sharded(
            init, sdata, NUM_VIR, DEGREE, opts, mesh8
        )
        from test_lm import pose_error

        dt_sh, dr_sh = pose_error(out_sh, truth, CAP)
        assert dt_sh < 5e-4 and dr_sh < 3e-4


class TestPodMesh:
    """2-D (host, device) pod-mesh plumbing exercised single-process:
    psum over both axes must equal the 1-D-mesh and single-device results
    (parallel.distributed — SURVEY.md §2.5 multi-host row)."""

    def test_pod_sharded_lm_matches_flat(self, mesh8):
        from mba_vo_tpu.parallel.distributed import make_pod_mesh
        from mba_vo_tpu.parallel.sharded import optimize_level_sharded_pod

        truth = true_knots()
        data = make_data(truth)
        init = identity_knots(2, t0=float(truth.t0), dt=float(truth.dt),
                              dtype=jnp.float64)
        opts = lm.LMOptions(huber_a=100.0, max_chi_square_error=1e9,
                            min_abs_cost_decrease=1e-7)

        pod = make_pod_mesh(n_hosts=2, devices_per_host=4)
        assert pod.axis_names == ("host", "kp")
        pdata = pmesh.shard_level_data(data, pod)
        out_pod, sum_pod = optimize_level_sharded_pod(
            init, pdata, NUM_VIR, DEGREE, opts, pod
        )
        from test_lm import pose_error

        dt_p, dr_p = pose_error(out_pod, truth, CAP)
        assert dt_p < 5e-4 and dr_p < 3e-4
        assert float(sum_pod.final_cost) < 1e-2

    def test_initialize_from_env_noop(self, monkeypatch):
        from mba_vo_tpu.parallel.distributed import initialize_from_env

        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        assert initialize_from_env() is False


class TestShardedLM:
    def test_sharded_recovery_matches_single(self, mesh8):
        truth = true_knots()
        data = make_data(truth)
        init = identity_knots(2, t0=float(truth.t0), dt=float(truth.dt),
                              dtype=jnp.float64)
        opts = lm.LMOptions(huber_a=100.0, max_chi_square_error=1e9,
                            min_abs_cost_decrease=1e-7)

        out_ref, sum_ref = lm.optimize_level(init, data, NUM_VIR, DEGREE, opts)

        sdata = pmesh.shard_level_data(data, mesh8)
        out_sh, sum_sh = optimize_level_sharded(
            init, sdata, NUM_VIR, DEGREE, opts, mesh8
        )

        # The iterate *path* is not bitwise-reproducible across shardings:
        # psum reduction order differs from a single flat sum at the 1e-16
        # level, and the LM loop's accept/reject branches (including the
        # reference's terminate-on-rejected-step quirk) amplify that into
        # different iteration counts. The contract is that both paths solve
        # the problem: compare each against the ground truth.
        from test_lm import pose_error

        dt_ref, dr_ref = pose_error(out_ref, truth, CAP)
        dt_sh, dr_sh = pose_error(out_sh, truth, CAP)
        assert dt_ref < 5e-4 and dr_ref < 3e-4
        assert dt_sh < 5e-4 and dr_sh < 3e-4
        assert float(sum_sh.final_cost) < 1e-2
        assert int(sum_sh.num_iterations) >= 2

    def test_sharded_outlier_masking(self, mesh8):
        """Outlier statistics are global across shards: a corrupted keypoint
        must be masked no matter which shard owns it."""
        truth = true_knots()
        data = make_data(truth, n_kp=40)
        bad_z = data.kp_z.at[33].set(0.4)  # lands in the last shard
        data = data._replace(kp_z=bad_z)
        init = identity_knots(2, t0=float(truth.t0), dt=float(truth.dt),
                              dtype=jnp.float64)
        opts = lm.LMOptions(huber_a=100.0, max_chi_square_error=3.0,
                            min_abs_cost_decrease=1e-7)
        sdata = pmesh.shard_level_data(data, mesh8)
        out_sh, sum_sh = optimize_level_sharded(
            init, sdata, NUM_VIR, DEGREE, opts, mesh8
        )
        mask = np.asarray(sum_sh.outlier_mask)
        assert mask[33] == 0.0, "corrupted keypoint not flagged across shards"
        # and the solve still recovers the trajectory
        from test_lm import pose_error  # reuse helper

        dt_mid, dr_mid = pose_error(out_sh, truth, CAP)
        assert dt_mid < 1e-3 and dr_mid < 1e-3


class TestShardedBA:
    """Landmark-sharded bundle adjustment equals the single-device solve
    (BASELINE.json config 5 on the virtual CPU mesh)."""

    def _problem(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_backend import synthetic_ba_problem

        return synthetic_ba_problem(W=4, M=60, seed=7)

    def test_sharded_matches_single_device(self, mesh8):
        from mba_vo_tpu.backend.ba import (
            BAOptions, evaluate_cost, run_bundle_adjustment,
        )
        from mba_vo_tpu.core import lie as _lie
        from mba_vo_tpu.core.transform import Pose as _Pose
        from mba_vo_tpu.parallel.sharded_ba import (
            make_ba_mesh, run_bundle_adjustment_sharded, shard_ba_problem,
        )

        problem, X_true, t_true, q_true = self._problem()
        rng = np.random.default_rng(8)
        dp = rng.normal(0, 0.02, (4, 6))
        dp[0] = 0
        noisy = problem._replace(
            poses=_Pose(
                t=problem.poses.t + jnp.asarray(dp[:, :3]),
                q=_lie.quat_multiply(
                    problem.poses.q, _lie.quat_exp(jnp.asarray(dp[:, 3:]))
                ),
            ),
            map=problem.map._replace(
                points=problem.map.points
                + jnp.asarray(rng.normal(0, 0.05, X_true.shape))
            ),
        )
        opts = BAOptions(max_iterations=30, huber_a=1e6)
        out_ref, sum_ref = run_bundle_adjustment(noisy, opts)

        mesh = make_ba_mesh(8)
        sharded = shard_ba_problem(noisy, mesh)
        out_sh, sum_sh = run_bundle_adjustment_sharded(sharded, opts, mesh)

        assert float(sum_sh.final_cost) < 1e-8
        # both converge to the same optimum (the BA landscape here is benign)
        np.testing.assert_allclose(
            np.asarray(out_sh.poses.t), np.asarray(out_ref.poses.t), atol=1e-5
        )
        # reconstructed landmarks agree on the original (non-padded) slots
        np.testing.assert_allclose(
            np.asarray(out_sh.map.points)[:60],
            np.asarray(out_ref.map.points), atol=1e-4,
        )

    def test_padded_shards_inert(self, mesh8):
        from mba_vo_tpu.backend.ba import BAOptions, evaluate_cost
        from mba_vo_tpu.parallel.sharded_ba import (
            make_ba_mesh, run_bundle_adjustment_sharded, shard_ba_problem,
        )

        problem, *_ = self._problem()
        mesh = make_ba_mesh(8)
        sharded = shard_ba_problem(problem, mesh)  # pads 60 -> 64
        opts = BAOptions(max_iterations=3, huber_a=1e6)
        out, summary = run_bundle_adjustment_sharded(sharded, opts, mesh)
        assert np.isfinite(float(summary.final_cost))
        np.testing.assert_allclose(
            np.asarray(out.map.points)[60:], np.ones((4, 3)), atol=1e-12
        )


class TestShardedTrackerProduct:
    """The r05 product surface: TrackerConfig.shard_devices routes every
    fused dispatch (per-frame, chunked scan, joint window) through the
    keypoint-sharded shard_map — multi-chip tracking as a tracker feature,
    not a library call (r04 verdict missing #1)."""

    def _cfg(self, n, **kw):
        from mba_vo_tpu.tracker.blur_tracker import TrackerConfig
        from mba_vo_tpu.tracker.detector import DetectorOptions

        return TrackerConfig(
            num_pyramid_levels=2,
            num_virtual_poses=(5, 5),
            huber_a=10.0,
            min_abs_cost_decrease=1e-6,
            keyframe_max_flow_mag0=1e9,
            keyframe_max_flow_mag1=1e9,
            detector=DetectorOptions(score_threshold=5.0, cell_h=12,
                                     cell_w=12, max_keypoints=256),
            dtype="float64",
            shard_devices=n,
            **kw,
        )

    def _sequence(self, n_frames=4):
        import sys

        sys.path.insert(0, "tests")
        from test_tracker import (DEPTH as D, EXPOSURE as E, H as Ht,
                                  KVEC, W as Wt, generate_sequence)

        img0, traj, frames = generate_sequence(n_frames)
        depth = np.full((Ht, Wt), D, np.float32)
        return img0, traj, frames, depth, KVEC, (Ht, Wt), E

    def test_fused_chunked_matches_single_device(self):
        from mba_vo_tpu.tracker.blur_tracker import BlurAwareTracker

        img0, traj, frames, depth, KVEC, hw, EXP_ = self._sequence(4)
        caps = [c for c, _ in frames]
        imgs = [np.asarray(b) for _, b in frames]
        out = {}
        for n in (0, 4):
            tr = BlurAwareTracker(self._cfg(n), KVEC, hw)
            tr.track_frame(np.asarray(img0), np.asarray(img0), 0.0, EXP_,
                           depth)
            poses = tr.track_frames(imgs, caps, [EXP_] * len(caps), chunk=2)
            out[n] = np.stack([np.asarray(p.t) for p in poses])
        np.testing.assert_allclose(out[4], out[0], atol=1e-9)

    def test_sharded_affine_brightness_matches(self):
        """affine_brightness + shard_devices: the per-frame gain/bias fit
        psums its moment sums over the keypoint axis, so every shard fits
        the SAME global (a, b) — a shard-local fit would mix inconsistent
        photometric models into the assembled normal equations (r05 review
        finding). Disturb the frames with gain/bias drift and require the
        sharded trajectory to match single-device."""
        from mba_vo_tpu.tracker.blur_tracker import BlurAwareTracker

        img0, traj, frames, depth, KVEC, hw, EXP_ = self._sequence(4)
        caps = [c for c, _ in frames]
        imgs = [np.asarray(b) * (1.0 + 0.03 * i) + 2.0 * i
                for i, (_, b) in enumerate(frames)]
        out = {}
        for n in (0, 4):
            tr = BlurAwareTracker(self._cfg(n, affine_brightness=True),
                                  KVEC, hw)
            tr.track_frame(np.asarray(img0), np.asarray(img0), 0.0, EXP_,
                           depth)
            poses = tr.track_frames(imgs, caps, [EXP_] * len(caps), chunk=2)
            out[n] = np.stack([np.asarray(p.t) for p in poses])
        np.testing.assert_allclose(out[4], out[0], atol=1e-9)

    def test_joint_window_sharded_matches(self):
        from mba_vo_tpu.tracker.blur_tracker import BlurAwareTracker

        img0, traj, frames, depth, KVEC, hw, EXP_ = self._sequence(4)
        caps = [c for c, _ in frames]
        imgs = [np.asarray(b) for _, b in frames]
        out = {}
        for n in (0, 8):
            tr = BlurAwareTracker(self._cfg(n), KVEC, hw)
            tr.track_frame(np.asarray(img0), np.asarray(img0), 0.0, EXP_,
                           depth)
            poses = tr.track_frames_joint(imgs, caps, [EXP_] * len(caps),
                                          chunk=4)
            out[n] = np.stack([np.asarray(p.t) for p in poses])
        np.testing.assert_allclose(out[8], out[0], atol=1e-9)

    def test_shard_devices_validation(self):
        from mba_vo_tpu.tracker.blur_tracker import BlurAwareTracker

        with pytest.raises(ValueError, match="multiple of shard_devices"):
            BlurAwareTracker(self._cfg(7), np.array([60.0, 60.0, 32, 24]),
                             (48, 64))

    def test_vo_backend_sharded_ba_matches(self):
        """BackendConfig.shard_devices: window BA runs landmark-sharded
        (distributed Schur, parallel.sharded_ba); refined keyframe poses
        must match the dense single-device backend up to psum
        reduction-order noise."""
        import sys

        sys.path.insert(0, "tests")
        from test_vo_backend import _run_sequence
        from mba_vo_tpu.backend.vo_backend import BackendConfig, VOBackend

        poses = {}
        KVEC_ = None
        for n in (0, 4):
            from test_tracker import KVEC as KV

            KVEC_ = KV
            be = VOBackend(
                BackendConfig(window_size=4, run_pose_graph=False,
                              shard_devices=n), KVEC_)
            _run_sequence(be)
            # the sharded case must actually BUILD a mesh (a regression that
            # leaves be.mesh None would silently fall through to the dense
            # path and make the comparison below trivially equal)
            assert (be.mesh is None) == (n == 0)
            poses[n] = np.stack(
                [np.asarray(kf.pose.t) for kf in be.keyframes])
        assert len(poses[4]) == len(poses[0])
        np.testing.assert_allclose(poses[4], poses[0], atol=1e-8)
