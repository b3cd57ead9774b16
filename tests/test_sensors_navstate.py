"""Tests: multi-sensor registry + multi-camera frame (NSensorSystem.h /
Frame.h parity) and NavState + strapdown IMU propagation (NavState.h),
using the spline trajectory's analytic IMU synthesis as the oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mba_vo_tpu.core import lie
from mba_vo_tpu.core.navstate import (
    NavState,
    identity_navstate,
    navstate_retract,
    propagate_imu,
)
from mba_vo_tpu.core.transform import Pose
from mba_vo_tpu.models.sensors import MultiCameraFrame, SensorSystem
from mba_vo_tpu.models.trajectory import ImuParams, default_imu_params
from mba_vo_tpu.tracker.detector import DetectorOptions


class TestSensorSystem:
    def _pose(self, t, w):
        return Pose(t=jnp.asarray(t, jnp.float64),
                    q=lie.quat_exp(jnp.asarray(w, jnp.float64)))

    def test_registry_and_lookup(self):
        sys_ = SensorSystem()
        K0 = jnp.asarray([400.0, 400.0, 320.0, 240.0])
        K1 = jnp.asarray([410.0, 410.0, 321.0, 239.0])
        sys_.add_camera(0, K0, self._pose([0, 0, 0], [0, 0, 0]), name="cam0")
        sys_.add_camera(1, K1, self._pose([0.1, 0, 0], [0, 0.02, 0]),
                        name="cam1")
        sys_.add_paired_camera(0, 1)
        sys_.add_imu(0, default_imu_params(), name="imu0")

        assert sys_.get_dev_id("cam1") == 1
        assert sys_.get_paired_cameras() == {0: 1}
        assert len(sys_.get_cameras()) == 2
        np.testing.assert_allclose(np.asarray(sys_.get_camera(1).camera),
                                   np.asarray(K1))
        assert float(sys_.get_imu(0).params.gravity) == pytest.approx(9.81)

    def test_duplicate_id_rejected(self):
        sys_ = SensorSystem()
        sys_.add_camera(0, jnp.zeros(4))
        with pytest.raises(ValueError):
            sys_.add_camera(0, jnp.zeros(4))
        with pytest.raises(ValueError):
            sys_.add_paired_camera(0, 7)   # unregistered

    def test_relative_extrinsics_roundtrip(self):
        """A body point expressed through T_a2b must equal transforming via
        body: x_b = T_b2s(b) x_body with x_body = T_b2s(a)^-1 x_a."""
        sys_ = SensorSystem()
        Ta = self._pose([0.1, -0.05, 0.02], [0.03, -0.01, 0.2])
        Tb = self._pose([-0.2, 0.06, 0.01], [-0.1, 0.04, -0.05])
        sys_.add_camera(0, jnp.zeros(4), Ta)
        sys_.add_camera(1, jnp.zeros(4), Tb)
        T_a2b = sys_.relative_extrinsics(0, 1)

        x_a = jnp.asarray([0.3, -0.7, 2.0], jnp.float64)
        # via body frame
        x_body = lie.quat_rotate(lie.quat_conjugate(Ta.q), x_a - Ta.t)
        x_b_ref = lie.quat_rotate(Tb.q, x_body) + Tb.t
        x_b = lie.quat_rotate(T_a2b.q, x_a) + T_a2b.t
        np.testing.assert_allclose(np.asarray(x_b), np.asarray(x_b_ref),
                                   atol=1e-12)


class TestMultiCameraFrame:
    def test_per_camera_pyramids_and_detection(self):
        rng = np.random.default_rng(0)
        frame = MultiCameraFrame(cap_time=1.5, exp_time=0.02)
        imgs = {}
        for cid in (0, 1):
            img = rng.uniform(0, 255, (64, 80)).astype(np.float32)
            imgs[cid] = img
            frame.add_image(cid, img)
        assert frame.camera_ids() == [0, 1]

        for cid in (0, 1):
            pyr = frame.compute_pyramid(cid, 3)
            assert len(pyr) == 3
            assert pyr[1].shape == (32, 40)
            grads = frame.compute_grad_pyramid(cid)
            assert grads[0].shape == (64, 80, 2)
            kp, resp, mask = frame.detect_features(
                cid, 0, DetectorOptions(score_threshold=1.0, cell_h=16,
                                        cell_w=16, max_keypoints=32)
            )
            assert int(mask.sum()) > 0

        # per-camera storage is independent
        assert not np.allclose(np.asarray(frame.image(0)),
                               np.asarray(frame.image(1)))


class TestNavState:
    def test_retract_layout(self):
        s = identity_navstate(jnp.float64)
        d = jnp.arange(15, dtype=jnp.float64) * 0.01
        out = navstate_retract(s, d)
        np.testing.assert_allclose(np.asarray(out.pose.t), [0.0, 0.01, 0.02])
        np.testing.assert_allclose(np.asarray(out.velocity),
                                   [0.06, 0.07, 0.08])
        np.testing.assert_allclose(np.asarray(out.bias_acc),
                                   [0.09, 0.10, 0.11])
        np.testing.assert_allclose(np.asarray(out.bias_gyro),
                                   [0.12, 0.13, 0.14])
        # rotation is the right-multiplicative exp of [0.03, 0.04, 0.05]
        q_ref = lie.quat_exp(jnp.asarray([0.03, 0.04, 0.05], jnp.float64))
        np.testing.assert_allclose(np.asarray(out.pose.q), np.asarray(q_ref),
                                   atol=1e-15)

    def test_propagation_inverts_spline_imu_synthesis(self):
        """Integrate the analytic IMU measurements of a known spline
        trajectory (models.trajectory.sample_imu) and recover the
        trajectory's own pose/velocity — drift bounded by the Euler step."""
        from mba_vo_tpu.core.spline import make_knots
        from mba_vo_tpu.models.trajectory import (
            sample_imu, sample_pose_velocity,
        )
        import np_ref as ref

        rng = np.random.default_rng(4)
        n_knots, dt = 8, 0.25
        kt = [np.zeros(3)]
        kq = [np.array([0.0, 0.0, 0.0, 1.0])]
        for _ in range(1, n_knots):
            kt.append(kt[-1] + np.array([0.05, -0.03, 0.02]) * dt
                      + rng.normal(0, 1e-3, 3))
            kq.append(ref.qnorm(ref.qmul(
                kq[-1], ref.qexp(np.array([0.04, 0.06, -0.05]) * dt)
            )))
        knots = make_knots(jnp.asarray(np.array(kt), jnp.float64),
                           jnp.asarray(np.array(kq), jnp.float64), 0.0, dt)
        params = ImuParams(
            gravity=jnp.asarray(9.81, jnp.float64),
            bias_gyro=jnp.asarray([-0.003, 0.004, 0.002], jnp.float64),
            bias_acc=jnp.asarray([0.02, -0.01, 0.005], jnp.float64),
        )
        # sample_imu measures accel = R^T (t'' + g e_z) + b_a, i.e. specific
        # force with world gravity g_w = (0, 0, -g)
        g_w = jnp.asarray([0.0, 0.0, -9.81], jnp.float64)

        t_start, t_end, h = 0.3, 1.1, 1e-3
        p0, v0, _ = sample_pose_velocity(knots, t_start, 4)
        state = NavState(pose=p0, velocity=v0,
                         bias_acc=params.bias_acc,
                         bias_gyro=params.bias_gyro)
        times = np.arange(t_start, t_end, h)
        # midpoint measurements reduce the Euler step bias
        imu_fn = jax.jit(lambda s: sample_imu(knots, s, 4, params))
        for tm in times:
            _, _, gyro, acc = imu_fn(jnp.float64(tm + 0.5 * h))
            state = propagate_imu(state, acc, gyro, h, g_w)

        p_end, v_end, _ = sample_pose_velocity(knots, float(times[-1]) + h, 4)
        assert float(jnp.linalg.norm(state.pose.t - p_end.t)) < 2e-3
        assert float(jnp.linalg.norm(state.velocity - v_end)) < 5e-3
        dq = lie.quat_multiply(lie.quat_conjugate(state.pose.q), p_end.q)
        assert float(jnp.linalg.norm(lie.quat_log(dq))) < 1e-3
