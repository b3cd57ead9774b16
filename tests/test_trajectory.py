"""Tests for the IMU-derivative spline trajectory (reference
SplineTrajectory.cpp:75-146): autodiff derivatives vs finite differences and
physical sanity (stationary trajectory measures gravity)."""

import jax.numpy as jnp
import numpy as np
import pytest

import np_ref as ref
from mba_vo_tpu.core.spline import identity_knots, make_knots
from mba_vo_tpu.models.trajectory import (
    ImuParams, default_imu_params, sample_imu, sample_pose_velocity,
)


def fixture_knots(degree=4):
    kt, kq, t0, dt = ref.make_test_spline(num_knots=8, dt=0.1, seed=12,
                                          scale_t=0.3, scale_w=0.25)
    return make_knots(jnp.asarray(kt), jnp.asarray(kq), t0, dt)


class TestVelocity:
    @pytest.mark.parametrize("degree", [2, 4])
    def test_velocity_matches_fd(self, degree):
        knots = fixture_knots()
        t, eps = 0.23, 1e-6
        from mba_vo_tpu.core.spline import spline_pose_at

        pose, vel, dq = sample_pose_velocity(knots, t, degree)
        pa = spline_pose_at(knots, t - eps, degree)
        pb = spline_pose_at(knots, t + eps, degree)
        fd_v = (np.asarray(pb.t) - np.asarray(pa.t)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(vel), fd_v, rtol=1e-5, atol=1e-7)
        fd_q = (np.asarray(pb.q) - np.asarray(pa.q)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(dq), fd_q, rtol=1e-5, atol=1e-7)


class TestImu:
    def test_stationary_measures_gravity(self):
        knots = identity_knots(4, t0=0.0, dt=0.1, dtype=jnp.float64)
        params = default_imu_params(jnp.float64)
        pose, vel, gyro, acc = sample_imu(knots, 0.15, 4, params)
        np.testing.assert_allclose(np.asarray(vel), 0.0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(gyro), 0.0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(acc), [0, 0, 9.81], atol=1e-10)

    def test_biases_added(self):
        knots = identity_knots(4, t0=0.0, dt=0.1, dtype=jnp.float64)
        params = ImuParams(
            gravity=jnp.asarray(9.81),
            bias_gyro=jnp.asarray([0.01, -0.02, 0.03]),
            bias_acc=jnp.asarray([0.1, 0.2, -0.3]),
        )
        _, _, gyro, acc = sample_imu(knots, 0.15, 4, params)
        np.testing.assert_allclose(np.asarray(gyro), [0.01, -0.02, 0.03], atol=1e-12)
        np.testing.assert_allclose(np.asarray(acc), [0.1, 0.2, 9.51], atol=1e-10)

    @pytest.mark.parametrize("degree", [2, 4])
    def test_gyro_matches_fd_rotation_rate(self, degree):
        """gyro = vee(R^T dR/dt) via finite differences of the rotation."""
        knots = fixture_knots()
        t, eps = 0.31, 1e-6
        params = default_imu_params(jnp.float64)
        pose, _, gyro, _ = sample_imu(knots, t, degree, params)
        Ra = ref.qmat(np.asarray(
            __import__("mba_vo_tpu.core.spline", fromlist=["spline_pose_at"])
            .spline_pose_at(knots, t - eps, degree).q))
        Rb = ref.qmat(np.asarray(
            __import__("mba_vo_tpu.core.spline", fromlist=["spline_pose_at"])
            .spline_pose_at(knots, t + eps, degree).q))
        R = ref.qmat(np.asarray(pose.q))
        dR = (Rb - Ra) / (2 * eps)
        Om = R.T @ dR
        fd_gyro = np.array([Om[2, 1], Om[0, 2], Om[1, 0]])
        np.testing.assert_allclose(np.asarray(gyro), fd_gyro, rtol=1e-4, atol=1e-6)

    def test_constant_velocity_zero_acc(self):
        """A linear (degree-2) constant-velocity trajectory has zero world
        acceleration: accel = R^T g only."""
        kt = jnp.asarray([[0.0, 0.0, 0.0], [0.1, 0.2, -0.1], [0.2, 0.4, -0.2],
                          [0.3, 0.6, -0.3]], dtype=jnp.float64)
        kq = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float64), (4, 1))
        knots = make_knots(kt, kq, 0.0, 0.1)
        params = default_imu_params(jnp.float64)
        _, vel, _, acc = sample_imu(knots, 0.15, 2, params)
        np.testing.assert_allclose(np.asarray(vel), [1.0, 2.0, -1.0], atol=1e-9)
        np.testing.assert_allclose(np.asarray(acc), [0, 0, 9.81], atol=1e-8)
