"""Continuous-time trajectory with analytic IMU derivatives.

Re-design of the reference's rrd-slam-derived cubic SE(3) spline
(SplineTrajectory.{h,cpp}): pose + body-frame velocity / gyro / accelerometer
sampling with gravity and biases. The reference hand-derives dA/du and
d^2A/du^2 matrix products (SplineTrajectory.cpp:75-146); here the first and
second time derivatives come from nested ``jax.jvp`` through the spline
sampler — identical math, no hand chain rule, works for both spline degrees.

Definitions (matching SplineTrajectory.cpp:120-140):
    velocity = d/dt translation             (world frame)
    gyro     = vee(R^T dR/dt) + bias_g      (body frame)
    accel    = R^T (d^2/dt^2 t + [0,0,g]) + bias_a   (body frame)
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.lie import quat_to_matrix
from ..core.spline import SplineKnots, spline_pose_at
from ..core.transform import Pose


class ImuParams(NamedTuple):
    """Gravity magnitude and IMU biases (reference ImuParams.h:26,
    SplineTrajectory.h gravity/bias members)."""

    gravity: jnp.ndarray        # scalar, world +z (reference adds (0,0,g))
    bias_gyro: jnp.ndarray      # [3]
    bias_acc: jnp.ndarray       # [3]


def default_imu_params(dtype=jnp.float32) -> ImuParams:
    return ImuParams(
        gravity=jnp.asarray(9.81, dtype),
        bias_gyro=jnp.zeros(3, dtype),
        bias_acc=jnp.zeros(3, dtype),
    )


def _pose_tq(knots: SplineKnots, t, degree: int) -> jnp.ndarray:
    p = spline_pose_at(knots, t, degree)
    return jnp.concatenate([p.t, p.q])


def sample_pose_velocity(
    knots: SplineKnots, time, degree: int
) -> Tuple[Pose, jnp.ndarray, jnp.ndarray]:
    """Pose + world-frame translational velocity + quaternion rate."""
    time = jnp.asarray(time, knots.t.dtype)
    tq, dtq = jax.jvp(
        lambda s: _pose_tq(knots, s, degree), (time,), (jnp.ones_like(time),)
    )
    pose = Pose(t=tq[:3], q=tq[3:])
    return pose, dtq[:3], dtq[3:]


def sample_imu(
    knots: SplineKnots, time, degree: int, params: ImuParams
) -> Tuple[Pose, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(pose, velocity_world, gyro_body, accel_body) at ``time``.

    Matches the reference's matrix formulation: with R(t) the body-to-world
    rotation, gyro = vee(R^T R') and accel = R^T (t'' + g e_z)
    (SplineTrajectory.cpp:120-140).
    """
    time = jnp.asarray(time, knots.t.dtype)

    def pose_fn(s):
        return _pose_tq(knots, s, degree)

    def pose_and_d(s):
        return jax.jvp(pose_fn, (s,), (jnp.ones_like(s),))

    (tq, dtq), (_, ddtq) = jax.jvp(
        pose_and_d, (time,), (jnp.ones_like(time),)
    )

    pose = Pose(t=tq[:3], q=tq[3:])
    velocity = dtq[:3]

    R = quat_to_matrix(pose.q)
    # dR/dt from quaternion rate: R' = d(R(q))/dq . q'
    dR = jax.jvp(quat_to_matrix, (pose.q,), (dtq[3:],))[1]
    omega_mat = R.T @ dR
    gyro = jnp.stack(
        [omega_mat[2, 1], omega_mat[0, 2], omega_mat[1, 0]]
    ) + params.bias_gyro

    acc_world = ddtq[:3] + jnp.array([0.0, 0.0, 1.0], tq.dtype) * params.gravity
    accel = R.T @ acc_world + params.bias_acc
    return pose, velocity, gyro, accel


def sample_imu_sequence(
    knots: SplineKnots, times: jnp.ndarray, degree: int, params: ImuParams
):
    """Vectorized IMU sampling over a [N] time array — an IMU simulator for
    spline trajectories (what the reference uses SplineTrajectory for)."""
    return jax.vmap(lambda s: sample_imu(knots, s, degree, params))(times)
