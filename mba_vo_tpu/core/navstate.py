"""Navigation state: pose + velocity + IMU biases, as one jittable pytree.

Parity with the reference's NavState
(/root/reference/src/core/states/NavState.h:17-60: Transformation pose,
velocity, accel/gyro biases, plus mutable optimization copies behind a
mutex). TPU re-design: the state is an immutable NamedTuple — "mutable
optimization copies" are simply functional updates under jit, and the
retraction below is the local parameterization a solver differentiates
through (same right-multiplicative convention as the spline knots).

Also provides the strapdown IMU propagation step the reference's nav layer
anticipates: given body-frame accelerometer/gyro measurements and gravity,
advance (pose, velocity) by Euler integration with bias correction — the
inverse of models.trajectory.sample_imu's synthesis, which doubles as its
test oracle (tests/test_navstate.py)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .lie import quat_exp, quat_multiply, quat_rotate
from .transform import Pose


class NavState(NamedTuple):
    """pose: body->world; velocity [3] world frame; bias_acc/bias_gyro [3]."""

    pose: Pose
    velocity: jnp.ndarray
    bias_acc: jnp.ndarray
    bias_gyro: jnp.ndarray


def identity_navstate(dtype=jnp.float32) -> NavState:
    return NavState(
        pose=Pose(
            t=jnp.zeros(3, dtype),
            q=jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype),
        ),
        velocity=jnp.zeros(3, dtype),
        bias_acc=jnp.zeros(3, dtype),
        bias_gyro=jnp.zeros(3, dtype),
    )


def navstate_retract(state: NavState, delta: jnp.ndarray) -> NavState:
    """Manifold update with a [15] tangent [dt, dw, dv, dba, dbg] —
    the boxplus a nav-state solver steps through."""
    return NavState(
        pose=Pose(
            t=state.pose.t + delta[0:3],
            q=quat_multiply(state.pose.q, quat_exp(delta[3:6])),
        ),
        velocity=state.velocity + delta[6:9],
        bias_acc=state.bias_acc + delta[9:12],
        bias_gyro=state.bias_gyro + delta[12:15],
    )


def propagate_imu(
    state: NavState,
    acc: jnp.ndarray,      # [3] body-frame specific force (accelerometer)
    gyro: jnp.ndarray,     # [3] body-frame angular rate
    dt,
    gravity_w: jnp.ndarray,  # [3] gravity in world frame (e.g. [0,0,-9.81])
) -> NavState:
    """One strapdown Euler step: bias-correct, rotate to world, integrate.

        w   = gyro - b_g
        a_w = R (acc - b_a) + g_w
        q  <- q * exp(w dt);  v <- v + a_w dt;  t <- t + v dt + a_w dt^2/2
    """
    dt = jnp.asarray(dt, state.velocity.dtype)
    w = gyro - state.bias_gyro
    a_w = quat_rotate(state.pose.q, acc - state.bias_acc) + gravity_w
    new_q = quat_multiply(state.pose.q, quat_exp(w * dt))
    new_t = state.pose.t + state.velocity * dt + 0.5 * a_w * dt * dt
    new_v = state.velocity + a_w * dt
    return NavState(
        pose=Pose(t=new_t, q=new_q),
        velocity=new_v,
        bias_acc=state.bias_acc,
        bias_gyro=state.bias_gyro,
    )
