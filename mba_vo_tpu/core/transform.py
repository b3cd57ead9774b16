"""SE(3) rigid transforms as a (t, q) pytree.

TPU-native equivalent of the reference's 7-double ``Transformation``
(src/core/states/Transformation.{h,cpp}): translation + xyzw unit quaternion,
with compose/inverse/apply/exp/log as pure batched functions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .lie import (
    quat_conjugate,
    quat_identity,
    quat_multiply,
    quat_normalize,
    quat_rotate,
    se3_exp,
    se3_log,
)


class Pose(NamedTuple):
    """Batched SE(3) pose: t[..., 3] translation, q[..., 4] xyzw quaternion."""

    t: jnp.ndarray
    q: jnp.ndarray


def pose_identity(dtype=jnp.float32, batch_shape=()) -> Pose:
    t = jnp.zeros(batch_shape + (3,), dtype=dtype)
    q = jnp.broadcast_to(quat_identity(dtype), batch_shape + (4,))
    return Pose(t, q)


def pose_compose(a: Pose, b: Pose) -> Pose:
    """a * b (first apply b, then a). Reference Transformation.cpp:111-123."""
    return Pose(
        t=quat_rotate(a.q, b.t) + a.t,
        q=quat_multiply(a.q, b.q),
    )


def pose_inverse(p: Pose) -> Pose:
    """Reference Transformation.cpp:85-93."""
    q_inv = quat_conjugate(p.q)
    return Pose(t=quat_rotate(q_inv, -p.t), q=q_inv)


def pose_apply(p: Pose, x: jnp.ndarray) -> jnp.ndarray:
    """Apply pose to 3D point(s): R x + t (reference Transformation.cpp:95-100)."""
    return quat_rotate(p.q, x) + p.t


def pose_exp(tangent: jnp.ndarray) -> Pose:
    """SE(3) exp with [translation, rotation] tangent ordering
    (reference Transformation.cpp:176-182)."""
    t, q = se3_exp(tangent)
    return Pose(t=t, q=q)


def pose_log(p: Pose) -> jnp.ndarray:
    """Inverse of pose_exp (reference Transformation.cpp:168-174)."""
    return se3_log(p.t, p.q)


def pose_normalize(p: Pose) -> Pose:
    return Pose(t=p.t, q=quat_normalize(p.q))


def pose_rpy(p: Pose) -> jnp.ndarray:
    """Roll-pitch-yaw extraction (reference Transformation.cpp:125-140)."""
    x, y, z, w = p.q[..., 0], p.q[..., 1], p.q[..., 2], p.q[..., 3]
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2.0 * (w * y - x * z), -1.0, 1.0))
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def pose_from_rpy(roll, pitch, yaw, t=None, dtype=jnp.float32) -> Pose:
    """Reference Transformation.cpp:147-163 (setRollPitchYaw)."""
    cr, sr = jnp.cos(0.5 * roll), jnp.sin(0.5 * roll)
    cp, sp = jnp.cos(0.5 * pitch), jnp.sin(0.5 * pitch)
    cy, sy = jnp.cos(0.5 * yaw), jnp.sin(0.5 * yaw)
    q = jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    ).astype(dtype)
    q = quat_normalize(q)
    if t is None:
        t = jnp.zeros(q.shape[:-1] + (3,), dtype=dtype)
    return Pose(t=jnp.asarray(t, dtype=dtype), q=q)
