"""Quaternion and Lie-group primitives (jit/vmap/grad-safe, dtype-polymorphic).

Conventions (matching the reference implementation for differential testing):
  * Quaternions are stored ``[x, y, z, w]`` (Eigen coeffs order; reference
    src/core/common/Quaternion.h:13-18).
  * ``quat_log`` maps a unit quaternion to the full rotation-vector tangent
    (angle * axis), i.e. log of the quaternion as an SO(3) element — the
    reference's ``Quaterniond::log`` (Quaternion.h:61-152).
  * ``quat_exp`` is its inverse (Quaternion.h:154-233).
  * SE(3) exp/log use the Sophus convention with tangent ordered
    ``[translation, rotation]`` (reference Transformation.cpp:168-186).

All branchy small-angle handling from the reference is re-expressed as
``jnp.where`` with safe operands so that both primal and tangent computations
are finite under autodiff (the standard "double-where" trick).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _small_threshold(dtype) -> float:
    """Squared-norm threshold below which Taylor branches are used.

    The reference uses 1e-20 in float64 (Quaternion.h:77,166). We scale with
    dtype precision so the float32 TPU path switches early enough that the
    non-Taylor branch's catastrophic cancellation never dominates.
    """
    if jnp.finfo(dtype).bits >= 64:
        return 1e-20
    return 1e-10


def quat_identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def quat_multiply(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q*p, xyzw layout (reference Quaternion.h:44-50)."""
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    px, py, pz, pw = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    return jnp.stack(
        [
            qw * px + qx * pw + qy * pz - qz * py,
            qw * py + qy * pw + qz * px - qx * pz,
            qw * pz + qz * pw + qx * py - qy * px,
            qw * pw - qx * px - qy * py - qz * pz,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by unit quaternion(s) q.

    Uses the expanded 2-cross-product form (cheaper than q*v*q^-1 and
    identical for unit quaternions; reference Quaternion.h:52-59 uses the
    sandwich form).
    """
    xyz = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(xyz, v)
    return v + w * t + jnp.cross(xyz, t)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> 3x3 rotation matrix (batched over leading dims)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_log(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation-vector log of a unit quaternion (reference Quaternion.h:61-152).

    Returns ``lambda * [x, y, z]`` with
      lambda = 2*atan2(n, w)/n          for n = |imag| away from zero,
      lambda = 2/w - (2/3)*n^2/w^3      (Taylor) near n = 0.

    Note the reference uses ``atan(n/w)`` with an explicit ``|w| < 1e-10``
    branch; ``atan2(n, w)`` with n >= 0 is the same function for w > 0 and
    extends it continuously through w = 0. For w < 0 atan2 returns the
    equivalent tangent shifted by 2*pi/n*axis — both are valid logs of the
    same rotation; tests compare rotations, not raw tangents, for w < 0.
    """
    xyz = q[..., :3]
    w = q[..., 3]
    sq = jnp.sum(xyz * xyz, axis=-1)
    small = sq < _small_threshold(q.dtype)
    sq_safe = jnp.where(small, jnp.ones_like(sq), sq)
    n = jnp.sqrt(sq_safe)
    lam_big = 2.0 * jnp.arctan2(n, w) / n
    w_safe = jnp.where(jnp.abs(w) < 1e-6, jnp.sign(w) + (w == 0), w)
    lam_small = 2.0 / w_safe - (2.0 / 3.0) * sq / (w_safe ** 3)
    lam = jnp.where(small, lam_small, lam_big)
    return lam[..., None] * xyz


def quat_exp(omega: jnp.ndarray) -> jnp.ndarray:
    """Inverse of quat_log: rotation vector -> unit quaternion.

    Reference Quaternion.h:154-233 with the same Taylor switch:
      imag = sin(theta/2)/theta, real = cos(theta/2); near zero
      imag = 1/2 - theta^2/48 + theta^4/3840, real = 1 - theta^2/8 + theta^4/384.
    """
    theta_sq = jnp.sum(omega * omega, axis=-1)
    small = theta_sq < _small_threshold(omega.dtype)
    theta_sq_safe = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    theta = jnp.sqrt(theta_sq_safe)
    imag_big = jnp.sin(0.5 * theta) / theta
    real_big = jnp.cos(0.5 * theta)
    theta_po4 = theta_sq * theta_sq
    imag_small = 0.5 - theta_sq / 48.0 + theta_po4 / 3840.0
    real_small = 1.0 - theta_sq / 8.0 + theta_po4 / 384.0
    imag = jnp.where(small, imag_small, imag_big)
    real = jnp.where(small, real_small, real_big)
    return jnp.concatenate([imag[..., None] * omega, real[..., None]], axis=-1)


def so3_hat(omega: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of a 3-vector (batched)."""
    ox, oy, oz = omega[..., 0], omega[..., 1], omega[..., 2]
    zero = jnp.zeros_like(ox)
    m = jnp.stack(
        [zero, -oz, oy, oz, zero, -ox, -oy, ox, zero], axis=-1
    )
    return m.reshape(omega.shape[:-1] + (3, 3))


def _se3_V(omega: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian V of SO(3) such that t = V @ rho in SE(3) exp."""
    theta_sq = jnp.sum(omega * omega, axis=-1)
    small = theta_sq < _small_threshold(omega.dtype)
    theta_sq_safe = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    theta = jnp.sqrt(theta_sq_safe)
    O = so3_hat(omega)
    OO = O @ O
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), OO.shape)
    a_big = (1.0 - jnp.cos(theta)) / theta_sq_safe
    b_big = (theta - jnp.sin(theta)) / (theta_sq_safe * theta)
    a_small = 0.5 - theta_sq / 24.0
    b_small = 1.0 / 6.0 - theta_sq / 120.0
    a = jnp.where(small, a_small, a_big)
    b = jnp.where(small, b_small, b_big)
    return eye + a[..., None, None] * O + b[..., None, None] * OO


def _se3_V_inv(omega: jnp.ndarray) -> jnp.ndarray:
    theta_sq = jnp.sum(omega * omega, axis=-1)
    small = theta_sq < _small_threshold(omega.dtype)
    theta_sq_safe = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    theta = jnp.sqrt(theta_sq_safe)
    O = so3_hat(omega)
    OO = O @ O
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), OO.shape)
    half_theta = 0.5 * theta
    c_big = (1.0 - half_theta * jnp.cos(half_theta) / jnp.sin(half_theta)) / theta_sq_safe
    c_small = 1.0 / 12.0 + theta_sq / 720.0
    c = jnp.where(small, c_small, c_big)
    return eye - 0.5 * O + c[..., None, None] * OO


def se3_exp(tangent: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """SE(3) exponential, tangent = [rho(3), omega(3)] (Sophus convention,
    reference Transformation.cpp:176-182). Returns (t, q_xyzw)."""
    rho = tangent[..., :3]
    omega = tangent[..., 3:]
    q = quat_exp(omega)
    t = jnp.einsum("...ij,...j->...i", _se3_V(omega), rho)
    return t, q


def se3_log(t: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """SE(3) log, inverse of se3_exp (reference Transformation.cpp:168-174)."""
    omega = quat_log(q)
    rho = jnp.einsum("...ij,...j->...i", _se3_V_inv(omega), t)
    return jnp.concatenate([rho, omega], axis=-1)


def quat_boxplus(q: jnp.ndarray, omega: jnp.ndarray) -> jnp.ndarray:
    """Right-multiplicative manifold retraction q ⊞ omega = q * exp(omega).

    This is the local parameterization used throughout the reference
    (Spline.h:317-330 Plus_R, SplineFunctor.h local-param Jacobians).
    """
    return quat_multiply(q, quat_exp(omega))
