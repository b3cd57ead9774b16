"""Two-view geometry: essential/fundamental matrices and batched DLT
triangulation.

Reference parity: src/core/common/EpipolarGeometry.h:11-45 (essential,
fundamental, ColMap-style SVD triangulation) and Linalg.h skew matrix — all
batched/jittable here; triangulation runs as one batched 4x4 SVD instead of a
per-point host loop.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.lie import so3_hat


def essential_matrix(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """E = R [t]_x (reference EpipolarGeometry.h:12-15)."""
    return R @ so3_hat(t)


def fundamental_matrix(
    Kinv_cur: jnp.ndarray, T_ref2cur: jnp.ndarray, Kinv_ref: jnp.ndarray
) -> jnp.ndarray:
    """F = Kinv_cur^T E(R, -R^T t) Kinv_ref with T_ref2cur a 4x4 homogeneous
    transform (reference EpipolarGeometry.h:17-26)."""
    R = T_ref2cur[..., :3, :3]
    t = T_ref2cur[..., :3, 3]
    t_ = -jnp.einsum("...ji,...j->...i", R, t)
    return (
        jnp.swapaxes(Kinv_cur, -1, -2) @ essential_matrix(R, t_) @ Kinv_ref
    )


def projection_matrix(K: jnp.ndarray, R_w2c: jnp.ndarray, t_w2c: jnp.ndarray) -> jnp.ndarray:
    """3x4 P = K_mat [R | t] with K = [fx, fy, cx, cy]."""
    Km = jnp.array(
        [[K[0], 0.0, K[2]], [0.0, K[1], K[3]], [0.0, 0.0, 1.0]], dtype=K.dtype
    )
    Rt = jnp.concatenate([R_w2c, t_w2c[..., None]], axis=-1)
    return Km @ Rt


def triangulate_points(
    P1: jnp.ndarray, P2: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray
) -> jnp.ndarray:
    """Batched two-view DLT triangulation (reference EpipolarGeometry.h:28-45,
    ColMap-derived).

    P1, P2: [3, 4] (or [..., 3, 4]) projection matrices.
    x1, x2: [..., 2] pixel observations.
    Returns [..., 3] world points (hnormalized SVD null vector).
    """
    rows = [
        x1[..., 0, None] * P1[..., 2, :] - P1[..., 0, :],
        x1[..., 1, None] * P1[..., 2, :] - P1[..., 1, :],
        x2[..., 0, None] * P2[..., 2, :] - P2[..., 0, :],
        x2[..., 1, None] * P2[..., 2, :] - P2[..., 1, :],
    ]
    A = jnp.stack(rows, axis=-2)  # [..., 4, 4]
    _, _, Vt = jnp.linalg.svd(A)
    X = Vt[..., 3, :]
    return X[..., :3] / X[..., 3, None]
