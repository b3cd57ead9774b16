"""Two-view geometry: essential/fundamental matrices and batched DLT
triangulation.

Reference parity: src/core/common/EpipolarGeometry.h:11-45 (essential,
fundamental, ColMap-style SVD triangulation) and Linalg.h skew matrix — all
batched/jittable here; triangulation runs as one batched 4x4 SVD instead of a
per-point host loop.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.lie import (
    quat_conjugate,
    quat_exp,
    quat_multiply,
    quat_rotate,
    so3_hat,
)
from ..core.transform import Pose


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


def solve_pnp(
    points: jnp.ndarray,    # [N, 3] 3D points (any fixed frame F)
    obs_xy: jnp.ndarray,    # [N, 2] pixel observations in the query camera
    mask: jnp.ndarray,      # [N] 1.0 = live correspondence
    K: jnp.ndarray,         # [4] fx fy cx cy
    init: Pose,             # initial camera-to-F pose guess
    huber_a: float = 2.0,
    max_iterations: int = 30,
) -> Tuple[Pose, jnp.ndarray]:
    """Masked robust PnP refinement: the camera-to-F pose minimizing Huber
    reprojection error of ``points`` observed at ``obs_xy``.

    The 3D-2D resection the reference's Matches.h scaffolding anticipates
    (3D point + 2D feature pairs) but never solves. Fully jittable LM on the
    6-dim tangent; returns (pose, final mean Huber cost). Used by the
    backend's loop-closure edges where ``F`` is an old keyframe's local frame
    — making the edge measurement independent of accumulated world drift.
    """
    dtype = points.dtype
    n = jnp.maximum(mask.sum(), 1.0)
    aa = huber_a * huber_a

    def residuals(pose: Pose) -> jnp.ndarray:
        q_inv = quat_conjugate(pose.q)
        Pc = quat_rotate(q_inv[None], points - pose.t[None])
        z = jnp.maximum(Pc[:, 2], 1e-6)
        proj = jnp.stack(
            [Pc[:, 0] / z * K[0] + K[2], Pc[:, 1] / z * K[1] + K[3]], axis=-1
        )
        return proj - obs_xy

    def cost_of(pose: Pose) -> jnp.ndarray:
        r2 = jnp.sum(residuals(pose) ** 2, axis=-1)
        x = 0.5 * r2
        sx = jnp.sqrt(jnp.maximum(x, 1e-24))
        rho = jnp.where(x > aa, 2.0 * huber_a * sx - aa, x)
        return jnp.sum(rho * mask) / n

    def build(pose: Pose):
        def res_of(delta):
            p = Pose(
                t=pose.t + delta[:3],
                q=quat_multiply(pose.q, quat_exp(delta[3:])),
            )
            return residuals(p)

        z = jnp.zeros(6, dtype)
        r = res_of(z)
        J = jax.jacfwd(res_of)(z)                        # [N, 2, 6]
        r2 = jnp.sum(r * r, axis=-1)
        x = 0.5 * r2
        sx = jnp.sqrt(jnp.maximum(x, 1e-24))
        w2 = jnp.where(x > aa, huber_a / sx, 1.0) * mask  # [N]
        H = jnp.einsum("nia,n,nib->ab", J, w2, J) / n
        g = jnp.einsum("nia,n,ni->a", J, w2, r) / n
        return H, g

    def body(state):
        pose, cost, lam, it = state
        H, g = build(pose)
        Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-12 * jnp.eye(6, dtype=dtype)
        delta = -jnp.linalg.solve(Hd, g)
        cand = Pose(
            t=pose.t + delta[:3], q=quat_multiply(pose.q, quat_exp(delta[3:]))
        )
        cand_cost = cost_of(cand)
        ok = (cand_cost < cost) & jnp.all(jnp.isfinite(delta))
        pose = jax.tree.map(lambda a, b: jnp.where(ok, a, b), cand, pose)
        return (
            pose,
            jnp.where(ok, cand_cost, cost),
            jnp.where(ok, lam * 0.5, lam * 4.0),
            it + 1,
        )

    def cond(state):
        return state[3] < max_iterations

    init = Pose(t=jnp.asarray(init.t, dtype), q=jnp.asarray(init.q, dtype))
    state = (init, cost_of(init), jnp.asarray(1e-4, dtype), jnp.int32(0))
    pose, cost, _, _ = lax.while_loop(cond, body, state)
    return pose, cost


solve_pnp_jit = jax.jit(solve_pnp, static_argnums=(5, 6))


@jax.jit
def pnp_residual_norms(
    points: jnp.ndarray,   # [N, 3] 3D points in frame F
    obs_xy: jnp.ndarray,   # [N, 2]
    K: jnp.ndarray,
    pose: Pose,            # camera-to-F
) -> jnp.ndarray:
    """[N] reprojection residual norms of ``points`` under ``pose`` — the
    per-correspondence statistic PnP inlier gating reads (loop-closure
    candidate matches carry descriptor-aliasing outliers that a single
    robust solve cannot fully reject)."""
    q_inv = quat_conjugate(pose.q)
    Pc = quat_rotate(q_inv[None], points - pose.t[None])
    z = jnp.maximum(Pc[:, 2], 1e-6)
    proj = jnp.stack(
        [Pc[:, 0] / z * K[0] + K[2], Pc[:, 1] / z * K[1] + K[3]], axis=-1
    )
    return jnp.linalg.norm(proj - obs_xy, axis=-1)
