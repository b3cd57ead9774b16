"""Dynamic (scene-flow) landmarks: moving 3D points with motion status.

Parity with the reference's Point3dDynamic
(/root/reference/src/core/states/Point3dDynamic.h:1-90: a 3D point whose
observations carry per-frame scene-flow vectors and a MotionStatus in
{STATIC, DYNAMIC, UNCERTAIN}; /root/reference/src/core/common/Enums.h).

TPU re-design: the whole dynamic-point table is dense fixed-shape arrays —
a constant-velocity scene-flow model X(t) = X0 + v (t - t0) per point,
batched — so estimation jits:

  * :func:`dynamic_reprojection_residuals` — residuals of moving points
    against multi-frame observations;
  * :func:`fit_scene_flow` — batched 6-dof GN per point ([X0; v]) from its
    window observations at known camera poses (the estimation the
    reference's mutable scene-flow storage anticipates but never runs);
  * :func:`classify_motion` — STATIC / DYNAMIC / UNCERTAIN from the fitted
    flow magnitude vs its improvement over the static model (the
    updateMotionStatus analogue, data-driven instead of caller-set).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.lie import quat_conjugate, quat_rotate

# MotionStatus codes (reference Enums.h MotionStatus)
MOTION_UNCERTAIN = 0
MOTION_STATIC = 1
MOTION_DYNAMIC = 2


class DynamicPoints(NamedTuple):
    """Dense dynamic landmark table.

    points:   [M, 3] position X0 at reference time t0
    flow:     [M, 3] world-frame scene-flow velocity (m/s)
    t0:       [M]    per-point reference time
    status:   [M]    int32 MotionStatus
    mask:     [M]    1.0 = live slot
    """

    points: jnp.ndarray
    flow: jnp.ndarray
    t0: jnp.ndarray
    status: jnp.ndarray
    mask: jnp.ndarray


def make_dynamic_points(points, t0, flow=None, mask=None) -> DynamicPoints:
    points = jnp.asarray(points)
    M = points.shape[0]
    return DynamicPoints(
        points=points,
        flow=jnp.zeros_like(points) if flow is None else jnp.asarray(flow),
        t0=jnp.broadcast_to(jnp.asarray(t0, points.dtype), (M,)),
        status=jnp.full((M,), MOTION_UNCERTAIN, jnp.int32),
        mask=jnp.ones((M,), points.dtype) if mask is None else jnp.asarray(mask),
    )


def position_at(pts: DynamicPoints, times: jnp.ndarray) -> jnp.ndarray:
    """[T, M, 3] point positions at [T] times under constant scene flow."""
    dt = times[:, None] - pts.t0[None, :]                  # [T, M]
    return pts.points[None] + pts.flow[None] * dt[..., None]


def _project(pose_t, pose_q, X, K):
    q_inv = quat_conjugate(pose_q)
    Pc = quat_rotate(q_inv, X - pose_t)
    z = jnp.maximum(Pc[..., 2], 1e-6)
    return jnp.stack(
        [Pc[..., 0] / z * K[0] + K[2], Pc[..., 1] / z * K[1] + K[3]], axis=-1
    )


def dynamic_reprojection_residuals(
    pts: DynamicPoints,
    cam_t: jnp.ndarray,    # [T, 3] camera-to-world translations
    cam_q: jnp.ndarray,    # [T, 4]
    times: jnp.ndarray,    # [T]
    obs_xy: jnp.ndarray,   # [T, M, 2]
    obs_mask: jnp.ndarray,  # [T, M]
    K: jnp.ndarray,
) -> jnp.ndarray:
    """[T, M, 2] masked reprojection residuals of the moving points."""
    X = position_at(pts, times)                            # [T, M, 3]
    proj = jax.vmap(_project, in_axes=(0, 0, 0, None))(cam_t, cam_q, X, K)
    return (proj - obs_xy) * obs_mask[..., None]


def fit_scene_flow(
    pts: DynamicPoints,
    cam_t: jnp.ndarray,
    cam_q: jnp.ndarray,
    times: jnp.ndarray,
    obs_xy: jnp.ndarray,
    obs_mask: jnp.ndarray,
    K: jnp.ndarray,
    iterations: int = 10,
    damping: float = 1e-6,
) -> DynamicPoints:
    """Batched per-point GN over [X0; v] (6 dof each, [M, 6, 6] solves).

    Points are independent given the camera poses, so the whole table fits
    in a handful of batched einsums + 6x6 Cholesky solves per iteration —
    the dense TPU shape of "mutable P3d + scene flow" optimization
    (Point3dDynamic.h:56-58 getMutableP3dData/getMutableSceneFlow).

    Observability caveat (structural, not numerical): with a LINEAR camera
    path, a constant-velocity point is ambiguous — any 3D line meeting all
    the per-frame observation rays reprojects exactly (the camera path
    itself is one such transversal), so the fit converges to zero residual
    at a possibly-wrong (X0, v). Path curvature (rotation or non-linear
    translation) breaks the family; tests/test_dynamic_points.py pins both
    regimes. The guarantee here is observation consistency; unique recovery
    additionally needs a non-degenerate trajectory.
    """
    dtype = pts.points.dtype

    def fit_one(z0, t0, oxy, om):
        def res(z):
            def one(ct, cq, tm, o, m):
                X = z[:3] + z[3:] * (tm - t0)
                return (_project(ct, cq, X, K) - o) * m

            return jax.vmap(one)(cam_t, cam_q, times, oxy, om).reshape(-1)

        def body(z, _):
            r = res(z)
            J = jax.jacfwd(res)(z)                      # [T*2, 6]
            H = J.T @ J + damping * jnp.eye(6, dtype=dtype)
            g = J.T @ r
            step = -jnp.linalg.solve(H, g)
            z_new = z + step
            better = jnp.sum(res(z_new) ** 2) < jnp.sum(r ** 2)
            return jnp.where(better, z_new, z), None

        z, _ = jax.lax.scan(body, z0, None, length=iterations)
        return z

    z0 = jnp.concatenate([pts.points, pts.flow], axis=-1)   # [M, 6]
    z = jax.vmap(fit_one, in_axes=(0, 0, 1, 1))(
        z0, pts.t0, obs_xy, obs_mask
    )
    live = pts.mask[:, None] > 0
    return pts._replace(
        points=jnp.where(live, z[:, :3], pts.points),
        flow=jnp.where(live, z[:, 3:], pts.flow),
    )


def classify_motion(
    pts: DynamicPoints,
    cam_t: jnp.ndarray,
    cam_q: jnp.ndarray,
    times: jnp.ndarray,
    obs_xy: jnp.ndarray,
    obs_mask: jnp.ndarray,
    K: jnp.ndarray,
    static_flow_thresh: float = 0.02,
    min_improvement: float = 4.0,
) -> DynamicPoints:
    """MotionStatus from the fitted model (updateMotionStatus analogue):

      STATIC    — fitted |flow| below static_flow_thresh m/s;
      DYNAMIC   — |flow| above threshold AND the flow model reduces the
                  reprojection cost by >= min_improvement vs flow=0;
      UNCERTAIN — large flow that does not actually explain the data.
    """
    r_dyn = dynamic_reprojection_residuals(
        pts, cam_t, cam_q, times, obs_xy, obs_mask, K
    )
    r_sta = dynamic_reprojection_residuals(
        pts._replace(flow=jnp.zeros_like(pts.flow)),
        cam_t, cam_q, times, obs_xy, obs_mask, K,
    )
    n = jnp.maximum(obs_mask.sum(axis=0), 1.0)              # [M]
    c_dyn = jnp.sum(r_dyn ** 2, axis=(0, 2)) / n
    c_sta = jnp.sum(r_sta ** 2, axis=(0, 2)) / n
    speed = jnp.linalg.norm(pts.flow, axis=-1)

    is_static = speed < static_flow_thresh
    explains = c_sta > min_improvement * jnp.maximum(c_dyn, 1e-12)
    status = jnp.where(
        is_static,
        MOTION_STATIC,
        jnp.where(explains, MOTION_DYNAMIC, MOTION_UNCERTAIN),
    ).astype(jnp.int32)
    return pts._replace(status=jnp.where(pts.mask > 0, status,
                                         MOTION_UNCERTAIN).astype(jnp.int32))
