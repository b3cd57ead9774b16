"""Sliding-window bundle adjustment with Schur-complement landmark elimination.

The capability the reference scaffolds but never builds (MapSparse /
Point3dStatic observations; SURVEY.md §7 phase 5). TPU-first structure:

  * the problem is dense [W frames, M landmarks] tensors with masks — no
    sparse graphs, so everything jits and shards;
  * reprojection Jacobians come from vmapped autodiff of a per-observation
    residual (2x6 pose block, 2x3 landmark block);
  * the normal equations are assembled blockwise by einsum (MXU):
        U [W,6,6], V [M,3,3], W_blk [W,M,6,3], g_p [W,6], g_x [M,3]
  * landmark blocks are eliminated with batched 3x3 solves and the reduced
    camera system S = U - W V^-1 W^T ([6W, 6W]) is solved densely;
  * a trust-region LM loop (same policy as the tracker's solver) runs the
    whole thing inside one jit.

Gauge freedom is fixed by freezing pose 0 (its tangent columns are zeroed
and its diagonal block replaced by identity, so its step is exactly 0).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.lie import quat_conjugate, quat_exp, quat_multiply, quat_rotate, se3_log
from ..core.transform import Pose
from .map import SlidingWindowMap


@dataclasses.dataclass(frozen=True)
class BAOptions:
    max_iterations: int = 20
    huber_a: float = 2.0            # pixels (reprojection units)
    initial_lambda: float = 1e-4
    lambda_up: float = 4.0
    lambda_down: float = 0.5
    min_lambda: float = 1e-10
    max_lambda: float = 1e8
    min_rel_decrease: float = 1e-9
    landmark_damping: float = 1e-8  # keeps V invertible for unobserved slots


class OdomPrior(NamedTuple):
    """Relative-pose odometry priors between consecutive window poses.

    The tracker's frame-to-keyframe odometry is a strong measurement of
    consecutive keyframe relative poses; without it a sparsely-observed BA
    window (few landmarks) is free to bend the chain arbitrarily. Residual
    per edge e (pose e -> e+1):  r_e = log(T_meas^-1 (T_e^-1 T_{e+1})),
    cost 0.5 * weight_e * ||r_e||^2. weight 0 disables an edge (used for
    padding while the window fills up).
    """

    t: jnp.ndarray       # [W-1, 3] measured relative translation (in frame e)
    q: jnp.ndarray       # [W-1, 4] measured relative rotation
    weight: jnp.ndarray  # [W-1]


class BAProblem(NamedTuple):
    poses: Pose                 # [W] camera-to-world
    map: SlidingWindowMap
    K: jnp.ndarray              # [4] fx fy cx cy
    odom: Optional[OdomPrior] = None
    # [W] 1.0 = live pose, 0.0 = padding (window still filling). Padded poses
    # are frozen exactly like the gauge pose — without this their zero
    # diagonal blocks make the reduced camera system singular.
    pose_mask: Optional[jnp.ndarray] = None


class BASummary(NamedTuple):
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    num_iterations: jnp.ndarray


def _reproject_residual(pose_t, pose_q, X, obs, K):
    """Reprojection residual of one observation: project_w2c(X) - obs."""
    q_inv = quat_conjugate(pose_q)
    Pc = quat_rotate(q_inv, X - pose_t)
    z = jnp.maximum(Pc[2], 1e-6)
    proj = jnp.stack([Pc[0] / z * K[0] + K[2], Pc[1] / z * K[1] + K[3]])
    return proj - obs


def _residuals_and_jacobians(problem: BAProblem):
    """r [W,M,2], J_pose [W,M,2,6], J_point [W,M,2,3] via vmapped autodiff.

    Pose tangent layout [dt(3); dw(3)], right-multiplicative rotation
    retraction (same convention as the tracker's knots)."""
    K = problem.K

    def res_one(pt, pq, X, obs, d_pose, d_point):
        t = pt + d_pose[:3]
        q = quat_multiply(pq, quat_exp(d_pose[3:]))
        return _reproject_residual(t, q, X + d_point, obs, K)

    z6 = jnp.zeros(6, problem.poses.t.dtype)
    z3 = jnp.zeros(3, problem.poses.t.dtype)

    def one(pt, pq, X, obs):
        r = res_one(pt, pq, X, obs, z6, z3)
        Jp, Jx = jax.jacfwd(res_one, argnums=(4, 5))(pt, pq, X, obs, z6, z3)
        return r, Jp, Jx

    over_m = jax.vmap(one, in_axes=(None, None, 0, 0))
    over_w = jax.vmap(over_m, in_axes=(0, 0, None, 0))
    return over_w(
        problem.poses.t, problem.poses.q, problem.map.points, problem.map.obs_xy
    )


def _huber_weight(r2, a):
    """sqrt(drho/dx) and rho for x = r2/2, Huber parameter a (same form as
    the tracker, compute_hessian_gradients_cost.cu:188-199)."""
    aa = a * a
    x = 0.5 * r2
    sx = jnp.sqrt(jnp.maximum(x, 1e-24))
    big = x > aa
    rho = jnp.where(big, 2.0 * a * sx - aa, x)
    w2 = jnp.where(big, a / sx, 1.0)  # drho/dx
    return rho, w2


def _allreduce(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


def _odom_residuals(poses: Pose, odom: OdomPrior) -> jnp.ndarray:
    """[W-1, 6] relative-pose prior residuals log(T_meas^-1 (T_e^-1 T_{e+1}))."""
    qi, qj = poses.q[:-1], poses.q[1:]
    ti, tj = poses.t[:-1], poses.t[1:]
    qi_inv = quat_conjugate(qi)
    q_rel = quat_multiply(qi_inv, qj)
    t_rel = quat_rotate(qi_inv, tj - ti)
    qm_inv = quat_conjugate(odom.q)
    q_err = quat_multiply(qm_inv, q_rel)
    t_err = quat_rotate(qm_inv, t_rel - odom.t)
    return se3_log(t_err, q_err)


def _odom_cost(poses: Pose, odom: Optional[OdomPrior], inv_n) -> jnp.ndarray:
    """Scalar prior cost, scaled by the same 1/n normalizer as the
    reprojection cost so weights mean the same thing at any window fill."""
    if odom is None:
        return jnp.zeros((), poses.t.dtype)
    r = _odom_residuals(poses, odom)
    return 0.5 * jnp.sum(odom.weight[:, None] * r * r) * inv_n


def _odom_terms(poses: Pose, odom: Optional[OdomPrior], inv_n):
    """(cost, g [W,6], H [6W,6W]) of the Gauss-Newton-linearized prior at the
    current poses. Pose-indexed and replicated — NOT psum-reduced in sharded
    mode (every shard computes the identical value)."""
    Wn = poses.t.shape[0]
    dtype = poses.t.dtype
    if odom is None:
        return (
            jnp.zeros((), dtype),
            jnp.zeros((Wn, 6), dtype),
            jnp.zeros((Wn * 6, Wn * 6), dtype),
        )

    def res_of(delta):
        p = Pose(
            t=poses.t + delta[:, :3],
            q=quat_multiply(poses.q, quat_exp(delta[:, 3:])),
        )
        return _odom_residuals(p, odom)

    z = jnp.zeros((Wn, 6), dtype)
    r0 = res_of(z)
    J = jax.jacfwd(res_of)(z).reshape((Wn - 1) * 6, Wn * 6)
    wrow = jnp.repeat(odom.weight, 6)
    cost = 0.5 * jnp.sum(wrow * r0.reshape(-1) ** 2) * inv_n
    g = (J.T @ (wrow * r0.reshape(-1))).reshape(Wn, 6) * inv_n
    H = (J.T * wrow[None, :]) @ J * inv_n
    return cost, g, H


def build_normal_equations(problem: BAProblem, huber_a: float, axis_name=None):
    """Blockwise GN system with robust weights. Returns
    (cost, U, V, W_blk, g_p, g_x, mask).

    With ``axis_name`` set (landmarks sharded over a mesh axis inside
    shard_map), the pose-indexed quantities (cost, U, g_p) are psum-reduced
    to global values; the landmark-indexed blocks (V, W_blk, g_x) stay
    shard-local — the Schur elimination then reduces them with one more psum
    (schur_solve).
    """
    r, Jp, Jx = _residuals_and_jacobians(problem)
    m = problem.map
    mask = m.obs_mask * m.point_mask[None, :]          # [W, M_local]
    r2 = jnp.sum(r * r, axis=-1)                       # [W, M_local]
    rho, w2 = _huber_weight(r2, huber_a)
    wgt = w2 * mask                                    # [W, M_local]

    n = jnp.maximum(_allreduce(mask.sum(), axis_name), 1.0)
    cost = _allreduce(jnp.sum(rho * mask), axis_name) / n

    U = _allreduce(jnp.einsum("wmia,wm,wmib->wab", Jp, wgt, Jp), axis_name)
    V = jnp.einsum("wmia,wm,wmib->mab", Jx, wgt, Jx)
    Wb = jnp.einsum("wmia,wm,wmib->wmab", Jp, wgt, Jx)
    g_p = _allreduce(jnp.einsum("wmia,wm,wmi->wa", Jp, wgt, r), axis_name)
    g_x = jnp.einsum("wmia,wm,wmi->ma", Jx, wgt, r)

    # odometry prior terms are pose-indexed -> computed replicated (identical
    # on every shard), added AFTER the psum so they count exactly once.
    # g_o/H_o stay UNNORMALIZED like the raw-sum reprojection terms (U, g_p):
    # the GN step must optimize the same relative weighting as the
    # (uniformly 1/n-scaled) cost used for step acceptance — normalizing
    # only the prior would shrink its effective weight to odom_weight/n
    c_o, g_o, H_o = _odom_terms(problem.poses, problem.odom, 1.0)
    return cost + c_o / n, U, V, Wb, g_p + g_o, g_x, H_o, mask


def evaluate_cost(problem: BAProblem, huber_a: float, axis_name=None):
    r, _, _ = _residuals_and_jacobians(problem)
    m = problem.map
    mask = m.obs_mask * m.point_mask[None, :]
    r2 = jnp.sum(r * r, axis=-1)
    rho, _ = _huber_weight(r2, huber_a)
    n = jnp.maximum(_allreduce(mask.sum(), axis_name), 1.0)
    cost = _allreduce(jnp.sum(rho * mask), axis_name) / n
    return cost + _odom_cost(problem.poses, problem.odom, 1.0 / n)


def schur_solve(U, V, Wb, g_p, g_x, lam: jnp.ndarray, opts: BAOptions,
                axis_name=None, H_pose=None, pose_mask=None):
    """Solve the damped GN system by eliminating landmark blocks.

    Returns (delta_pose [W,6], delta_point [M,3]).
    Pose 0 is gauge-fixed: its rows/cols are zeroed and replaced by identity.

    Sharded mode (axis_name set): V/Wb/g_x hold this shard's landmarks; the
    reduced camera system S and rhs are psum-assembled over the mesh, the
    dense [6W,6W] solve runs redundantly-but-identically on every shard
    (poses replicated), and the landmark back-substitution stays local —
    the distributed Schur reduction of SURVEY.md §7 phase 6.
    """
    Wn, Mn = Wb.shape[0], Wb.shape[1]
    dtype = U.dtype
    eye6 = jnp.eye(6, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)

    # gauge fix pose 0: zero its coupling, identity diagonal; padded window
    # slots (pose_mask 0) are frozen the same way
    gauge = jnp.ones((Wn,), dtype).at[0].set(0.0)
    if pose_mask is not None:
        gauge = gauge * pose_mask
    U = U * gauge[:, None, None]
    Wb = Wb * gauge[:, None, None, None]
    g_p = g_p * gauge[:, None]

    # LM damping: scale diagonals by (1 + lambda)
    U = U + (lam * jnp.diagonal(U, axis1=-2, axis2=-1))[..., None] * eye6[None]
    V = V + (lam * jnp.diagonal(V, axis1=-2, axis2=-1))[..., None] * eye3[None]
    V = V + opts.landmark_damping * eye3[None]
    U = U + (1.0 - gauge)[:, None, None] * eye6[None]

    Vinv = jnp.linalg.inv(V)                               # [M,3,3]
    WVi = jnp.einsum("wmab,mbc->wmac", Wb, Vinv)           # [W,M,6,3]

    S_blocks = _allreduce(
        jnp.einsum("wmac,vmbc->wavb", WVi, Wb), axis_name
    )  # [W,6,V,6]
    S = -S_blocks.reshape(Wn * 6, Wn * 6)
    U_full = jax.scipy.linalg.block_diag(*[U[i] for i in range(Wn)])
    S = S + U_full
    if H_pose is not None:
        # pose-pose coupling (odometry prior): gauge-project pose 0's
        # rows/cols and apply the same multiplicative diagonal damping
        gauge6 = jnp.repeat(gauge, 6)
        He = H_pose * gauge6[:, None] * gauge6[None, :]
        He = He + lam * jnp.diag(jnp.diag(He))
        S = S + He

    rhs = (
        g_p - _allreduce(jnp.einsum("wmac,mc->wa", WVi, g_x), axis_name)
    ).reshape(-1)
    L = jnp.linalg.cholesky(S)
    dp = -jax.scipy.linalg.cho_solve((L, True), rhs)
    dp = dp.reshape(Wn, 6) * gauge[:, None]

    dx = -jnp.einsum(
        "mab,mb->ma",
        Vinv,
        g_x + jnp.einsum("wmab,wa->mb", Wb, dp),
    )
    return dp, dx


def _apply_step(problem: BAProblem, dp: jnp.ndarray, dx: jnp.ndarray) -> BAProblem:
    new_t = problem.poses.t + dp[:, :3]
    new_q = quat_multiply(problem.poses.q, quat_exp(dp[:, 3:]))
    new_points = problem.map.points + dx * problem.map.point_mask[:, None]
    return problem._replace(
        poses=Pose(t=new_t, q=new_q),
        map=problem.map._replace(points=new_points),
    )


class _BAState(NamedTuple):
    problem: BAProblem
    cost: jnp.ndarray
    lam: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray


def run_bundle_adjustment(
    problem: BAProblem, opts: BAOptions, axis_name=None
) -> Tuple[BAProblem, BASummary]:
    """LM loop over the Schur-reduced system, fully on device.

    axis_name: run inside shard_map with landmarks sharded over that mesh
    axis (poses replicated); see build_normal_equations / schur_solve.
    """
    dtype = problem.poses.t.dtype
    cost0 = evaluate_cost(problem, opts.huber_a, axis_name)

    state0 = _BAState(
        problem=problem,
        cost=cost0,
        lam=jnp.asarray(opts.initial_lambda, dtype),
        it=jnp.int32(0),
        done=jnp.asarray(False),
    )

    def cond(s: _BAState):
        return (s.it < opts.max_iterations) & ~s.done

    def body(s: _BAState):
        cost, U, V, Wb, g_p, g_x, H_o, _ = build_normal_equations(
            s.problem, opts.huber_a, axis_name
        )
        dp, dx = schur_solve(U, V, Wb, g_p, g_x, s.lam, opts, axis_name,
                             H_pose=H_o, pose_mask=s.problem.pose_mask)
        cand = _apply_step(s.problem, dp, dx)
        cand_cost = evaluate_cost(cand, opts.huber_a, axis_name)
        ok = (cand_cost < s.cost) & jnp.all(jnp.isfinite(dp)) & jnp.all(
            jnp.isfinite(dx)
        )
        rel_decrease = (s.cost - cand_cost) / jnp.maximum(s.cost, 1e-24)
        new_problem = jax.tree.map(
            lambda a, b: jnp.where(ok, a, b), cand, s.problem
        )
        new_lam = jnp.where(
            ok,
            jnp.maximum(s.lam * opts.lambda_down, opts.min_lambda),
            jnp.minimum(s.lam * opts.lambda_up, opts.max_lambda),
        )
        done = ok & (rel_decrease < opts.min_rel_decrease)
        return _BAState(
            problem=new_problem,
            cost=jnp.where(ok, cand_cost, s.cost),
            lam=new_lam,
            it=s.it + 1,
            done=done,
        )

    final = lax.while_loop(cond, body, state0)
    return final.problem, BASummary(
        initial_cost=cost0, final_cost=final.cost, num_iterations=final.it
    )


run_bundle_adjustment_jit = jax.jit(run_bundle_adjustment, static_argnums=(1, 2))
