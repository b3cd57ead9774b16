"""Pose-graph optimization over SE(3) relative-pose constraints.

New capability (SURVEY.md §7 phase 5): nodes are keyframe poses, edges carry
measured relative transforms with information weights. Residual per edge

    r_e = log( T_meas^-1 * (T_i^-1 * T_j) )  in R^6

Gauss-Newton with autodiff Jacobians over the stacked [N,6] tangent, dense
solve (pose graphs in a VO window are small), node 0 gauge-fixed, LM
damping loop fully on device.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.lie import quat_conjugate, quat_exp, quat_multiply, quat_rotate, se3_log
from ..core.transform import Pose


@dataclasses.dataclass(frozen=True)
class PoseGraphOptions:
    max_iterations: int = 30
    initial_lambda: float = 1e-6
    lambda_up: float = 4.0
    lambda_down: float = 0.5
    min_lambda: float = 1e-12
    max_lambda: float = 1e8
    min_rel_decrease: float = 1e-10


class PoseGraphEdge(NamedTuple):
    """Batched edges: i[E], j[E] node indices; measured T_ij (frame i -> j);
    weight [E] scalar information (isotropic; per-edge 6x6 info is a
    straightforward extension)."""

    i: jnp.ndarray
    j: jnp.ndarray
    t_ij: jnp.ndarray   # [E, 3]
    q_ij: jnp.ndarray   # [E, 4]
    weight: jnp.ndarray  # [E]


def edge_residuals(poses: Pose, edges: PoseGraphEdge) -> jnp.ndarray:
    """[E, 6] residuals log(T_meas^-1 (T_i^-1 T_j))."""
    ti = poses.t[edges.i]
    qi = poses.q[edges.i]
    tj = poses.t[edges.j]
    qj = poses.q[edges.j]
    qi_inv = quat_conjugate(qi)
    # T_i^-1 * T_j
    q_rel = quat_multiply(qi_inv, qj)
    t_rel = quat_rotate(qi_inv, tj - ti)
    # T_meas^-1 * T_rel
    qm_inv = quat_conjugate(edges.q_ij)
    q_err = quat_multiply(qm_inv, q_rel)
    t_err = quat_rotate(qm_inv, t_rel - edges.t_ij)
    return se3_log(t_err, q_err)


def _cost(poses: Pose, edges: PoseGraphEdge) -> jnp.ndarray:
    r = edge_residuals(poses, edges)
    return 0.5 * jnp.sum(edges.weight[:, None] * r * r) / jnp.maximum(
        edges.weight.sum(), 1e-12
    )


def _retract(poses: Pose, delta: jnp.ndarray) -> Pose:
    """delta [N, 6] with [dt; dw] layout, right-multiplicative rotation."""
    return Pose(
        t=poses.t + delta[:, :3],
        q=quat_multiply(poses.q, quat_exp(delta[:, 3:])),
    )


class _PGState(NamedTuple):
    poses: Pose
    cost: jnp.ndarray
    lam: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray


def optimize_pose_graph(
    poses: Pose, edges: PoseGraphEdge, opts: PoseGraphOptions = PoseGraphOptions()
) -> Tuple[Pose, jnp.ndarray]:
    """LM pose-graph relaxation; returns (poses, final_cost). Node 0 fixed."""
    N = poses.t.shape[0]
    dtype = poses.t.dtype
    gauge = jnp.ones((N,), dtype).at[0].set(0.0)

    def residual_of_delta(poses_, delta):
        return edge_residuals(_retract(poses_, delta * gauge[:, None]), edges)

    def build(poses_):
        z = jnp.zeros((N, 6), dtype)
        r = edge_residuals(poses_, edges)
        J = jax.jacfwd(lambda d: residual_of_delta(poses_, d))(z)  # [E,6,N,6]
        E = r.shape[0]
        Jf = J.reshape(E * 6, N * 6)
        wsqrt = jnp.sqrt(edges.weight)[:, None].repeat(6, axis=1).reshape(-1)
        Jw = Jf * wsqrt[:, None]
        rw = r.reshape(-1) * wsqrt
        H = Jw.T @ Jw
        g = Jw.T @ rw
        return H, g

    cost0 = _cost(poses, edges)
    state0 = _PGState(
        poses=poses, cost=cost0,
        lam=jnp.asarray(opts.initial_lambda, dtype),
        it=jnp.int32(0), done=jnp.asarray(False),
    )

    eyeN = jnp.eye(N * 6, dtype=dtype)
    gauge_diag = jnp.repeat(1.0 - gauge, 6)

    def cond(s):
        return (s.it < opts.max_iterations) & ~s.done

    def body(s: _PGState):
        H, g = build(s.poses)
        Hd = H + (s.lam * jnp.diag(H) + 1e-12) * eyeN + jnp.diag(gauge_diag)
        delta = -jnp.linalg.solve(Hd, g).reshape(N, 6) * gauge[:, None]
        cand = _retract(s.poses, delta)
        cand_cost = _cost(cand, edges)
        ok = (cand_cost < s.cost) & jnp.all(jnp.isfinite(delta))
        rel = (s.cost - cand_cost) / jnp.maximum(s.cost, 1e-24)
        new_poses = jax.tree.map(lambda a, b: jnp.where(ok, a, b), cand, s.poses)
        return _PGState(
            poses=new_poses,
            cost=jnp.where(ok, cand_cost, s.cost),
            lam=jnp.where(
                ok,
                jnp.maximum(s.lam * opts.lambda_down, opts.min_lambda),
                jnp.minimum(s.lam * opts.lambda_up, opts.max_lambda),
            ),
            it=s.it + 1,
            done=ok & (rel < opts.min_rel_decrease),
        )

    final = lax.while_loop(cond, body, state0)
    return final.poses, final.cost


optimize_pose_graph_jit = jax.jit(optimize_pose_graph, static_argnums=(2,))
