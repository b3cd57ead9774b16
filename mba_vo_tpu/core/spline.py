"""Continuous-time SE(3) B-spline trajectory (degree 2 = linear, degree 4 =
cumulative cubic), fully jittable.

TPU-first re-design of the reference spline stack
(src/core/common/{Spline.h, SplineFunctor.h}):

  * Control knots are a dense pytree ``SplineKnots(t[K,3], q[K,4], t0, dt)``
    instead of std::vectors — K is static so everything jits.
  * Pose interpolation is a pure function of the knots; Jacobians w.r.t. the
    local (right-multiplicative) knot tangents come from JAX autodiff through
    ``spline_retract`` instead of the reference's hand-derived 4x(3k)
    quaternion chain rules (SplineFunctor.h:155-365). There is deliberately
    no materialized 4x3 local-parameterization lift.
  * Degree is a static Python int argument (2 or 4), mirroring the
    reference's ``spline_deg_k in {2, 4}`` switch (Spline.h:253-269).

Interpolation math (reference SplineFunctor.h):
  degree 2:  t(u) = (1-u) t_0 + u t_1;   R(u) = R_0 exp(u log(R_0^-1 R_1))
  degree 4:  uniform cubic B-spline basis for t; cumulative form for R:
             R(u) = R_0 exp(c_1 w_01) exp(c_2 w_12) exp(c_3 w_23),
             w_ij = log(R_i^-1 R_j),
             c_1 = 5/6 + u/2 - u^2/2 + u^3/6,
             c_2 = 1/6 + u/2 + u^2/2 - u^3/3,
             c_3 = u^3/6.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .lie import quat_conjugate, quat_exp, quat_log, quat_multiply, quat_rotate
from .transform import Pose


class SplineKnots(NamedTuple):
    """SE(3) spline control knots.

    t:  [K, 3] translation knots (body->world)
    q:  [K, 4] orientation knots, xyzw (body->world)
    t0: scalar spline start time
    dt: scalar knot sampling interval
    """

    t: jnp.ndarray
    q: jnp.ndarray
    t0: jnp.ndarray
    dt: jnp.ndarray

    @property
    def num_knots(self) -> int:
        return self.t.shape[0]


def make_knots(t, q, t0, dt) -> SplineKnots:
    t = jnp.asarray(t)
    return SplineKnots(
        t=t,
        q=jnp.asarray(q, dtype=t.dtype),
        t0=jnp.asarray(t0, dtype=t.dtype),
        dt=jnp.asarray(dt, dtype=t.dtype),
    )


def identity_knots(num_knots: int, t0=0.0, dt=1.0, dtype=jnp.float32) -> SplineKnots:
    """Identity-initialized spline (reference blur_aware_direct_tracker.cpp:99-106)."""
    t = jnp.zeros((num_knots, 3), dtype=dtype)
    q = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype), (num_knots, 1))
    return SplineKnots(t, q, jnp.asarray(t0, dtype), jnp.asarray(dt, dtype))


def spline_segment_start_and_u(time, t0, dt, num_knots: int, degree: int):
    """Locate the knot segment containing ``time`` and its normalized offset.

    Reference SplineFunctor.h:13-19 (SplineSegmentStartKnotIdxAndNormalizedU),
    with the start index clamped to a valid window so jitted gathers stay in
    bounds even for boundary times.
    """
    tn = (jnp.asarray(time) - t0) / dt
    idx = jnp.floor(tn)
    idx = jnp.clip(idx, 0, num_knots - degree)
    u = tn - idx
    return idx.astype(jnp.int32), u


def _vec_basis(u: jnp.ndarray, degree: int) -> jnp.ndarray:
    """B-spline position basis weights, shape [..., degree].

    degree 2: [(1-u), u]                       (SplineFunctor.h:21-42)
    degree 4: uniform cubic B-spline basis     (SplineFunctor.h:44-94)
    """
    if degree == 2:
        return jnp.stack([1.0 - u, u], axis=-1)
    if degree == 4:
        uu = u * u
        uuu = uu * u
        one_six = 1.0 / 6.0
        c0 = one_six - 0.5 * u + 0.5 * uu - one_six * uuu
        c1 = 4.0 * one_six - uu + 0.5 * uuu
        c2 = one_six + 0.5 * u + 0.5 * uu - 0.5 * uuu
        c3 = one_six * uuu
        return jnp.stack([c0, c1, c2, c3], axis=-1)
    raise ValueError(f"spline degree must be 2 or 4, got {degree}")


def _rot_cum_basis(u: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Cumulative rotation basis weights, shape [..., degree-1].

    degree 2: [u]                                (SplineFunctor.h:155-217)
    degree 4: [c1, c2, c3] cumulative cubic      (SplineFunctor.h:219-365)
    """
    if degree == 2:
        return u[..., None]
    if degree == 4:
        uu = u * u
        uuu = uu * u
        one_six = 1.0 / 6.0
        c1 = 5.0 * one_six + 0.5 * u - 0.5 * uu + one_six * uuu
        c2 = one_six + 0.5 * u + 0.5 * uu - 2.0 * one_six * uuu
        c3 = one_six * uuu
        return jnp.stack([c1, c2, c3], axis=-1)
    raise ValueError(f"spline degree must be 2 or 4, got {degree}")


def spline_interp_t(knots_window_t: jnp.ndarray, u: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Interpolate translation from a [degree, 3] knot window at offset u."""
    w = _vec_basis(u, degree)
    return jnp.einsum("...k,...ki->...i", w, knots_window_t)


def spline_interp_q(knots_window_q: jnp.ndarray, u: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Interpolate orientation from a [degree, 4] knot window at offset u.

    Cumulative form R_0 * prod_j exp(c_j * log(R_{j-1}^-1 R_j)).
    """
    coeffs = _rot_cum_basis(u, degree)
    q = knots_window_q[..., 0, :]
    for j in range(degree - 1):
        rel = quat_multiply(
            quat_conjugate(knots_window_q[..., j, :]), knots_window_q[..., j + 1, :]
        )
        omega = quat_log(rel) * coeffs[..., j, None]
        q = quat_multiply(q, quat_exp(omega))
    return q


def _gather_window(arr: jnp.ndarray, start: jnp.ndarray, size: int) -> jnp.ndarray:
    """Dynamic [size, D] slice of knot array at traced start index."""
    return lax.dynamic_slice_in_dim(arr, start, size, axis=0)


def spline_pose_at_times(knots: SplineKnots, times: jnp.ndarray, degree: int) -> Pose:
    """Vectorized sampling at a [N]-shaped times array -> Pose with [N, ...].

    Batch-first TPU design: the per-time knot windows are selected with a
    one-hot [N, degree, K] contraction (two small matmuls) instead of N
    gathers/dynamic-slices — on TPU the gather path scalarizes and the
    launch overhead of its many tiny ops dominates the whole tracker
    (this one function was ~90% of a full objective evaluation before the
    rewrite). K is tiny (<= 16, reference blur_aware_direct_tracker.h:47)
    so the one-hot contraction is effectively free on the VPU/MXU.
    """
    dtype = knots.t.dtype
    times = jnp.asarray(times, dtype)
    idx, u = spline_segment_start_and_u(
        times, knots.t0, knots.dt, knots.num_knots, degree
    )  # idx [N] int32, u [N]
    K = knots.num_knots
    taps = idx[..., None, None] + jnp.arange(degree, dtype=jnp.int32)[:, None]
    sel = (taps == jnp.arange(K, dtype=jnp.int32)).astype(dtype)  # [N, deg, K]
    wt = jnp.einsum("...dk,ki->...di", sel, knots.t)  # [N, deg, 3]
    wq = jnp.einsum("...dk,ki->...di", sel, knots.q)  # [N, deg, 4]
    return Pose(t=spline_interp_t(wt, u, degree), q=spline_interp_q(wq, u, degree))


def spline_pose_at(knots: SplineKnots, time, degree: int) -> Pose:
    """Sample the spline pose at a scalar time (reference Spline.h:222-281)."""
    p = spline_pose_at_times(knots, jnp.asarray(time)[None], degree)
    return Pose(t=p.t[0], q=p.q[0])


def spline_retract(knots: SplineKnots, delta_t: jnp.ndarray, delta_omega: jnp.ndarray) -> SplineKnots:
    """Manifold retraction of all knots: t += dt, q <- q * exp(omega).

    This is the local parameterization the whole solver differentiates
    through (reference Spline.h:307-330 Plus_t / Plus_R).
    delta_t, delta_omega: [K, 3].
    """
    return knots._replace(
        t=knots.t + delta_t,
        q=quat_multiply(knots.q, quat_exp(delta_omega)),
    )


def spline_retract_flat(knots: SplineKnots, step: jnp.ndarray) -> SplineKnots:
    """Retract with a flat [6K] step laid out [all t knots; all omega knots],
    matching the reference's global state ordering
    (merge_hessian_gradient_cost.cpp:52-62)."""
    k = knots.num_knots
    delta_t = step[: 3 * k].reshape(k, 3).astype(knots.t.dtype)
    delta_o = step[3 * k :].reshape(k, 3).astype(knots.t.dtype)
    return spline_retract(knots, delta_t, delta_o)


def spline_transform_to(knots: SplineKnots, time, target: Pose, degree: int) -> SplineKnots:
    """Right-translate the trajectory so that pose(time) == target.

    Reference Spline.h:184-201 (TransformTo): with dT = pose(time)^-1 * target
    applied on the right of every knot.
    """
    cur = spline_pose_at(knots, time, degree)
    dq = quat_multiply(quat_conjugate(cur.q), target.q)
    dt = quat_rotate(quat_conjugate(cur.q), target.t - cur.t)
    return spline_transform_by_right(knots, Pose(t=dt, q=dq))


def spline_transform_by(knots: SplineKnots, d: Pose) -> SplineKnots:
    """Left-compose every knot with d (reference Spline.h:203-210)."""
    return knots._replace(
        t=quat_rotate(d.q[None, :], knots.t) + d.t[None, :],
        q=quat_multiply(d.q[None, :], knots.q),
    )


def spline_transform_by_right(knots: SplineKnots, d: Pose) -> SplineKnots:
    """Right-compose every knot with d (reference Spline.h:212-219):
    t_i += R_i d_t ; R_i <- R_i d_R."""
    return knots._replace(
        t=knots.t + quat_rotate(knots.q, jnp.broadcast_to(d.t, knots.t.shape)),
        q=quat_multiply(knots.q, jnp.broadcast_to(d.q, knots.q.shape)),
    )


def insert_control_knot(knots: SplineKnots, t_new: jnp.ndarray,
                        q_new: jnp.ndarray) -> SplineKnots:
    """Append one control knot at the window end.

    Reference Spline.h:146-151 (InsertControlKnot). Growing the knot count
    changes the static shape, so this is a host-level window-management
    event (keyframe boundary / window growth), not a jitted hot-loop op —
    the fixed-shape steady-state advance is :func:`slide_control_window`.
    """
    t_new = jnp.asarray(t_new, knots.t.dtype)
    q_new = jnp.asarray(q_new, knots.q.dtype)
    return knots._replace(
        t=jnp.concatenate([knots.t, t_new[None]], axis=0),
        q=jnp.concatenate([knots.q, q_new[None]], axis=0),
    )


def pop_front_control_knot(knots: SplineKnots) -> SplineKnots:
    """Drop the first control knot and advance the spline start time by one
    sampling interval (reference Spline.h:153-158 PopFrontControlKnot)."""
    return knots._replace(
        t=knots.t[1:], q=knots.q[1:], t0=knots.t0 + knots.dt
    )


def slide_control_window(knots: SplineKnots, t_new: jnp.ndarray,
                         q_new: jnp.ndarray) -> SplineKnots:
    """Pop-front + append at constant knot count, one jittable op.

    The TPU steady-state equivalent of the reference's
    PopFrontControlKnot + InsertControlKnot pair (Spline.h:146-158) when the
    window size stays fixed: shapes don't change, so it composes with
    jit / lax.scan in the multi-frame tracking loop.
    """
    return knots._replace(
        t=jnp.concatenate([knots.t[1:], jnp.asarray(t_new, knots.t.dtype)[None]], axis=0),
        q=jnp.concatenate([knots.q[1:], jnp.asarray(q_new, knots.q.dtype)[None]], axis=0),
        t0=knots.t0 + knots.dt,
    )


def extrapolate_knot(knots: SplineKnots) -> Pose:
    """Constant-velocity prediction of the knot one interval past the window
    end: the relative transform between the last two knots, re-applied on the
    right of the last knot (the initialization the reference builds from its
    neighbor-frame velocity, blur_aware_direct_tracker.cpp:120-145, expressed
    at knot granularity)."""
    t_a, q_a = knots.t[-2], knots.q[-2]
    t_b, q_b = knots.t[-1], knots.q[-1]
    dq = quat_multiply(quat_conjugate(q_a), q_b)
    dt_local = quat_rotate(quat_conjugate(q_a), t_b - t_a)
    return Pose(
        t=t_b + quat_rotate(q_b, dt_local),
        q=quat_multiply(q_b, dq),
    )


def virtual_pose_times(cap_time, exp_time, num_vir: int):
    """Exposure-window sample times for one frame, shape [num_vir].

    t_v = t_cap - tau/2 + v * tau/(V-1), v = 0..V-1
    (reference compute_virtual_camera_poses.cu:33, including its 1e-8 guard
    so V=1 degenerates to the capture start of exposure).
    """
    cap_time = jnp.asarray(cap_time)
    v = jnp.arange(num_vir, dtype=cap_time.dtype)
    return cap_time - 0.5 * exp_time + v * exp_time / (num_vir - 1 + 1e-8)
