"""On-device trust-region Levenberg-Marquardt over spline control knots.

The reference runs this loop on the host with two GPU round-trips per
iteration (knots H2D, H/g/patch-costs D2H — blur_aware_direct_tracker.cpp
call stack, SURVEY.md §3.2). Here the *entire* LM iteration — damping, dense
solve, candidate evaluation, Ceres-style non-monotonic step evaluation,
chi-square outlier re-masking, and the conditional full re-evaluation — is a
single ``lax.while_loop`` inside one jit. The host sees only the final knots
and convergence scalars.

Faithfully reproduced reference semantics (documented quirks included):
  * the damped Hessian *replaces* the carried Hessian, so consecutive
    rejected/invalid steps accumulate damping exactly like the reference's
    in-place ``mHessian.diagonal() += diagonal/radius``
    (blur_aware_direct_tracker.cpp:799-803);
  * a *valid but unsuccessful* step leaves ``abs_cost_decrease`` negative,
    which terminates the level at the next check
    (blur_aware_direct_tracker.cpp:609-636,910-924) — only model-invalid
    steps (negative predicted decrease) retry with a smaller radius;
  * on success, outliers are re-detected from the *candidate* evaluation's
    patch costs, then the full re-evaluation (with the new mask) defines the
    new evaluation cost that feeds the step evaluator
    (blur_aware_direct_tracker.cpp:896-903);
  * LM radius policy: init 1e4 in [10, 1e32]; accept divides by
    ``max(1/3, 1-(2q-1)^3)`` and resets the decrease factor to 2; reject
    divides by the doubling decrease factor
    (levenberg_marquardt_strategy.cpp:9-44);
  * step quality is the Conn-Gould-Toint non-monotonic relative decrease
    (trust_region_step_evaluator.cpp:39-126).
"""

from __future__ import annotations

import dataclasses
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.lie import quat_conjugate, quat_log, quat_multiply
from ..core.spline import SplineKnots, spline_retract_flat
from ..ops.residual import (
    Evaluation,
    TrackingLevelData,
    assemble,
    compute_rjv,
    evaluate,
    prepare_frame_layout,
    prepare_window_cache,
)


@dataclasses.dataclass(frozen=True)
class LMOptions:
    """Static solver options (hashable -> usable as a jit static argument).

    Defaults match the reference (blur_aware_direct_tracker.h:36-40,
    levenberg_marquardt_strategy.cpp:9-14).
    """

    max_iterations: int = 50
    min_step_quality: float = 0.5
    min_abs_cost_decrease: float = 1e-3
    max_consecutive_nonmonotonic_steps: int = 5
    initial_radius: float = 1e4
    min_radius: float = 10.0
    max_radius: float = 1e32
    huber_a: float = 20.0
    max_chi_square_error: float = 3.0
    solver: str = "cholesky"  # "cholesky" | "lu" | "svd"
    sampling: str = "direct"  # "direct" | "windowed" (see ops.residual)
    window: int = 32
    # Reference parity: a valid-but-rejected step TERMINATES the level
    # (blur_aware_direct_tracker.cpp:623-636 leaves abs_cost_decrease
    # negative). True = standard Ceres trust-region behavior instead:
    # shrink the radius and retry. The per-frame tracker keeps the
    # reference semantics (warm starts make rejections terminal-worthy);
    # the joint multi-frame window enables retry — a cold 4-frame window's
    # first Gauss-Newton step routinely overshoots, and terminating there
    # strands the whole chunk.
    # r05 A/B on the per-frame tracker: retry=True spun 70 iterations/frame
    # vs 3.4 at default (the coarse pyramid level's rejected step is a
    # MODEL mismatch — no radius fixes it, so retrying burns the full
    # iteration budget shrinking the radius) at equal ATE. The reference's
    # terminate-on-reject "quirk" is load-bearing; keep False per-frame.
    retry_rejected_steps: bool = False
    # Normal-equation precision (ops.residual.assemble): "highest" forces
    # full-f32 MXU passes for the H/g matmuls (XLA default is bf16 passes on
    # TPU); compensated_sum adds Kahan accumulation across residual chunks —
    # together the TPU replacement for the reference's f64 accumulators
    # (CustomType.h:6). Both are no-ops in the f64 CPU test configuration.
    precision: str = "default"  # "default" | "highest"
    compensated_sum: bool = False
    # Knot smoothness prior weight (0 = off). A single blurred frame only
    # observes the exposure-AVERAGE of the trajectory: for a cubic (deg-4)
    # segment that leaves near-gauge knot directions (endpoint knots carry
    # 1/6 basis weight), and LM drifts along the flat valley. The prior adds
    # 0.5*w*||second difference of knot translations / of relative rotation
    # tangents||^2 — a constant-velocity motion prior that pins the valley
    # without measurably biasing the constrained directions (its cost at
    # physical-motion scales is orders below the photometric floor). The
    # reference has no equivalent because it never ran deg-4 in production
    # (compute_hessian_gradients_cost_fast.cu:465-466 hard-codes deg 2).
    knot_prior_weight: float = 0.0
    # Per-frame closed-form gain/bias elimination in the residual
    # (ops.residual.affine_correct): robustness to photometric drift /
    # vignetting on real sequences — an extension the reference's pure
    # intensity model cannot express (compute_pixel_intensity.h:26-72).
    affine_brightness: bool = False
    # Hoist the current-frame patch layout + obs gather out of the LM loop
    # (ops.residual.prepare_frame_layout), evaluating every iteration
    # against the level-entry layout. The r05 profiling round measured the
    # trade ON REAL HARDWARE and the default is OFF:
    #   * the obs gather XLA scalarizes on TPU costs 35-120 us/call, so the
    #     hoist only pays when a level runs >~3 LM iterations — but the
    #     production steady state runs ~1.1 iterations/level (bench probe),
    #     where the hoist is a net LOSS (322 vs 350 fps A/B: the separated
    #     layout ops fuse worse than inside the rjv pass);
    #   * frozen layouts cost accuracy where corrections are large (joint
    #     windows at keyframe switches: ~30% ATE; f32-vs-f64 100-frame
    #     drift margin) — per-iteration re-anchoring matches the reference
    #     (compute_local_patches_xy.cu:9-50).
    # Keep ON only for iteration-heavy offline configs (cold starts, tight
    # min_abs_cost_decrease) where per-iteration gathers dominate.
    hoist_layout: bool = False


class LMSummary(NamedTuple):
    final_cost: jnp.ndarray
    num_iterations: jnp.ndarray
    outlier_mask: jnp.ndarray
    # [F, N] per-patch Huber costs at the final accepted state. Multi-frame
    # callers reduce these to PER-FRAME costs (sum over N) so a joint-window
    # chunk can localize which frame diverged instead of blaming frame 0
    # (the reference's per-frame tracker gets this for free; its per-patch
    # triplets are exactly these, blur_aware_direct_tracker.cpp:639-699)
    patch_costs: jnp.ndarray


class _EvaluatorState(NamedTuple):
    """Ceres TrustRegionStepEvaluator state (trust_region_step_evaluator.h)."""

    minimum_cost: jnp.ndarray
    current_cost: jnp.ndarray
    reference_cost: jnp.ndarray
    candidate_cost: jnp.ndarray
    acc_reference_mcc: jnp.ndarray
    acc_candidate_mcc: jnp.ndarray
    num_nonmonotonic: jnp.ndarray


def _evaluator_reset(cost: jnp.ndarray) -> _EvaluatorState:
    z = jnp.zeros_like(cost)
    return _EvaluatorState(cost, cost, cost, cost, z, z, jnp.int32(0))


def _step_quality(ev: _EvaluatorState, cost, model_cost_change):
    """Reference trust_region_step_evaluator.cpp:56-75."""
    relative = (ev.current_cost - cost) / model_cost_change
    historical = (ev.reference_cost - cost) / (
        ev.acc_reference_mcc + model_cost_change
    )
    return jnp.maximum(relative, historical)


def _step_accepted(ev: _EvaluatorState, cost, model_cost_change, max_nonmono: int):
    """Reference trust_region_step_evaluator.cpp:77-126 (Conn-Gould-Toint
    Algorithm 10.1.2, with Ceres' always-check step 3d modification)."""
    current = cost
    acc_cand = ev.acc_candidate_mcc + model_cost_change
    acc_ref = ev.acc_reference_mcc + model_cost_change

    improved = current < ev.minimum_cost
    minimum = jnp.where(improved, current, ev.minimum_cost)
    nonmono = jnp.where(improved, 0, ev.num_nonmonotonic + 1)
    worse_than_cand = current > ev.candidate_cost
    candidate = jnp.where(
        improved, current, jnp.where(worse_than_cand, current, ev.candidate_cost)
    )
    acc_cand = jnp.where(improved | worse_than_cand, 0.0, acc_cand)

    hit_limit = nonmono == max_nonmono
    reference = jnp.where(hit_limit, candidate, ev.reference_cost)
    acc_ref = jnp.where(hit_limit, acc_cand, acc_ref)

    return _EvaluatorState(
        minimum_cost=minimum,
        current_cost=current,
        reference_cost=reference,
        candidate_cost=candidate,
        acc_reference_mcc=acc_ref,
        acc_candidate_mcc=acc_cand,
        num_nonmonotonic=nonmono,
    )


def _solve(H: jnp.ndarray, g: jnp.ndarray, kind: str) -> jnp.ndarray:
    """step = -H^-1 g (reference solve_normal_equation.h:16-34 solves H x = g
    then negates)."""
    if kind == "cholesky":
        L = jnp.linalg.cholesky(H)
        x = jax.scipy.linalg.cho_solve((L, True), g)
    elif kind == "lu":
        x = jnp.linalg.solve(H, g)
    elif kind == "svd":
        x, *_ = jnp.linalg.lstsq(H, g, rcond=None)
    else:
        raise ValueError(f"unknown solver {kind!r}")
    return -x


def detect_outliers(
    patch_costs: jnp.ndarray, kp_mask: jnp.ndarray, chi_k: float,
    axis_name=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Chi-square-style outlier flags from per-patch Huber costs.

    Reference detectOutliersAndUploadToGpu
    (blur_aware_direct_tracker.cpp:639-699): statistics (mu, sigma) over
    patches with cost >= 1e-8, flag |cost - mu| > k*sigma over ALL patches.
    Generalized to multi-frame by summing each keypoint's costs over frames.
    Returns (inlier mask [N] float, num_outliers).

    With ``axis_name`` set (keypoints sharded over a mesh axis inside
    shard_map), mu/sigma are computed over the *global* keypoint set via
    psum; the returned mask is shard-local.
    """
    def allreduce(x):
        return lax.psum(x, axis_name) if axis_name is not None else x

    c = patch_costs.sum(axis=0)  # [N]
    live = ((c >= 1e-8) & (kp_mask > 0)).astype(c.dtype)
    n_live = jnp.maximum(allreduce(live.sum()), 1.0)
    mu = allreduce(jnp.sum(c * live)) / n_live
    var = allreduce(jnp.sum(live * (c - mu) ** 2)) / n_live
    thresh = chi_k * jnp.sqrt(var)
    outlier = (jnp.abs(c - mu) > thresh) & (kp_mask > 0)
    inlier_mask = jnp.where(outlier, 0.0, 1.0).astype(c.dtype)
    return inlier_mask, allreduce(outlier.sum())


def _knot_prior_residual(knots: SplineKnots) -> jnp.ndarray:
    """[(K-2)*6] constant-velocity violation: second differences of knot
    translations and of consecutive relative-rotation tangents."""
    d2t = knots.t[2:] - 2.0 * knots.t[1:-1] + knots.t[:-2]          # [K-2, 3]
    w_rel = quat_log(quat_multiply(quat_conjugate(knots.q[:-1]), knots.q[1:]))
    d2w = w_rel[1:] - w_rel[:-1]                                     # [K-2, 3]
    return jnp.concatenate([d2t.reshape(-1), d2w.reshape(-1)])


def _prior_terms(knots: SplineKnots, weight: float):
    """(cost, g [6K], H [6K,6K]) of the Gauss-Newton-linearized knot prior
    at the current knots (zero retraction)."""
    Kk = knots.num_knots
    dtype = knots.t.dtype
    zero = jnp.zeros(6 * Kk, dtype)

    def prior_of(delta):
        return _knot_prior_residual(spline_retract_flat(knots, delta))

    p0, lin = jax.linearize(prior_of, zero)
    Jp = jax.vmap(lin)(jnp.eye(6 * Kk, dtype=dtype)).T   # [P, 6K]
    cost = 0.5 * weight * jnp.sum(p0 * p0)
    g = weight * (Jp.T @ p0)
    H = weight * (Jp.T @ Jp)
    return cost, g, H


class _LMState(NamedTuple):
    knots: SplineKnots
    H: jnp.ndarray
    g: jnp.ndarray
    cost: jnp.ndarray
    radius: jnp.ndarray
    decrease_factor: jnp.ndarray
    ev: _EvaluatorState
    outlier_mask: jnp.ndarray
    num_iterations: jnp.ndarray
    abs_cost_decrease: jnp.ndarray
    patch_costs: jnp.ndarray


def optimize_level(
    knots: SplineKnots,
    data: TrackingLevelData,
    num_vir: int,
    degree: int,
    opts: LMOptions,
    axis_name=None,
    cache=None,
) -> Tuple[SplineKnots, LMSummary]:
    """Run the full LM loop for one pyramid level, entirely on device.

    Reference optimizePyramidLevel (blur_aware_direct_tracker.cpp:590-637).

    With ``axis_name`` set this runs inside shard_map with keypoints sharded
    over that mesh axis: every evaluation's H/g/cost is psum-assembled, the
    small dense solve is computed redundantly-but-identically on every shard,
    and outlier statistics are global — the multi-chip normal-equation path
    (SURVEY.md §2.5 multi-host row).
    """
    dtype = knots.t.dtype
    N = data.kp_mask.shape[0]
    mask0 = jnp.ones((N,), dtype=dtype)

    # knot smoothness prior (see LMOptions.knot_prior_weight); statically
    # disabled for <=2 knots where the second difference is empty
    use_prior = opts.knot_prior_weight > 0.0 and knots.num_knots > 2

    def prior(k: SplineKnots):
        if use_prior:
            return _prior_terms(k, opts.knot_prior_weight)
        z = jnp.zeros((), dtype)
        return z, jnp.zeros(6 * knots.num_knots, dtype), jnp.zeros(
            (6 * knots.num_knots, 6 * knots.num_knots), dtype
        )

    # windowed-sampling cache: keyframe windows are KEYFRAME-constant —
    # callers that track many frames against one keyframe pass ``cache``
    # (extracted once at keyframe processing; measured ~590 us/level/frame
    # of pure extraction otherwise, ~60% of per-level device time,
    # PROFILE_r04.json). Without a caller cache it is still hoisted out of
    # the LM while_loop below (XLA does not do that on its own).
    if cache is None and opts.sampling == "windowed":
        cache = prepare_window_cache(data, opts.window)

    # current-frame patch layout + observed intensities, hoisted per LEVEL:
    # the obs gather is a per-sample image gather XLA scalarizes on TPU
    # (~40 us/call at 512 kp — the dominant unattributed rjv time in r04);
    # the layout is sampling positions, not objective (prepare_frame_layout
    # docstring), so one level-entry computation serves every LM iteration.
    # Coarse-to-fine still re-anchors the layout 3x per frame.
    layout = None
    if (opts.sampling == "windowed" and opts.hoist_layout
            and not os.environ.get("MBA_VO_NO_LAYOUT_HOIST")):
        layout = jax.lax.stop_gradient(
            prepare_frame_layout(knots, data, num_vir, degree)
        )

    ev0 = evaluate(knots, data, num_vir, degree, opts.huber_a, mask0, True,
                   axis_name=axis_name, sampling=opts.sampling,
                   window=opts.window, precision=opts.precision,
                   compensated=opts.compensated_sum, cache=cache,
                   layout=layout, affine=opts.affine_brightness)
    cp0, gp0, Hp0 = prior(knots)

    state0 = _LMState(
        knots=knots,
        H=ev0.hessian + Hp0,
        g=ev0.gradient + gp0,
        cost=ev0.cost + cp0,
        radius=jnp.asarray(opts.initial_radius, dtype),
        decrease_factor=jnp.asarray(2.0, dtype),
        ev=_evaluator_reset(ev0.cost + cp0),
        outlier_mask=mask0,
        num_iterations=jnp.int32(0),
        abs_cost_decrease=jnp.asarray(1e10, dtype),
        patch_costs=ev0.patch_costs,
    )

    def clip_radius(r):
        return jnp.clip(r, opts.min_radius, opts.max_radius)

    def cond(s: _LMState):
        # finalizeIterationAndCheckIfMinimizerCanContinue
        # (blur_aware_direct_tracker.cpp:910-924)
        return (s.num_iterations < opts.max_iterations) & (
            s.abs_cost_decrease >= opts.min_abs_cost_decrease
        )

    def body(s: _LMState):
        # -- computeTrustRegionStep (cpp:799-831), incl. in-place damping
        H1 = s.H + jnp.diag(jnp.diag(s.H)) / s.radius
        step = _solve(H1, s.g, opts.solver)
        model_cost_change = -(s.g @ step + 0.5 * step @ (H1 @ step))
        invalid = (model_cost_change < 0) | ~jnp.all(jnp.isfinite(step))

        def invalid_branch(s: _LMState):
            # handleInvalidStep -> LM step_rejected (cpp:885-888)
            return s._replace(
                H=H1,
                radius=clip_radius(s.radius / s.decrease_factor),
                decrease_factor=s.decrease_factor * 2.0,
                num_iterations=s.num_iterations + 1,
            )

        def valid_branch(s: _LMState):
            cand = spline_retract_flat(s.knots, step)
            # ONE residual+Jacobian computation per iteration: (r, J) are
            # outlier-mask-independent, so the candidate-cost check (old
            # mask) and the accepted-state H/g refresh (new mask) are both
            # cheap re-assemblies of the same tensors. The reference re-runs
            # its full GPU pipeline for each (SURVEY.md §3.2); on TPU the
            # Jacobian is a handful of batched tangent passes, so computing
            # it speculatively costs less than a second pipeline pass.
            # Trade-off: a REJECTED step pays for a Jacobian it discards —
            # worth it because accepted steps dominate in practice; if a
            # profile ever shows a rejection-heavy regime (tiny radius, bad
            # conditioning), gate the Jacobian on a cost-only probe here.
            r, J, _valid = compute_rjv(
                cand, data, num_vir, degree, True,
                sampling=opts.sampling, window=opts.window, cache=cache,
                layout=layout, affine=opts.affine_brightness,
                axis_name=axis_name,
            )
            ev_c = assemble(r, None, data, opts.huber_a, s.outlier_mask,
                            axis_name=axis_name, precision=opts.precision,
                            compensated=opts.compensated_sum)
            cp_c, gp_c, Hp_c = prior(cand)
            cand_cost = ev_c.cost + cp_c
            quality = _step_quality(s.ev, cand_cost, model_cost_change)
            success = (quality > opts.min_step_quality) & (cand_cost < s.cost)
            acd = s.cost - cand_cost

            def accept(s: _LMState):
                # detectOutliers from candidate patch costs, then re-assembly
                # with the new mask (cpp:627-628, 896-903)
                new_mask, _ = detect_outliers(
                    ev_c.patch_costs, data.kp_mask, opts.max_chi_square_error,
                    axis_name=axis_name,
                )
                ev_f = assemble(r, J, data, opts.huber_a, new_mask,
                                axis_name=axis_name,
                                precision=opts.precision,
                                compensated=opts.compensated_sum)
                new_radius = s.radius / jnp.maximum(
                    1.0 / 3.0, 1.0 - (2.0 * quality - 1.0) ** 3
                )
                return s._replace(
                    knots=cand,
                    H=ev_f.hessian + Hp_c,
                    g=ev_f.gradient + gp_c,
                    cost=ev_f.cost + cp_c,
                    radius=clip_radius(new_radius),
                    decrease_factor=jnp.asarray(2.0, dtype),
                    ev=_step_accepted(
                        s.ev, ev_f.cost + cp_c, model_cost_change,
                        opts.max_consecutive_nonmonotonic_steps,
                    ),
                    outlier_mask=new_mask,
                    num_iterations=s.num_iterations + 1,
                    abs_cost_decrease=acd,
                    patch_costs=ev_f.patch_costs,
                )

            def reject(s: _LMState):
                return s._replace(
                    H=H1,
                    radius=clip_radius(s.radius / s.decrease_factor),
                    decrease_factor=s.decrease_factor * 2.0,
                    num_iterations=s.num_iterations + 1,
                    # reference: a rejected step's (negative) decrease ends
                    # the level; retry mode keeps looping with the smaller
                    # radius (see LMOptions.retry_rejected_steps)
                    abs_cost_decrease=(
                        s.abs_cost_decrease
                        if opts.retry_rejected_steps else acd
                    ),
                )

            return lax.cond(success, accept, reject, s)

        return lax.cond(invalid, invalid_branch, valid_branch, s)

    final = lax.while_loop(cond, body, state0)
    return final.knots, LMSummary(
        final_cost=final.cost,
        num_iterations=final.num_iterations,
        outlier_mask=final.outlier_mask,
        patch_costs=final.patch_costs,
    )


optimize_level_jit = jax.jit(
    optimize_level, static_argnums=(2, 3, 4, 5)
)
