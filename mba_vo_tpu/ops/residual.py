"""Blur-aware photometric residual, Jacobian, and normal-equation assembly.

This is the TPU-native replacement for the reference's 5-stage CUDA pipeline
(spline_update_step.cpp:97-349):

  reference stage                              | here
  -------------------------------------------- | --------------------------------
  compute_virtual_camera_poses (.cu:9-110)     | spline sampling + jacfwd of the
                                               |   retraction (pose_jacobians)
  compute_local_patches_xy (.cu:9-50)          | patch_anchors (stop-gradient)
  compute_pixel_jacobian_residual (.cu:23-156) | vmapped warp+sample with
                                               |   value_and_grad over the pose,
                                               |   chained by one einsum (MXU)
  compute_patch/frame reductions (.cu:165-283) | Huber-weighted matmul J^T J
  merge_hessian_gradient_cost (.cpp:8-87)      | (none) — Jacobians are computed
                                               |   directly in global knot dims

The model: a blurred frame is the temporal average of V virtual sharp images
along the spline inside the exposure window. The residual at patch pixel x of
frame f is

    r = (1/V) sum_v I_ref(warp(T_c2r(t_v), x)) - I_f(x)

and the Gauss-Newton system over the global knot tangent layout
[all t-knots (3K); all omega-knots (3K)] (reference
merge_hessian_gradient_cost.cpp:52-62) is assembled with Huber row-scaling
(compute_hessian_gradients_cost.cu:188-206).

Failed warps contribute intensity 0 with zero gradient; patch pixels outside
the current image are masked out entirely — exactly the reference's
early-return semantics re-expressed as masks.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.lie import quat_conjugate, quat_rotate
from ..core.spline import (
    SplineKnots,
    spline_pose_at,
    spline_pose_at_times,
    spline_retract,
    virtual_pose_times,
)
from .image import in_bounds
from .warp import frontoparallel_warp, warp_and_sample
from .window_sampling import (
    extract_windows,
    sample_windows_lk,
    stack_image_channels,
)


class TrackingLevelData(NamedTuple):
    """Everything one pyramid level of the tracker needs, as dense arrays.

    img_ref:   [H, W]     sharp keyframe image at this level
    grad_ref:  [H, W, 2]  its central-difference gradient image
    cur_imgs:  [F, H, W]  blurred current frames at this level
    cap_times: [F]        capture (mid-exposure) times
    exp_times: [F]        exposure durations
    kp_xy:     [N, 2]     keypoint positions (level coordinates)
    kp_z:      [N]        keypoint depths in the keyframe
    kp_mask:   [N]        1.0 for live keypoints, 0.0 for padding
    pattern:   [P, 2]     integer patch-pixel offsets
    K:         [4]        level-scaled pinhole intrinsics fx, fy, cx, cy
    """

    img_ref: jnp.ndarray
    grad_ref: jnp.ndarray
    cur_imgs: jnp.ndarray
    cap_times: jnp.ndarray
    exp_times: jnp.ndarray
    kp_xy: jnp.ndarray
    kp_z: jnp.ndarray
    kp_mask: jnp.ndarray
    pattern: jnp.ndarray
    K: jnp.ndarray


class Evaluation(NamedTuple):
    """Result of one evaluation of the objective at a knot configuration.

    cost:        scalar Huber cost (normalized by live residual count)
    gradient:    [6K] or None
    hessian:     [6K, 6K] or None
    patch_costs: [F, N] per-patch Huber costs (outlier statistic; reference
                 detectOutliersAndUploadToGpu reads exactly these)
    """

    cost: jnp.ndarray
    gradient: Optional[jnp.ndarray]
    hessian: Optional[jnp.ndarray]
    patch_costs: jnp.ndarray


# ----------------------------------------------------------------- virtual poses


def sample_virtual_poses(
    knots: SplineKnots, cap_times: jnp.ndarray, exp_times: jnp.ndarray,
    num_vir: int, degree: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Poses T_c2r at V uniformly-spaced times inside each frame's exposure.

    Returns (t [F, V, 3], q [F, V, 4]).
    Reference compute_virtual_camera_poses.cu:9-110.
    """
    times = jax.vmap(
        lambda c, e: virtual_pose_times(c, e, num_vir)
    )(cap_times, exp_times)  # [F, V]
    p = spline_pose_at_times(knots, times.reshape(-1), degree)
    F = times.shape[0]
    return p.t.reshape(F, num_vir, 3), p.q.reshape(F, num_vir, 4)


def pose_jacobians(
    knots: SplineKnots, cap_times: jnp.ndarray, exp_times: jnp.ndarray,
    num_vir: int, degree: int,
) -> jnp.ndarray:
    """d(pose 7-vector)/d(global knot tangent) at zero retraction.

    Returns [F, V, 7, 6K] with tangent layout [3K translations; 3K rotations].
    Autodiff through the retraction replaces the reference's hand-derived
    pose-to-knot chain (compute_virtual_camera_poses.cu:51-58 +
    SplineFunctor.h Jacobians), and lands directly in *global* knot indices so
    no merge/scatter stage exists.
    """
    K = knots.num_knots
    times = jax.vmap(
        lambda c, e: virtual_pose_times(c, e, num_vir)
    )(cap_times, exp_times)
    flat_times = times.reshape(-1)
    T = flat_times.shape[0]
    z = jnp.zeros((K, 3), dtype=knots.t.dtype)

    def pose7_all(d_t, d_o):
        k = spline_retract(knots, d_t, d_o)
        p = spline_pose_at_times(k, flat_times, degree)
        return jnp.concatenate([p.t, p.q], axis=-1)  # [T, 7]

    # ONE batched jacfwd over all F*V times (the per-time jacfwd variant
    # compiles to hundreds of tiny launch-bound ops on TPU)
    Jt, Jo = jax.jacfwd(pose7_all, argnums=(0, 1))(z, z)  # [T, 7, K, 3] each
    J = jnp.concatenate(
        [Jt.reshape(T, 7, 3 * K), Jo.reshape(T, 7, 3 * K)], axis=-1
    )
    return J.reshape(times.shape[0], num_vir, 7, 6 * K)


# ----------------------------------------------------------------- patch layout


def patch_anchors(
    pose_mid_t: jnp.ndarray, pose_mid_q: jnp.ndarray,
    kp_xy: jnp.ndarray, kp_z: jnp.ndarray, K: jnp.ndarray,
) -> jnp.ndarray:
    """Project each keypoint into each current frame via the mid-exposure pose.

    pose_mid_*: [F, ...] mid-exposure T_c2r per frame. Returns [F, N, 2].
    Reference compute_local_patches_xy.cu:9-50 (pose index V//2 at :26).
    Anchors are a *layout* decision, not part of the objective — gradients are
    stopped exactly as the reference never differentiates patch centers.
    """
    P3dr = jnp.stack(
        [
            kp_z * (kp_xy[:, 0] - K[2]) / K[0],
            kp_z * (kp_xy[:, 1] - K[3]) / K[1],
            kp_z,
        ],
        axis=-1,
    )  # [N, 3]
    q_r2c = quat_conjugate(pose_mid_q)  # [F, 4]
    t_r2c = -quat_rotate(q_r2c, pose_mid_t)  # [F, 3]
    P3dc = (
        quat_rotate(q_r2c[:, None, :], P3dr[None, :, :]) + t_r2c[:, None, :]
    )  # [F, N, 3]
    xy = jnp.stack(
        [
            P3dc[..., 0] / P3dc[..., 2] * K[0] + K[2],
            P3dc[..., 1] / P3dc[..., 2] * K[1] + K[3],
        ],
        axis=-1,
    )
    return jax.lax.stop_gradient(xy)


def patch_pixel_grid(anchors: jnp.ndarray, pattern: jnp.ndarray) -> jnp.ndarray:
    """Integer pixel positions [F, N, P, 2] = floor(anchor) + pattern.

    The reference truncates double patch centers to int before adding the
    integer offsets (compute_hessian_gradients_cost.cu:67-71).
    """
    base = jnp.floor(anchors)  # [F, N, 2]
    return base[:, :, None, :] + pattern[None, None, :, :].astype(anchors.dtype)


# -------------------------------------------------------------------- residuals


def affine_correct(pred: jnp.ndarray, obs: jnp.ndarray,
                   valid: jnp.ndarray, axis_name=None) -> jnp.ndarray:
    """Per-frame affine-brightness-eliminated residual.

    Real blurred sequences carry photometric disturbance the reference's
    pure-intensity model (compute_pixel_intensity.h:26-72) cannot express:
    exposure/gain drift and vignetting. Instead of adding 2F unknowns to
    the LM state, the per-frame gain/bias pair is eliminated in CLOSED FORM
    inside every evaluation (profile likelihood): for frame f, (a, b) =
    argmin sum_valid (pred - a*obs - b)^2 via the least-squares normal
    equations, then r = pred - a*obs - b. This is mathematically the joint
    optimum over (pose, a, b) along the (a, b) directions, costs two
    reductions per frame (TPU-friendly, no solver-shape change), and
    differentiates correctly through ``pred``. Degenerate frames
    (textureless obs) fall back to (a, b) = (1, 0) — the uncorrected
    residual.

    pred, obs, valid: [F, N, P]. Returns [F, N, P] residuals (0 where
    invalid).

    ``axis_name``: set when keypoints are sharded over a mesh axis inside
    shard_map — the per-frame moment sums psum over the axis so every
    shard fits the SAME global (a, b) per frame (a shard-local fit would
    mix inconsistent photometric models into the psum-assembled normal
    equations and break sharded == single-device parity).
    """

    def allreduce(x):
        return jax.lax.psum(x, axis_name) if axis_name is not None else x

    v = valid.astype(pred.dtype)
    n = jnp.maximum(allreduce(v.sum(axis=(1, 2))), 1.0)          # [F]
    mx = allreduce((obs * v).sum(axis=(1, 2))) / n
    my = allreduce((pred * v).sum(axis=(1, 2))) / n
    dx = (obs - mx[:, None, None]) * v
    dy = (pred - my[:, None, None]) * v
    var = allreduce((dx * dx).sum(axis=(1, 2))) / n
    cov = allreduce((dx * dy).sum(axis=(1, 2))) / n
    ok = var > 1e-6
    a = jnp.where(ok, cov / jnp.where(ok, var, 1.0), 1.0)        # [F]
    b = jnp.where(ok, my - a * mx, 0.0)
    r = pred - a[:, None, None] * obs - b[:, None, None]
    return jnp.where(valid, r, 0.0)


def _current_intensity(cur_imgs: jnp.ndarray, pix: jnp.ndarray) -> jnp.ndarray:
    """Gather observed intensities at integer pixel positions [F, N, P, 2]."""
    F, H, W = cur_imgs.shape
    x = jnp.clip(pix[..., 0].astype(jnp.int32), 0, W - 1)
    y = jnp.clip(pix[..., 1].astype(jnp.int32), 0, H - 1)
    return jax.vmap(lambda img, yy, xx: img[yy, xx])(cur_imgs, y, x)


def compute_residuals(
    knots: SplineKnots, data: TrackingLevelData, num_vir: int, degree: int,
    with_jacobian: bool, affine: bool = False, axis_name=None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """Residual field r [F, N, P], its Jacobian J [F, N, P, 6K] (or None), and
    the valid-pixel mask [F, N, P].

    Reference kernel_compute_pixel_jacobian_residual
    (compute_hessian_gradients_cost.cu:23-156): both the blurred prediction
    and the Jacobian are averaged over the V virtual poses; patch pixels
    outside the current image are masked out (residual := 0).
    """
    H, W = data.img_ref.shape
    Kk = knots.num_knots

    pt, pq = sample_virtual_poses(
        knots, data.cap_times, data.exp_times, num_vir, degree
    )  # [F, V, 3], [F, V, 4]

    mid = num_vir // 2
    anchors = patch_anchors(pt[:, mid], pq[:, mid], data.kp_xy, data.kp_z, data.K)
    pix = patch_pixel_grid(anchors, data.pattern)  # [F, N, P, 2]
    valid = in_bounds(pix, H, W) & (data.kp_mask[None, :, None] > 0)

    obs = _current_intensity(data.cur_imgs, pix)  # [F, N, P]

    if with_jacobian:
        def intensity(pose7, z, xy):
            return warp_and_sample(
                data.img_ref, data.grad_ref, pose7[:3], pose7[3:], z, data.K, xy
            )

        val_grad = jax.value_and_grad(intensity, argnums=0)
        # vmap order: innermost over V (pose), then P (pixel), N (kp), F
        f_v = jax.vmap(val_grad, in_axes=(0, None, None))          # over V
        f_p = jax.vmap(f_v, in_axes=(None, None, 0))               # over P
        f_n = jax.vmap(f_p, in_axes=(None, 0, 0))                  # over N
        f_f = jax.vmap(f_n, in_axes=(0, None, 0))                  # over F
        pose7 = jnp.concatenate([pt, pq], axis=-1)                 # [F, V, 7]
        I, G = f_f(pose7, data.kp_z, pix)  # I: [F,N,P,V], G: [F,N,P,V,7]

        Jp = pose_jacobians(
            knots, data.cap_times, data.exp_times, num_vir, degree
        )  # [F, V, 7, 6K]
        # chain rule + average over virtual poses: one MXU contraction
        J = jnp.einsum("fnpvc,fvck->fnpk", G, Jp) / num_vir
        J = jnp.where(valid[..., None], J, 0.0)
    else:
        # Cost-only path still routes through sample_lk: the primal value is
        # identical to plain bilinear sampling (gradients are only touched
        # under differentiation), and this keeps jax.grad/jacfwd of the
        # cost-only evaluation on the Lucas-Kanade derivative convention.
        def intensity_plain(pose7, z, xy):
            return warp_and_sample(
                data.img_ref, data.grad_ref, pose7[:3], pose7[3:], z, data.K, xy
            )

        f_v = jax.vmap(intensity_plain, in_axes=(0, None, None))
        f_p = jax.vmap(f_v, in_axes=(None, None, 0))
        f_n = jax.vmap(f_p, in_axes=(None, 0, 0))
        f_f = jax.vmap(f_n, in_axes=(0, None, 0))
        pose7 = jnp.concatenate([pt, pq], axis=-1)
        I = f_f(pose7, data.kp_z, pix)
        J = None

    pred = I.mean(axis=-1)  # [F, N, P]
    if affine:
        r = affine_correct(pred, obs, valid, axis_name=axis_name)
    else:
        r = jnp.where(valid, pred - obs, 0.0)
    return r, J, valid


def prepare_window_cache(
    data: TrackingLevelData, window: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(windows [N,3,wh,ww], starts [N,2]) for the windowed sampling path.

    Windows are centered on the KEYFRAME keypoint positions — constant for
    a whole pyramid level — so the LM loop hoists this one call out of its
    while_loop instead of re-extracting every iteration (measured 609 us
    per call at 512 kp / VGA on chip; XLA does not loop-invariant-hoist it
    on its own). Passing the result as ``cache`` to compute_rjv/evaluate is
    bit-identical to not passing it.
    """
    chans = stack_image_channels(data.img_ref, data.grad_ref)
    windows, starts = extract_windows(chans, data.kp_xy, window)
    return jax.lax.stop_gradient(windows), starts


def prepare_frame_layout(
    knots: SplineKnots, data: TrackingLevelData, num_vir: int, degree: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(pix, valid_center, obs): the current-frame patch layout + observed
    intensities at the given knot state.

    The layout is "a decision, not part of the objective" (see
    patch_anchors): residuals compare prediction and observation at the
    SAME pixel set, so which exact set is sampled does not bias the
    optimum. That makes this hoistable out of the LM while_loop — the obs
    gather is a per-sample image gather that XLA scalarizes on TPU
    (measured ~40 us per call at the production 512x8 shape,
    PROFILE_r05), and re-running it per LM iteration was the single
    largest unattributed chunk of r04's frame time. solver.lm.optimize_level
    computes this ONCE per pyramid level (the reference recomputes patch
    centers per iteration, compute_local_patches_xy.cu:9-50 — per *level*
    re-anchoring keeps the same coarse-to-fine layout-refresh cadence at
    3 refreshes per frame).
    """
    H, W = data.img_ref.shape
    pt0, pq0 = sample_virtual_poses(
        knots, data.cap_times, data.exp_times, num_vir, degree
    )
    mid = num_vir // 2
    anchors = patch_anchors(pt0[:, mid], pq0[:, mid], data.kp_xy, data.kp_z,
                            data.K)
    pix = patch_pixel_grid(anchors, data.pattern)        # [F, N, P, 2]
    valid_center = in_bounds(pix, H, W) & (data.kp_mask[None, :, None] > 0)
    obs = _current_intensity(data.cur_imgs, pix)
    return pix, valid_center, obs


def compute_residuals_windowed(
    knots: SplineKnots, data: TrackingLevelData, num_vir: int, degree: int,
    with_jacobian: bool, window: int = 32, cache=None, layout=None,
    affine: bool = False, axis_name=None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """Gather-free variant of :func:`compute_residuals`.

    Replaces the per-sample image gather (which XLA scalarizes on TPU) with
    per-keypoint reference-image windows (contiguous dynamic-slice DMA) and
    MXU hat-weight contractions (ops.window_sampling). Samples landing
    outside a keypoint's window contribute 0 — the window radius bounds the
    representable blur-kernel length, the same quantity the tracker's
    keyframe criterion already limits. All other semantics (masking, LK
    derivative convention, averaging over virtual poses) are identical, and
    the Jacobian is produced by ``jax.linearize`` over the global knot
    tangent, reusing one primal pass for all 6K tangent seeds.

    ``layout``: optional (pix, valid_center, obs) from
    :func:`prepare_frame_layout` — pass it to evaluate several knot
    candidates against one frozen patch layout (the LM loop hoists it per
    level). None recomputes it here at ``knots``.
    """
    F = data.cur_imgs.shape[0]
    H, W = data.img_ref.shape
    N = data.kp_xy.shape[0]
    P = data.pattern.shape[0]
    Kk = knots.num_knots
    dtype = knots.t.dtype

    # layout (fixed during differentiation, like the reference)
    if layout is None:
        layout = prepare_frame_layout(knots, data, num_vir, degree)
    pix, valid_center, obs = layout

    if cache is None:
        cache = prepare_window_cache(data, window)
    windows, starts = cache                               # [N,3,wh,ww], [N,2]
    starts_f = starts.astype(dtype)

    # N-FIRST internal layout: the sampler wants [N, S]; doing the
    # F<->N transpose on the layout tensors HERE (iteration- and
    # tangent-constant) instead of on [F,N,P,V,2] inside residuals_of
    # keeps the big relayouts out of the differentiated closure, where
    # jax.linearize would replay them for every one of the 6K tangent
    # seeds (r04's unprofiled transpose suspect, PROFILE_r04 rjv gap)
    pix_nf = pix.transpose(1, 0, 2, 3)                    # [N,F,P,2]
    vc_nf = valid_center.transpose(1, 0, 2)               # [N,F,P]
    obs_nf = obs.transpose(1, 0, 2)                       # [N,F,P]

    def residuals_of(delta: jnp.ndarray) -> jnp.ndarray:
        k = spline_retract(
            knots, delta[: 3 * Kk].reshape(Kk, 3), delta[3 * Kk:].reshape(Kk, 3)
        )
        pt, pq = sample_virtual_poses(
            k, data.cap_times, data.exp_times, num_vir, degree
        )
        # warp every (n, f, p, v) patch pixel into the reference view
        ref_xy = frontoparallel_warp(
            pt[None, :, None, :, :],            # [1,F,1,V,3]
            pq[None, :, None, :, :],            # [1,F,1,V,4]
            data.kp_z[:, None, None, None],     # [N,1,1,1]
            data.K,
            pix_nf[:, :, :, None, :],           # [N,F,P,1,2]
        )                                        # [N,F,P,V,2]
        valid_s = in_bounds(ref_xy, H, W)
        loc = (ref_xy - starts_f[:, None, None, None, :]).reshape(
            N, F * P * num_vir, 2)
        vs = valid_s.reshape(N, F * P * num_vir)
        I = sample_windows_lk(windows, loc, vs.astype(dtype))  # [N, S]
        pred = I.reshape(N, F, P, num_vir).mean(axis=-1)       # [N,F,P]
        if affine:
            # per-frame gain/bias eliminated INSIDE the closure, so
            # jax.linearize differentiates the full profile likelihood
            # (psum-aware under keypoint sharding via axis_name)
            return affine_correct(pred.transpose(1, 0, 2), obs, valid_center,
                                  axis_name=axis_name)
        r_nf = jnp.where(vc_nf, pred - obs_nf, 0.0)
        return r_nf.transpose(1, 0, 2)                         # [F,N,P]

    zero = jnp.zeros(6 * Kk, dtype)
    if not with_jacobian:
        return residuals_of(zero), None, valid_center

    r, lin = jax.linearize(residuals_of, zero)
    J_cols = jax.vmap(lin)(jnp.eye(6 * Kk, dtype=dtype))  # [6K, F, N, P]
    J = jnp.moveaxis(J_cols, 0, -1)                       # [F, N, P, 6K]
    return r, J, valid_center


# --------------------------------------------------------------- normal equations


def huber_weights(r: jnp.ndarray, huber_a: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(rho, sqrt(drho/dx)) of the reference's Huber-on-half-squared form
    (compute_hessian_gradients_cost.cu:188-199):

        x = r^2 / 2
        x <= a^2:  rho = x,              w = 1
        x >  a^2:  rho = 2 a sqrt(x)-a^2, w = sqrt(a / (sqrt(x) + 1e-8))
    """
    aa = huber_a * huber_a
    x = 0.5 * r * r
    sx = jnp.sqrt(jnp.maximum(x, 0.0))
    big = x > aa
    rho = jnp.where(big, 2.0 * huber_a * sx - aa, x)
    w = jnp.where(big, jnp.sqrt(huber_a / (sx + 1e-8)), 1.0)
    return rho, w


def compute_rjv(
    knots: SplineKnots,
    data: TrackingLevelData,
    num_vir: int,
    degree: int,
    with_jacobian: bool,
    sampling: str = "direct",
    window: int = 32,
    cache=None,
    layout=None,
    affine: bool = False,
    axis_name=None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """Residuals r [F,N,P], Jacobian J [F,N,P,6K] (or None), valid mask.

    ``affine``: per-frame closed-form gain/bias elimination
    (:func:`affine_correct`) — robustness to photometric drift/vignetting
    on real sequences. The windowed path differentiates the full profile
    likelihood; the direct path pairs the corrected residual with the
    frozen-(a, b) Jacobian (block-coordinate GN — the elimination terms
    vanish at the optimum).

    Mask-independent: the outlier mask only reweights the reductions, so one
    (r, J) computation can be assembled under several masks (the LM loop
    reuses the candidate's residuals for both the accept decision under the
    old mask and the H/g refresh under the re-detected mask — the reference
    re-runs its whole GPU pipeline instead, blur_aware_direct_tracker.cpp
    :833-903, because its arena layout couples evaluation and reduction)."""
    if sampling == "windowed":
        return compute_residuals_windowed(
            knots, data, num_vir, degree, with_jacobian, window, cache=cache,
            layout=layout, affine=affine, axis_name=axis_name,
        )
    return compute_residuals(knots, data, num_vir, degree, with_jacobian,
                             affine=affine, axis_name=axis_name)


def _kahan_chunked_normal_eq(Jw: jnp.ndarray, rw: jnp.ndarray,
                             precision, chunks: int = 16):
    """(g, H) = (Jw^T rw, Jw^T Jw) with compensated cross-chunk summation.

    The residual axis M is split into ``chunks`` blocks; each block's
    partial normal equations come from one matmul, and the block partials
    combine with Kahan compensation — bounding the cross-block accumulation
    error at one f32 ulp instead of O(chunks) ulps. This is the TPU analogue
    of the reference's f64 H/g accumulators (CustomType.h:6 FLOAT=double):
    TPU has no fast f64, so the design splits precision into (a) full-f32
    matmul passes via ``precision`` (XLA's default lowers f32 einsums to
    bf16 MXU passes) and (b) compensated accumulation across blocks.
    """
    M, D = Jw.shape
    pad = (-M) % chunks
    if pad:
        Jw = jnp.concatenate([Jw, jnp.zeros((pad, D), Jw.dtype)], axis=0)
        rw = jnp.concatenate([rw, jnp.zeros((pad,), rw.dtype)])
    Jc = Jw.reshape(chunks, -1, D)
    rc = rw.reshape(chunks, -1)
    g_parts = jnp.einsum("cmk,cm->ck", Jc, rc, precision=precision)
    H_parts = jnp.einsum("cmk,cml->ckl", Jc, Jc, precision=precision)

    def kahan_step(carry, part):
        s, comp = carry
        y = part - comp
        t = s + y
        comp = (t - s) - y
        return (t, comp), None

    (g, _), _ = jax.lax.scan(
        kahan_step, (jnp.zeros((D,), Jw.dtype), jnp.zeros((D,), Jw.dtype)),
        g_parts,
    )
    (H, _), _ = jax.lax.scan(
        kahan_step,
        (jnp.zeros((D, D), Jw.dtype), jnp.zeros((D, D), Jw.dtype)),
        H_parts,
    )
    return g, H


def assemble(
    r: jnp.ndarray,
    J: Optional[jnp.ndarray],
    data: TrackingLevelData,
    huber_a: float,
    outlier_mask: jnp.ndarray,
    axis_name: Optional[str] = None,
    precision: str = "default",
    compensated: bool = False,
) -> Evaluation:
    """Huber cost (+ gradient + Gauss-Newton Hessian) from residuals.

    The reductions of the reference's patch/frame kernels + merge
    (compute_hessian_gradients_cost.cu:165-283,
    merge_hessian_gradient_cost.cpp) as two matmuls and a handful of sums.

    precision: "default" | "highest". On TPU, "highest" forces full-f32
        multiply passes for the normal-equation matmuls (XLA's default uses
        bf16 MXU passes for f32 einsums). No-op on CPU.
    compensated: Kahan-compensated cross-chunk accumulation of H/g — see
        _kahan_chunked_normal_eq. Together these are the framework's
        precision story replacing the reference's f64 accumulators
        (CustomType.h:6), validated by tests/test_precision.py.
    """
    F = data.cur_imgs.shape[0]
    P = data.pattern.shape[0]

    def allreduce(x):
        return jax.lax.psum(x, axis_name) if axis_name is not None else x

    rho, w = huber_weights(r, huber_a)

    live_kp = data.kp_mask * outlier_mask  # [N] (local shard)
    n_res = jnp.maximum(allreduce(jnp.sum(live_kp)) * F * P, 1.0)
    inv_n = 1.0 / n_res

    # per-patch costs over ALL (local) keypoints (outlier statistic)
    patch_costs = jnp.sum(rho, axis=-1) * inv_n  # [F, N]

    kp_w = live_kp[None, :, None]  # [F, N, P] broadcast
    cost = allreduce(jnp.sum(rho * kp_w)) * inv_n

    if J is None:
        return Evaluation(cost=cost, gradient=None, hessian=None,
                          patch_costs=patch_costs)

    prec = (jax.lax.Precision.HIGHEST if precision == "highest" else None)
    rw = (r * w * kp_w).reshape(-1)                      # [M]
    Jw = (J * (w * kp_w)[..., None]).reshape(rw.shape[0], -1)  # [M, 6K]
    if compensated:
        g, Hm = _kahan_chunked_normal_eq(Jw, rw, prec)
    else:
        g = jnp.einsum("mk,m->k", Jw, rw, precision=prec)
        Hm = jnp.einsum("mk,ml->kl", Jw, Jw, precision=prec)
    g = allreduce(g) * inv_n
    Hm = allreduce(Hm) * inv_n
    return Evaluation(cost=cost, gradient=g, hessian=Hm, patch_costs=patch_costs)


def evaluate(
    knots: SplineKnots,
    data: TrackingLevelData,
    num_vir: int,
    degree: int,
    huber_a: float,
    outlier_mask: jnp.ndarray,
    with_jacobian: bool = True,
    axis_name: Optional[str] = None,
    sampling: str = "direct",
    window: int = 32,
    precision: str = "default",
    compensated: bool = False,
    cache=None,
    layout=None,
    affine: bool = False,
) -> Evaluation:
    """Full objective evaluation: cost (+ gradient + Gauss-Newton Hessian).

    sampling: "direct" (per-sample gather; exact) or "windowed" (per-keypoint
    windows + MXU contractions; orders of magnitude faster on TPU, samples
    beyond ``window``/2 px of the keypoint contribute 0 — see
    compute_residuals_windowed).

    outlier_mask: [N], 1.0 = inlier. Outlier keypoints are excluded from the
    cost/H/g accumulation AND from the residual-count normalizer, but their
    patch costs are still reported (the reference computes per-patch triplets
    for all keypoints and skips outliers only in the frame reduction,
    compute_hessian_gradients_cost.cu:267-270; the normalizer is
    (num_keypoints - num_bad) * F * P, spline_update_step.cpp:116-117).

    axis_name: when set, this function runs inside a ``shard_map`` with
    keypoints sharded over that mesh axis; the global reductions (residual
    count, cost, gradient, Hessian) become ``lax.psum`` over the axis — the
    TPU-collective analogue of the reference's host-side scatter-add merge
    (merge_hessian_gradient_cost.cpp). patch_costs stay shard-local.
    """
    r, J, _valid = compute_rjv(
        knots, data, num_vir, degree, with_jacobian, sampling, window,
        cache=cache, layout=layout, affine=affine, axis_name=axis_name,
    )
    return assemble(r, J, data, huber_a, outlier_mask, axis_name,
                    precision=precision, compensated=compensated)
