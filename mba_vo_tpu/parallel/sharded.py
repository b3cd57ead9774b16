"""Keypoint-sharded LM optimization over a device mesh.

One ``shard_map`` wraps the *entire* on-device LM loop
(``solver.lm.optimize_level``): each chip evaluates residual/Jacobian blocks
for its keypoint shard; H [6K,6K], g [6K], cost, and outlier statistics are
psum-assembled over the mesh axis; the tiny dense solve runs redundantly on
every chip so the trajectory state stays replicated with zero extra
communication. Collectives ride ICI; the host is not involved at all — this
is the TPU-native replacement for the reference's per-iteration host
round-trips (SURVEY.md §2.5, §3.2).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.spline import SplineKnots
from ..ops.residual import TrackingLevelData
from ..solver.lm import LMOptions, LMSummary, optimize_level
from .mesh import KP_AXIS, level_data_specs, shard_level_data


@lru_cache(maxsize=64)
def _sharded_fn(mesh: Mesh, num_vir: int, degree: int, opts: LMOptions):
    """One stable jitted shard_map per (mesh, static config) — a fresh
    wrapper per call would defeat jax's compile cache and recompile the
    whole LM loop every invocation (measured: seconds per 'step')."""
    knots_spec = SplineKnots(t=P(), q=P(), t0=P(), dt=P())
    data_spec = level_data_specs()
    out_summary_spec = LMSummary(
        final_cost=P(), num_iterations=P(), outlier_mask=P(KP_AXIS),
        patch_costs=P(None, KP_AXIS),
    )
    fn = shard_map(
        partial(
            optimize_level,
            num_vir=num_vir,
            degree=degree,
            opts=opts,
            axis_name=KP_AXIS,
        ),
        mesh=mesh,
        in_specs=(knots_spec, data_spec),
        out_specs=(knots_spec, out_summary_spec),
        check_vma=False,
    )
    return jax.jit(fn)


def optimize_level_sharded(
    knots: SplineKnots,
    data: TrackingLevelData,
    num_vir: int,
    degree: int,
    opts: LMOptions,
    mesh: Mesh,
) -> Tuple[SplineKnots, LMSummary]:
    """Keypoint-sharded optimize_level. ``data`` keypoint count must be a
    multiple of the mesh size (use parallel.mesh.shard_level_data)."""
    return _sharded_fn(mesh, num_vir, degree, opts)(knots, data)


@lru_cache(maxsize=64)
def optimize_level_shardmapped(
    mesh: Mesh, num_vir: int, degree: int, opts: LMOptions,
    with_cache: bool = True,
):
    """shard_map-wrapped optimize_level for embedding INSIDE a larger jit —
    the tracker's fused frame/chunk/joint dispatch (TrackerConfig
    .shard_devices). Unlike :func:`optimize_level_sharded` this returns the
    UNJITTED shard_map so the surrounding dispatch (pyramid build,
    pre/post-track, chunk scan) stays one compiled program; keypoint-indexed
    inputs — including the keyframe window cache, which is keyframe-constant
    and must NOT be re-extracted per shard call — shard over KP_AXIS, and
    the psum-assembled normal equations replicate the knot state on every
    device (the TPU-collective replacement for the reference's host
    scatter-add merge, merge_hessian_gradient_cost.cpp:39-86)."""
    knots_spec = SplineKnots(t=P(), q=P(), t0=P(), dt=P())
    data_spec = level_data_specs()
    out_summary_spec = LMSummary(
        final_cost=P(), num_iterations=P(), outlier_mask=P(KP_AXIS),
        patch_costs=P(None, KP_AXIS),
    )
    if with_cache:
        def inner(knots, data, cache):
            return optimize_level(knots, data, num_vir, degree, opts,
                                  axis_name=KP_AXIS, cache=cache)

        return shard_map(
            inner, mesh=mesh,
            in_specs=(knots_spec, data_spec, (P(KP_AXIS), P(KP_AXIS))),
            out_specs=(knots_spec, out_summary_spec),
            check_vma=False,
        )

    def inner_nc(knots, data):
        return optimize_level(knots, data, num_vir, degree, opts,
                              axis_name=KP_AXIS)

    return shard_map(
        inner_nc, mesh=mesh,
        in_specs=(knots_spec, data_spec),
        out_specs=(knots_spec, out_summary_spec),
        check_vma=False,
    )


@lru_cache(maxsize=64)
def _sharded_pod_fn(mesh: Mesh, num_vir: int, degree: int, opts: LMOptions):
    axes = tuple(mesh.axis_names)
    kp_spec = P(axes)   # shard over the flattened (host, device) axes
    data_spec = TrackingLevelData(
        img_ref=P(), grad_ref=P(), cur_imgs=P(), cap_times=P(), exp_times=P(),
        kp_xy=kp_spec, kp_z=kp_spec, kp_mask=kp_spec, pattern=P(), K=P(),
    )
    knots_spec = SplineKnots(t=P(), q=P(), t0=P(), dt=P())
    out_summary_spec = LMSummary(
        final_cost=P(), num_iterations=P(), outlier_mask=kp_spec,
        patch_costs=P(None, axes),
    )
    fn = shard_map(
        partial(
            optimize_level,
            num_vir=num_vir,
            degree=degree,
            opts=opts,
            axis_name=axes,   # lax.psum over the full (host, device) tuple
        ),
        mesh=mesh,
        in_specs=(knots_spec, data_spec),
        out_specs=(knots_spec, out_summary_spec),
        check_vma=False,
    )
    return jax.jit(fn)


def optimize_level_sharded_pod(
    knots: SplineKnots,
    data: TrackingLevelData,
    num_vir: int,
    degree: int,
    opts: LMOptions,
    mesh: Mesh,
) -> Tuple[SplineKnots, LMSummary]:
    """Keypoint-sharded LM over a 2-D (host, device) pod mesh.

    Keypoints shard over the FLATTENED mesh (host-major, so each host owns a
    contiguous block and the psum hierarchy rides ICI within a host before
    crossing DCN — SURVEY.md §7 phase 6); spline state and images replicate.
    ``data`` keypoint count must be a multiple of the total mesh size.
    """
    return _sharded_pod_fn(mesh, num_vir, degree, opts)(knots, data)
