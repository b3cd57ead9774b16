"""Landmark-sharded bundle adjustment over a device mesh.

Keyframe poses replicate; landmarks (and their observation columns) shard
over the mesh axis. One shard_map wraps the full BA LM loop
(backend.ba.run_bundle_adjustment with axis_name): each chip builds its
landmarks' V / W / g_x blocks, the reduced camera system psum-assembles over
ICI, the [6W, 6W] solve replicates, and landmark back-substitution stays
local — distributed Schur reduction with two psums per iteration
(BASELINE.json config 5 / SURVEY.md §7 phase 6).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..backend.ba import BAOptions, BAProblem, BASummary, run_bundle_adjustment
from ..backend.map import SlidingWindowMap, pad_map
from ..core.transform import Pose

LM_AXIS = "lm"


def make_ba_mesh(n_devices=None) -> Mesh:
    import numpy as np

    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (LM_AXIS,))


def _problem_specs(has_odom: bool = False,
                   has_pose_mask: bool = False) -> BAProblem:
    from ..backend.ba import OdomPrior

    return BAProblem(
        poses=Pose(t=P(), q=P()),
        map=SlidingWindowMap(
            points=P(LM_AXIS),
            point_mask=P(LM_AXIS),
            obs_xy=P(None, LM_AXIS),
            obs_mask=P(None, LM_AXIS),
        ),
        K=P(),
        # pose-indexed extras replicate (odometry priors / window pose mask)
        odom=OdomPrior(t=P(), q=P(), weight=P()) if has_odom else None,
        pose_mask=P() if has_pose_mask else None,
    )


def shard_ba_problem(problem: BAProblem, mesh: Mesh) -> BAProblem:
    """Pad the landmark axis to the mesh size and device_put with sharding."""
    n = mesh.devices.size
    m = problem.map
    target = ((m.num_points + n - 1) // n) * n
    problem = problem._replace(map=pad_map(m, target))
    specs = _problem_specs(problem.odom is not None,
                           problem.pose_mask is not None)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), problem, specs
    )


from functools import lru_cache


@lru_cache(maxsize=64)
def _sharded_ba_fn(mesh: Mesh, opts: BAOptions, has_odom: bool,
                   has_pose_mask: bool):
    """Stable jitted shard_map per (mesh, opts) — a fresh wrapper per call
    would recompile the whole BA loop every invocation."""
    specs = _problem_specs(has_odom, has_pose_mask)
    fn = shard_map(
        partial(run_bundle_adjustment, opts=opts, axis_name=LM_AXIS),
        mesh=mesh,
        in_specs=(specs,),
        out_specs=(
            specs,
            BASummary(initial_cost=P(), final_cost=P(), num_iterations=P()),
        ),
        check_vma=False,
    )
    return jax.jit(fn)


def run_bundle_adjustment_sharded(
    problem: BAProblem, opts: BAOptions, mesh: Mesh
) -> Tuple[BAProblem, BASummary]:
    """Landmark-sharded BA; problem must come from shard_ba_problem."""
    return _sharded_ba_fn(
        mesh, opts, problem.odom is not None, problem.pose_mask is not None
    )(problem)
