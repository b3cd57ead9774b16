"""Multi-chip / multi-host sharding of the tracker and backend.

The reference has no distributed story (SURVEY.md §2.5): its only
"communication" is host<->device cudaMemcpy. Here, keypoints shard over a
device mesh and every normal-equation assembly is a psum over ICI — the
collective analogue of merge_hessian_gradient_cost.cpp's scatter-add.
"""

from .mesh import make_mesh, pad_keypoints, shard_level_data
from .sharded import optimize_level_sharded
from .sharded_ba import (
    make_ba_mesh,
    shard_ba_problem,
    run_bundle_adjustment_sharded,
)
