"""Backend: sliding-window bundle adjustment (Schur complement) + pose graph.

New capability beyond the reference tracker — the reference only has
scaffolding for it (MapSparse / Point3dStatic observation structs,
SURVEY.md §2.2) and the build brief's north star requires it.
"""

from .geometry import (
    essential_matrix,
    fundamental_matrix,
    triangulate_points,
)
from .map import SlidingWindowMap
from .ba import BAOptions, BAProblem, run_bundle_adjustment
from .pose_graph import PoseGraphEdge, PoseGraphOptions, optimize_pose_graph
