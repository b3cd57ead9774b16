"""Profiling, checkpointing, evaluation metrics, and visualization."""

from .profiling import StageTimer, profile_trace
from .checkpoint import save_tracker_state, load_tracker_state
from .metrics import ate_rmse, align_trajectories_se3
