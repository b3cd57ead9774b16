"""Checkpoint / resume of tracker runtime state.

The reference has no runtime checkpointing (SURVEY.md §5); its closest
artifacts are the TUM knot loader (Spline.h:43-87) and a PLY writer. Here the
full tracker state — spline knots, keyframe pyramid store, velocities, global
keyframe chain — round-trips through an orbax checkpoint so a tracking run
can resume mid-sequence.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np


def _tracker_state_pytree(tracker) -> Dict[str, Any]:
    return {
        "knots": {
            "t": tracker.knots.t,
            "q": tracker.knots.q,
            "t0": tracker.knots.t0,
            "dt": tracker.knots.dt,
        }
        if tracker.knots is not None
        else {},
        "keyframe_levels": [
            {k: v for k, v in lvl.items()} for lvl in tracker.keyframe_levels
        ],
        "scalars": {
            "is_first_frame": np.asarray(tracker.is_first_frame),
            "prev_timestamp": np.asarray(tracker.prev_timestamp),
            "avg_kernel_length": np.asarray(tracker.avg_kernel_length),
        },
        "T_prev_b2w": {"t": tracker.T_prev_b2w.t, "q": tracker.T_prev_b2w.q},
        "T_keyframe": {"t": tracker.T_keyframe.t, "q": tracker.T_keyframe.q},
        "neigh_velocity": tracker.neigh_velocity,
    }


def save_tracker_state(tracker, path: str) -> None:
    """Write the tracker's resumable state with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, _tracker_state_pytree(tracker), force=True)


def load_tracker_state(tracker, path: str) -> None:
    """Restore state saved by save_tracker_state into an existing tracker
    (config/camera must match the saving run)."""
    import orbax.checkpoint as ocp

    from ..core.spline import SplineKnots
    from ..core.transform import Pose

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    state = ckptr.restore(path)

    if state["knots"]:
        tracker.knots = SplineKnots(
            t=jnp.asarray(state["knots"]["t"]),
            q=jnp.asarray(state["knots"]["q"]),
            t0=jnp.asarray(state["knots"]["t0"]),
            dt=jnp.asarray(state["knots"]["dt"]),
        )
    tracker.keyframe_levels = [
        {k: jnp.asarray(v) for k, v in lvl.items()}
        for lvl in state["keyframe_levels"]
    ]
    sc = state["scalars"]
    tracker.is_first_frame = bool(sc["is_first_frame"])
    tracker.prev_timestamp = float(sc["prev_timestamp"])
    tracker.avg_kernel_length = float(sc["avg_kernel_length"])
    tracker.T_prev_b2w = Pose(
        t=jnp.asarray(state["T_prev_b2w"]["t"]),
        q=jnp.asarray(state["T_prev_b2w"]["q"]),
    )
    tracker.T_keyframe = Pose(
        t=jnp.asarray(state["T_keyframe"]["t"]),
        q=jnp.asarray(state["T_keyframe"]["q"]),
    )
    tracker.neigh_velocity = jnp.asarray(state["neigh_velocity"])
