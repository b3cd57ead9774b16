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

import jax
import jax.numpy as jnp
import numpy as np


def _backend_state_pytree(backend) -> Dict[str, Any]:
    """Serializable pytree of VOBackend state (keyframe chain + landmark
    table). Feature records are flat arrays; observation dicts flatten to
    (landmark row, keyframe id, xy) triplet arrays."""
    kfs = []
    for kf in backend.keyframes:
        f = kf.features
        kfs.append({
            "pose_t": np.asarray(kf.pose.t),
            "pose_q": np.asarray(kf.pose.q),
            "odom_rel_prev": (
                np.asarray(kf.odom_rel_prev)
                if kf.odom_rel_prev is not None
                else np.full((7,), np.nan)
            ),
            "cap_time": np.asarray(kf.cap_time),
            "feat_landmark": np.asarray(kf.feat_landmark),
            "feat_z": np.asarray(kf.feat_z),
            "kp_xy": np.asarray(f.kp_xy),
            "response": np.asarray(f.response),
            "mask": np.asarray(f.mask),
            "orientation": np.asarray(f.orientation),
            "descriptors": np.asarray(f.descriptors),
        })
    lm_ids = sorted(backend.landmarks)
    positions = np.zeros((len(lm_ids), 3))
    anchors = np.zeros((len(lm_ids),), np.int64)
    n_bits = 256
    descs = np.full((len(lm_ids), n_bits), np.nan, np.float32)
    obs_rows, obs_kf, obs_xy = [], [], []
    for row, lid in enumerate(lm_ids):
        lm = backend.landmarks[lid]
        positions[row] = lm.position
        anchors[row] = lm.anchor
        if lm.desc is not None:
            descs[row] = lm.desc
        for k, xy in lm.obs.items():
            obs_rows.append(row)
            obs_kf.append(k)
            obs_xy.append(xy)
    state: Dict[str, Any] = {
        "keyframes": kfs,
        "next_lm": np.asarray(backend._next_lm),
    }
    # orbax rejects zero-size arrays — empty tables are simply absent keys
    if lm_ids:
        state["landmark_ids"] = np.asarray(lm_ids, np.int64)
        state["landmark_pos"] = positions
        state["landmark_anchor"] = anchors
        state["landmark_desc"] = descs
    if obs_rows:
        state["obs_row"] = np.asarray(obs_rows, np.int64)
        state["obs_kf"] = np.asarray(obs_kf, np.int64)
        state["obs_xy"] = np.asarray(obs_xy)
    return state


def _restore_backend_state(backend, state: Dict[str, Any]) -> None:
    from ..backend.vo_backend import _Keyframe, _Landmark
    from ..core.transform import Pose
    from ..tracker.sparse_features import SparseFeatures

    backend.keyframes = []
    for s in state["keyframes"]:
        feats = SparseFeatures(
            kp_xy=jnp.asarray(s["kp_xy"]),
            response=jnp.asarray(s["response"]),
            mask=jnp.asarray(s["mask"]),
            orientation=jnp.asarray(s["orientation"]),
            descriptors=jnp.asarray(s["descriptors"]),
        )
        rel = np.asarray(s["odom_rel_prev"])
        kf = _Keyframe(
            Pose(t=jnp.asarray(s["pose_t"]), q=jnp.asarray(s["pose_q"])),
            feats,
            float(s["cap_time"]),
            odom_rel_prev=None if np.isnan(rel[0]) else rel,
            feat_z=np.asarray(s["feat_z"]),
        )
        kf.feat_landmark = np.asarray(s["feat_landmark"]).copy()
        backend.keyframes.append(kf)

    backend.landmarks = {}
    lm_ids = np.asarray(state.get("landmark_ids", np.zeros((0,), np.int64)))
    if lm_ids.size:
        pos = np.asarray(state["landmark_pos"])
        anchor = np.asarray(state["landmark_anchor"])
        descs = state.get("landmark_desc")
        for row, lid in enumerate(lm_ids):
            desc = None
            if descs is not None and np.isfinite(descs[row][0]):
                desc = np.asarray(descs[row])
            backend.landmarks[int(lid)] = _Landmark(
                pos[row], int(anchor[row]), desc=desc
            )
    if "obs_row" in state and state["obs_row"] is not None:
        rows = np.asarray(state["obs_row"])
        kfs = np.asarray(state["obs_kf"])
        xys = np.asarray(state["obs_xy"])
        for r, k, xy in zip(rows, kfs, xys):
            backend.landmarks[int(lm_ids[r])].obs[int(k)] = xy
    backend._next_lm = int(state["next_lm"])


def _tracker_state_pytree(tracker) -> Dict[str, Any]:
    joint = getattr(tracker, "_joint_knots", None)
    return {
        "knots": {
            "t": tracker.knots.t,
            "q": tracker.knots.q,
            "t0": tracker.knots.t0,
            "dt": tracker.knots.dt,
        }
        if tracker.knots is not None
        else {},
        # joint-window mode state: without this a --joint-window --resume
        # run restarts from a fresh identity window mid-sequence, losing the
        # pose relative to the keyframe (trajectory discontinuity). The
        # host-side creation dt (_joint_dt) rides along so the recreation
        # gate in track_frames_joint stays consistent after resume.
        "joint_knots": {
            "t": joint.t,
            "q": joint.q,
            "t0": joint.t0,
            "dt": joint.dt,
            "host_dt": np.asarray(getattr(tracker, "_joint_dt", np.nan),
                                  np.float64),
        }
        if joint is not None
        else {},
        # wincache is derived data (recomputed at load from img/grad/kp_xy)
        "keyframe_levels": [
            {k: v for k, v in lvl.items() if k != "wincache"}
            for lvl in tracker.keyframe_levels
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
    """Write the tracker's resumable state with orbax — including the
    attached VOBackend's keyframe chain + landmark map when one is wired
    (a resumed --backend run must not silently continue map-less)."""
    import orbax.checkpoint as ocp

    state = _tracker_state_pytree(tracker)
    if tracker.backend is not None:
        state["backend"] = _backend_state_pytree(tracker.backend)
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, state, force=True)


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
    jk = state.get("joint_knots")  # absent in pre-r05 checkpoints
    if jk:
        tracker._joint_knots = SplineKnots(
            t=jnp.asarray(jk["t"]),
            q=jnp.asarray(jk["q"]),
            t0=jnp.asarray(jk["t0"]),
            dt=jnp.asarray(jk["dt"]),
        )
        host_dt = float(jk["host_dt"])
        tracker._joint_dt = host_dt if np.isfinite(host_dt) else None
    tracker.keyframe_levels = [
        {k: jnp.asarray(v) for k, v in lvl.items()}
        for lvl in state["keyframe_levels"]
    ]
    # rebuild the derived keyframe window caches (not serialized)
    from ..ops.window_sampling import extract_windows, stack_image_channels

    for lvl in tracker.keyframe_levels:
        if tracker.cfg.sampling == "windowed":
            chans = stack_image_channels(lvl["img"], lvl["grad"])
            wins, starts = extract_windows(
                chans, lvl["kp_xy"], tracker.cfg.sampling_window
            )
            lvl["wincache"] = (jax.lax.stop_gradient(wins), starts)
        else:
            lvl["wincache"] = None
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
    if "backend" in state and tracker.backend is not None:
        _restore_backend_state(tracker.backend, state["backend"])
