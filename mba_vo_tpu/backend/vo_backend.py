"""Sliding-window VO backend: the glue between the blur-aware tracker and
the BA / pose-graph optimizers.

The reference scaffolds exactly this integration and never builds it: its
``Point3dStatic`` landmarks carry per-frame observation lists
(/root/reference/src/core/states/Point3dStatic.h:19-33) and ``MapSparse``
holds them (/root/reference/src/core/states/MapSparse.h), but nothing ever
creates a point or runs an optimizer over them. Here the full loop exists:

  on every new keyframe (the tracker calls :meth:`VOBackend.on_keyframe`):
    1. detect sparse corners + oriented-BRIEF descriptors on the sharp
       keyframe image (tracker.sparse_features — the counterpart of
       FeatureDetectorSparse.cpp:28-121);
    2. match them to the previous keyframe's features (MXU Hamming matching
       + Lowe ratio + mutual check, optionally gated by predicted-position
       radius);
    3. matched features extend existing landmarks with a new observation or
       create new ones — lifted through the keyframe depth map when one is
       available (the dataset contract the reference's tracker relies on,
       blur_aware_direct_tracker.cpp:373-386) or two-view DLT-triangulated
       (backend.geometry, reference EpipolarGeometry.h:28-45);
    4. the last ``window_size`` keyframes and their landmarks become a dense
       ``BAProblem`` (backend.map.SlidingWindowMap) and one jitted
       Schur-complement bundle adjustment refines window poses + landmarks
       (backend.ba — BASELINE.json config 4);
    5. optionally a pose-graph relaxation propagates the window's refined
       relative poses through the whole keyframe chain (backend.pose_graph),
       and the corrected latest keyframe pose feeds back into the tracker's
       global keyframe chain.

Host code here is bookkeeping only (landmark table, window ids); all
optimization runs inside the jitted BA / pose-graph solvers on device.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.lie import quat_conjugate, quat_multiply, quat_rotate
from ..core.transform import Pose
from ..tracker.detector import DetectorOptions
from ..tracker.sparse_features import (
    SparseFeatures,
    detect_sparse,
    match_descriptors,
)
from .ba import BAOptions, BAProblem, run_bundle_adjustment_jit
from .geometry import projection_matrix, triangulate_points
from .map import SlidingWindowMap
from .pose_graph import (
    PoseGraphEdge,
    PoseGraphOptions,
    optimize_pose_graph_jit,
)


@dataclasses.dataclass(frozen=True)
class BackendConfig:
    """Static backend configuration.

    window_size: keyframes in the BA window (BASELINE config 4 uses 7).
    max_landmarks: static landmark-slot count of the dense BA problem.
    min_observations: landmarks need this many window observations to enter
        BA (2 = classic two-view constraint).
    max_match_radius: predicted-reprojection gating radius in pixels for
        descriptor matches (<=0 disables gating).
    run_pose_graph: relax the full keyframe chain after each window BA.
    max_chain: pose-graph node budget (the chain is truncated to the most
        recent max_chain keyframes; older poses are final).
    """

    window_size: int = 7
    max_landmarks: int = 512
    min_observations: int = 2
    max_hamming: float = 80.0
    match_ratio: float = 0.8
    max_match_radius: float = 30.0
    min_depth: float = 1e-2
    max_depth: float = 1e3
    run_pose_graph: bool = False
    max_chain: int = 64
    ba: BAOptions = BAOptions()
    pose_graph: PoseGraphOptions = PoseGraphOptions()
    detector: DetectorOptions = DetectorOptions(
        score_threshold=40.0, cell_h=24, cell_w=24, max_keypoints=256
    )


class _Keyframe:
    """Host-side record of one keyframe in the chain."""

    __slots__ = ("pose", "features", "cap_time", "feat_landmark", "kp_np")

    def __init__(self, pose: Pose, features: SparseFeatures, cap_time: float):
        self.pose = pose                      # body/camera -> world
        self.features = features
        self.cap_time = cap_time
        n = features.kp_xy.shape[0]
        # landmark id per feature slot (-1 = none)
        self.feat_landmark = np.full((n,), -1, np.int64)
        self.kp_np = np.asarray(features.kp_xy)


class _Landmark:
    """Host-side landmark record (the Point3dStatic analogue: a 3D position
    plus (keyframe, feature) observation pairs, Point3dStatic.h:19-33)."""

    __slots__ = ("position", "obs")

    def __init__(self, position: np.ndarray):
        self.position = position              # [3] world
        self.obs: Dict[int, np.ndarray] = {}  # kf index -> [2] pixel


def _unproject(xy: np.ndarray, z: np.ndarray, K: np.ndarray) -> np.ndarray:
    """Pinhole back-projection to camera-frame points [N, 3]."""
    return np.stack(
        [
            z * (xy[:, 0] - K[2]) / K[0],
            z * (xy[:, 1] - K[3]) / K[1],
            z,
        ],
        axis=-1,
    )


def _transform_points(pose: Pose, pts_cam: np.ndarray) -> np.ndarray:
    """Camera-frame -> world via a body==camera pose."""
    q = jnp.asarray(pose.q)
    t = np.asarray(pose.t)
    return np.asarray(quat_rotate(q[None], jnp.asarray(pts_cam))) + t[None]


def _world_to_cam(pose: Pose):
    """(R_w2c [3,3], t_w2c [3]) of a camera-to-world pose."""
    q_inv = quat_conjugate(jnp.asarray(pose.q))
    eye = jnp.eye(3, dtype=jnp.asarray(pose.t).dtype)
    R = jnp.stack([quat_rotate(q_inv, eye[i]) for i in range(3)], axis=1)
    t = -quat_rotate(q_inv, jnp.asarray(pose.t))
    return R, t


class VOBackend:
    """Sliding-window landmark map + BA (+ pose graph) behind the tracker."""

    def __init__(self, config: BackendConfig, K: np.ndarray):
        self.cfg = config
        self.K = np.asarray(K, np.float64)
        self.keyframes: List[_Keyframe] = []
        self.landmarks: Dict[int, _Landmark] = {}
        self._next_lm = 0
        self.last_summary = None

    # ------------------------------------------------------------- keyframe

    def on_keyframe(
        self,
        sharp_img: np.ndarray,
        depth_map: Optional[np.ndarray],
        pose: Pose,
        cap_time: float,
    ) -> Optional[Pose]:
        """Ingest a new keyframe; returns the BA-refined pose of THIS
        keyframe (None when the window is too small to optimize)."""
        cfg = self.cfg
        img = jnp.asarray(sharp_img, jnp.float32)
        feats = detect_sparse(img, cfg.detector)
        kf = _Keyframe(pose, feats, cap_time)
        prev = self.keyframes[-1] if self.keyframes else None
        self.keyframes.append(kf)
        idx = len(self.keyframes) - 1

        if prev is not None:
            self._associate(prev, idx - 1, kf, idx, depth_map)

        self._prune_window()

        if len(self._window_ids()) >= 2:
            refined = self._run_window_ba()
            if refined is not None and cfg.run_pose_graph:
                self._run_pose_graph()
            return self.keyframes[-1].pose
        return None

    # ---------------------------------------------------------- association

    def _associate(self, prev: _Keyframe, prev_idx: int, cur: _Keyframe,
                   cur_idx: int, depth_map: Optional[np.ndarray]):
        """Match prev->cur features; extend or create landmarks."""
        cfg = self.cfg
        match_idx, _dist = match_descriptors(
            prev.features, cur.features,
            max_hamming=cfg.max_hamming, ratio=cfg.match_ratio,
        )
        match_idx = np.asarray(match_idx)

        if cfg.max_match_radius > 0:
            # gate on predicted position: project prev's landmark (or its
            # depth-lifted point) into cur; fall back to raw-pixel distance
            # (small-baseline keyframes) when no 3D estimate exists
            d = np.linalg.norm(
                prev.kp_np - np.where(
                    (match_idx >= 0)[:, None],
                    cur.kp_np[np.clip(match_idx, 0, None)],
                    prev.kp_np,
                ),
                axis=-1,
            )
            match_idx = np.where(d <= cfg.max_match_radius, match_idx, -1)

        new_a, new_b = [], []
        for a, b in enumerate(match_idx):
            if b < 0:
                continue
            lm_id = prev.feat_landmark[a]
            if lm_id >= 0:
                lm = self.landmarks[lm_id]
                lm.obs[cur_idx] = cur.kp_np[b]
                cur.feat_landmark[b] = lm_id
            else:
                new_a.append(a)
                new_b.append(int(b))

        if not new_a:
            return
        a_idx = np.asarray(new_a)
        b_idx = np.asarray(new_b)
        xy_prev = prev.kp_np[a_idx]
        xy_cur = cur.kp_np[b_idx]

        if depth_map is not None:
            # lift through the CURRENT keyframe's depth map (z-depth; the
            # reference's dataset contract provides exactly this on
            # keyframes, blur_aware_direct_tracker.cpp:373-386)
            xi = np.clip(np.round(xy_cur[:, 0]).astype(int), 0,
                         depth_map.shape[1] - 1)
            yi = np.clip(np.round(xy_cur[:, 1]).astype(int), 0,
                         depth_map.shape[0] - 1)
            z = np.asarray(depth_map)[yi, xi].astype(np.float64)
            ok = (z > self.cfg.min_depth) & (z < self.cfg.max_depth)
            pts_w = _transform_points(
                cur.pose, _unproject(xy_cur, z, self.K)
            )
        else:
            # two-view DLT triangulation from the pose estimates
            Kj = jnp.asarray(self.K)
            Rp, tp = _world_to_cam(prev.pose)
            Rc, tc = _world_to_cam(cur.pose)
            P1 = projection_matrix(Kj, Rp, tp)
            P2 = projection_matrix(Kj, Rc, tc)
            pts_w = np.asarray(
                triangulate_points(P1, P2, jnp.asarray(xy_prev),
                                   jnp.asarray(xy_cur))
            )
            # cheirality + depth sanity in the current view
            Rc_np, tc_np = np.asarray(Rc), np.asarray(tc)
            z = (pts_w @ Rc_np.T + tc_np)[:, 2]
            ok = (z > self.cfg.min_depth) & (z < self.cfg.max_depth)

        for k in range(len(a_idx)):
            if not ok[k]:
                continue
            lm = _Landmark(pts_w[k])
            lm.obs[prev_idx] = xy_prev[k]
            lm.obs[cur_idx] = xy_cur[k]
            lm_id = self._next_lm
            self._next_lm += 1
            self.landmarks[lm_id] = lm
            prev.feat_landmark[a_idx[k]] = lm_id
            cur.feat_landmark[b_idx[k]] = lm_id

    # -------------------------------------------------------------- window

    def _window_ids(self) -> List[int]:
        n = len(self.keyframes)
        return list(range(max(0, n - self.cfg.window_size), n))

    def _prune_window(self):
        """Drop landmarks with too few observations inside the window."""
        win = set(self._window_ids())
        dead = [
            lid for lid, lm in self.landmarks.items()
            if sum(1 for k in lm.obs if k in win) < self.cfg.min_observations
            and max(lm.obs) < min(win)  # fully behind the window
        ]
        for lid in dead:
            del self.landmarks[lid]

    def _build_problem(self):
        """Dense BAProblem over the window (pad to max_landmarks slots)."""
        cfg = self.cfg
        win = self._window_ids()
        Wn = cfg.window_size
        Mn = cfg.max_landmarks
        kf_of = {k: r for r, k in enumerate(win)}

        lids = [
            lid for lid, lm in self.landmarks.items()
            if sum(1 for k in lm.obs if k in kf_of) >= cfg.min_observations
        ]
        lids = lids[:Mn]
        if len(lids) < 3:
            return None, None, None

        points = np.zeros((Mn, 3))
        point_mask = np.zeros((Mn,))
        obs_xy = np.zeros((Wn, Mn, 2))
        obs_mask = np.zeros((Wn, Mn))
        for m, lid in enumerate(lids):
            lm = self.landmarks[lid]
            points[m] = lm.position
            point_mask[m] = 1.0
            for k, xy in lm.obs.items():
                if k in kf_of:
                    obs_xy[kf_of[k], m] = xy
                    obs_mask[kf_of[k], m] = 1.0

        # pad the pose axis too (window may still be filling up)
        pose_t = np.zeros((Wn, 3))
        pose_q = np.tile(np.array([0.0, 0.0, 0.0, 1.0]), (Wn, 1))
        for r, k in enumerate(win):
            pose_t[r] = np.asarray(self.keyframes[k].pose.t)
            pose_q[r] = np.asarray(self.keyframes[k].pose.q)

        problem = BAProblem(
            poses=Pose(t=jnp.asarray(pose_t), q=jnp.asarray(pose_q)),
            map=SlidingWindowMap(
                points=jnp.asarray(points),
                point_mask=jnp.asarray(point_mask),
                obs_xy=jnp.asarray(obs_xy),
                obs_mask=jnp.asarray(obs_mask),
            ),
            K=jnp.asarray(self.K),
        )
        return problem, win, lids

    def _run_window_ba(self):
        problem, win, lids = self._build_problem()
        if problem is None:
            return None
        refined, summary = run_bundle_adjustment_jit(problem, self.cfg.ba)
        self.last_summary = summary

        new_t = np.asarray(refined.poses.t)
        new_q = np.asarray(refined.poses.q)
        new_pts = np.asarray(refined.map.points)
        for r, k in enumerate(win):
            self.keyframes[k].pose = Pose(
                t=jnp.asarray(new_t[r]), q=jnp.asarray(new_q[r])
            )
        for m, lid in enumerate(lids):
            self.landmarks[lid].position = new_pts[m]
        return refined

    # ----------------------------------------------------------- pose graph

    def _run_pose_graph(self):
        """Relax the (truncated) keyframe chain: consecutive relative-pose
        edges measured from the current (BA-refined inside the window,
        odometry outside) chain. Window edges get higher information so BA's
        corrections pull the older chain along."""
        n = len(self.keyframes)
        if n < 3:
            return
        start = max(0, n - self.cfg.max_chain)
        nodes = list(range(start, n))
        win = set(self._window_ids())

        t = jnp.asarray(np.stack(
            [np.asarray(self.keyframes[k].pose.t) for k in nodes]
        ))
        q = jnp.asarray(np.stack(
            [np.asarray(self.keyframes[k].pose.q) for k in nodes]
        ))
        poses = Pose(t=t, q=q)

        ii, jj, et, eq, w = [], [], [], [], []
        for r in range(len(nodes) - 1):
            a, b = nodes[r], nodes[r + 1]
            pa, pb = self.keyframes[a].pose, self.keyframes[b].pose
            qa_inv = quat_conjugate(jnp.asarray(pa.q))
            eq.append(np.asarray(quat_multiply(qa_inv, jnp.asarray(pb.q))))
            et.append(np.asarray(quat_rotate(
                qa_inv, jnp.asarray(pb.t) - jnp.asarray(pa.t)
            )))
            ii.append(r)
            jj.append(r + 1)
            w.append(10.0 if (a in win and b in win) else 1.0)

        edges = PoseGraphEdge(
            i=jnp.asarray(np.asarray(ii), jnp.int32),
            j=jnp.asarray(np.asarray(jj), jnp.int32),
            t_ij=jnp.asarray(np.stack(et)),
            q_ij=jnp.asarray(np.stack(eq)),
            weight=jnp.asarray(np.asarray(w)),
        )
        relaxed, _cost = optimize_pose_graph_jit(
            poses, edges, self.cfg.pose_graph
        )
        rt = np.asarray(relaxed.t)
        rq = np.asarray(relaxed.q)
        for r, k in enumerate(nodes):
            self.keyframes[k].pose = Pose(
                t=jnp.asarray(rt[r]), q=jnp.asarray(rq[r])
            )
