"""Failure detection / elastic recovery tests (utils.failure; SURVEY.md §5
failure row — the reference std::exit(0)s instead). A corrupted frame must
be rejected, the tracker state restored, and subsequent tracking must stay
accurate — in both the single-frame and chunked dispatch paths."""

import jax.numpy as jnp
import numpy as np
import pytest

from mba_vo_tpu.core import lie
from mba_vo_tpu.core.spline import spline_pose_at
from mba_vo_tpu.tracker.blur_tracker import BlurAwareTracker, TrackerConfig
from mba_vo_tpu.tracker.detector import DetectorOptions
from mba_vo_tpu.utils.failure import stats_healthy

from test_tracker import H, W, KVEC, DEPTH, EXPOSURE, generate_sequence


def _cfg(**kw):
    base = dict(
        num_pyramid_levels=2,
        num_virtual_poses=(5, 5),
        huber_a=10.0,
        min_abs_cost_decrease=1e-6,
        keyframe_max_flow_mag0=1e9,
        keyframe_max_flow_mag1=1e9,
        detector=DetectorOptions(score_threshold=5.0, cell_h=12, cell_w=12,
                                 max_keypoints=128),
        dtype="float64",
        max_sane_flow=50.0,
    )
    base.update(kw)
    return TrackerConfig(**base)


class TestStatsHealthy:
    def test_verdicts(self):
        assert stats_healthy(1.0, 0.5, 100.0) == (True, None)
        ok, reason = stats_healthy(float("nan"), 0.5, 100.0)
        assert not ok and "non-finite" in reason
        ok, reason = stats_healthy(1e9, 0.5, 100.0)
        assert not ok and "sanity" in reason
        ok, reason = stats_healthy(1.0, 0.5, 100.0, float("nan"))
        assert not ok and "LM cost" in reason


class TestSingleFrameRecovery:
    def test_corrupted_frame_rejected_and_tracking_continues(self):
        img0, traj, frames = generate_sequence(4)
        depth = np.full((H, W), DEPTH, dtype=np.float32)
        tracker = BlurAwareTracker(_cfg(), KVEC, (H, W))
        tracker.track_frame(np.asarray(img0), np.asarray(img0), 0.0,
                            EXPOSURE, depth)

        errs = []
        for k, (cap, blurred) in enumerate(frames):
            img = np.asarray(blurred)
            if k == 1:
                img = np.full_like(img, np.nan)   # sensor glitch
            est = tracker.track_frame(None, img, cap, EXPOSURE)
            if k != 1:
                p = spline_pose_at(traj, cap, 2)
                errs.append(float(jnp.linalg.norm(
                    jnp.asarray(est.t, jnp.float64) - p.t)))
        tracker.flush()

        assert len(tracker.failure_log) == 1
        ev = tracker.failure_log[0]
        assert ev.cap_time == pytest.approx(frames[1][0])
        # frames after the glitch recover to normal accuracy
        assert errs[-1] < 2e-3, errs

    def test_no_failures_on_clean_sequence(self):
        img0, traj, frames = generate_sequence(3)
        depth = np.full((H, W), DEPTH, dtype=np.float32)
        tracker = BlurAwareTracker(_cfg(), KVEC, (H, W))
        tracker.track_frame(np.asarray(img0), np.asarray(img0), 0.0,
                            EXPOSURE, depth)
        for cap, blurred in frames:
            tracker.track_frame(None, np.asarray(blurred), cap, EXPOSURE)
        tracker.flush()
        assert tracker.failure_log == []


class TestChunkedRecovery:
    def test_corrupted_frame_mid_chunk(self):
        img0, traj, frames = generate_sequence(5)
        depth = np.full((H, W), DEPTH, dtype=np.float32)
        tracker = BlurAwareTracker(_cfg(), KVEC, (H, W))

        imgs = [np.asarray(img0)] + [np.asarray(b) for _, b in frames]
        imgs[3] = np.full_like(imgs[3], np.nan)
        caps = [0.0] + [c for c, _ in frames]
        exps = [EXPOSURE] * len(imgs)
        sharps = [np.asarray(img0)] + [None] * (len(imgs) - 1)
        depths = [depth] + [None] * (len(imgs) - 1)

        poses = tracker.track_frames(imgs, caps, exps, sharp_imgs=sharps,
                                     depth_maps=depths, chunk=3)
        assert len(poses) == len(imgs)
        assert len(tracker.failure_log) == 1
        assert tracker.failure_log[0].cap_time == pytest.approx(caps[3])
        # every frame except the rejected one stays accurate
        for k in (1, 2, 4, 5):
            p = spline_pose_at(traj, caps[k], 2)
            err = float(jnp.linalg.norm(
                jnp.asarray(np.asarray(poses[k].t), jnp.float64) - p.t))
            assert err < 2e-3, (k, err)


class TestEventOrdering:
    def test_keyframe_before_failure_in_same_chunk(self):
        """A keyframe event EARLIER in a chunk must win over a failure
        later in the same chunk (the unhealthy frame then re-tracks against
        the new keyframe), mirroring the sequential per-frame order —
        regression: the failure branch used to run first and silently drop
        the keyframe."""
        img0, traj, frames = generate_sequence(5)
        depth = np.full((H, W), DEPTH, dtype=np.float32)
        # thresholds low enough that every healthy frame fires a keyframe
        cfg = _cfg(keyframe_max_flow_mag0=0.5, keyframe_max_flow_mag1=1.0,
                   keyframe_max_blur_kernel_mag=50.0)

        imgs = [np.asarray(img0)] + [np.asarray(b) for _, b in frames]
        imgs[4] = np.full_like(imgs[4], np.nan)   # failure AFTER keyframes
        caps = [0.0] + [c for c, _ in frames]
        exps = [EXPOSURE] * len(imgs)
        sharps = list(imgs)       # keyframe candidates available everywhere
        depths = [depth] * len(imgs)

        t_seq = BlurAwareTracker(cfg, KVEC, (H, W))
        seq = [
            t_seq.track_frame(sharps[i], imgs[i], caps[i], exps[i], depths[i])
            for i in range(len(imgs))
        ]
        t_seq.flush()

        t_chk = BlurAwareTracker(cfg, KVEC, (H, W))
        chk = t_chk.track_frames(imgs, caps, exps, sharp_imgs=sharps,
                                 depth_maps=depths, chunk=5)

        # both paths reject exactly the NaN frame
        assert len(t_seq.failure_log) == 1
        assert len(t_chk.failure_log) == 1
        assert t_chk.failure_log[0].cap_time == pytest.approx(caps[4])
        # and agree on every healthy frame's pose (the rejected frame's
        # emitted pose differs by design: the chunked path substitutes the
        # last good pose, the single-frame API already returned it)
        for k in range(len(imgs)):
            if k == 4:
                continue
            np.testing.assert_allclose(
                np.asarray(seq[k].t), np.asarray(chk[k].t), atol=1e-9,
                err_msg=f"frame {k}")
        # the keyframe chain advanced identically
        np.testing.assert_allclose(np.asarray(t_seq.T_keyframe.t),
                                   np.asarray(t_chk.T_keyframe.t), atol=1e-9)
