"""Tests for dataset I/O, metrics, checkpointing, and viz utilities."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from mba_vo_tpu.data import datasets as ds
from mba_vo_tpu.utils import metrics
from mba_vo_tpu.utils.viz import jet_color, scalar_to_color, to_rgb, draw_points


class TestDepthIO:
    def test_ascii_depth_roundtrip(self, tmp_path):
        depth = np.random.default_rng(0).uniform(0.5, 5.0, (6, 8)).astype(np.float32)
        depth[2, 3] = 150.0  # clamped to 0 per the reference rule
        p = tmp_path / "d.txt"
        np.savetxt(p, depth.reshape(6, 8))
        out = ds.load_depth_ascii(str(p), 6, 8)
        assert out[2, 3] == 0.0
        mask = np.ones((6, 8), bool)
        mask[2, 3] = False
        np.testing.assert_allclose(out[mask], depth[mask], rtol=1e-6)

    def test_ray_to_z(self):
        K = [100.0, 100.0, 39.5, 29.5]
        H, W = 60, 80
        d_ray = np.full((H, W), 2.0, np.float32)
        z = ds.ray_depth_to_z(d_ray, K)
        # center pixel: ray ~ optical axis -> z ~ d
        assert z[30, 40] == pytest.approx(2.0, abs=1e-4)
        # corner pixel: z < d
        assert z[0, 0] < 2.0
        xn = (0 - 39.5) / 100.0
        yn = (0 - 29.5) / 100.0
        want = 2.0 / np.sqrt(1 + xn * xn + yn * yn)
        assert z[0, 0] == pytest.approx(want, rel=1e-6)

    def test_png16_depth(self, tmp_path):
        from PIL import Image as PILImage

        d = (np.random.default_rng(1).uniform(0, 3, (5, 7)) * 5000).astype(np.uint16)
        p = tmp_path / "d.png"
        PILImage.fromarray(d).save(p)
        out = ds.load_depth_png16(str(p))
        np.testing.assert_allclose(out, d.astype(np.float32) / 5000.0, rtol=1e-6)


class TestTrajectoryIO:
    def test_tum_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        times = np.arange(5) * 0.1
        t = rng.standard_normal((5, 3))
        q = rng.standard_normal((5, 4))
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        p = tmp_path / "traj.txt"
        ds.save_tum_trajectory(str(p), times, t, q)
        t2, tt2, qq2 = ds.load_tum_trajectory(str(p))
        np.testing.assert_allclose(t2, times, atol=1e-9)
        np.testing.assert_allclose(tt2, t, atol=1e-8)
        np.testing.assert_allclose(qq2, q, atol=1e-8)

    def test_knots_from_tum(self, tmp_path):
        times = np.array([0.0, 0.1, 0.2, 0.3])
        t = np.zeros((4, 3))
        q = np.tile([0, 0, 0, 1.0], (4, 1))
        p = tmp_path / "knots.txt"
        ds.save_tum_trajectory(str(p), times, t, q)
        knots = ds.knots_from_tum(str(p))
        assert knots.num_knots == 4
        assert float(knots.dt) == pytest.approx(0.1)
        assert float(knots.t0) == pytest.approx(0.1)

    def test_image_folder(self, tmp_path):
        from PIL import Image as PILImage

        for name in ["002.png", "000.png", "001.png", "notes.txt"]:
            if name.endswith(".png"):
                PILImage.fromarray(np.zeros((4, 4), np.uint8)).save(tmp_path / name)
            else:
                (tmp_path / name).write_text("x")
        files = ds.list_image_folder(str(tmp_path))
        assert [os.path.basename(f) for f in files] == ["000.png", "001.png", "002.png"]

    def test_ply_writer(self, tmp_path):
        pts = np.random.default_rng(3).standard_normal((10, 3))
        p = tmp_path / "cloud.ply"
        ds.save_ply(str(p), pts)
        text = p.read_text()
        assert "element vertex 10" in text
        assert len([l for l in text.splitlines() if not l.startswith(("p", "e", "f"))]) >= 10


class TestMetrics:
    def test_ate_zero_for_identical(self):
        t = np.random.default_rng(4).standard_normal((20, 3))
        assert metrics.ate_rmse(t, t) == pytest.approx(0.0, abs=1e-12)

    def test_ate_alignment_removes_rigid_offset(self):
        import np_ref as ref

        rng = np.random.default_rng(5)
        t = rng.standard_normal((30, 3))
        R = ref.qmat(ref.qnorm(rng.standard_normal(4)))
        offset = np.array([1.0, -2.0, 3.0])
        t_moved = (R @ t.T).T + offset
        assert metrics.ate_rmse(t_moved, t, align=True) == pytest.approx(0.0, abs=1e-9)
        assert metrics.ate_rmse(t_moved, t, align=False) > 1.0

    def test_rpe(self):
        t = np.cumsum(np.random.default_rng(6).standard_normal((10, 3)), axis=0)
        drifted = t + np.linspace(0, 1, 10)[:, None] * np.array([0.1, 0, 0])
        assert metrics.rpe_rmse(drifted, t, 1) == pytest.approx(
            0.1 / 9 * np.sqrt(1.0), rel=1e-6
        )


class TestCheckpoint:
    def test_tracker_state_roundtrip(self, tmp_path):
        from mba_vo_tpu.tracker.blur_tracker import BlurAwareTracker, TrackerConfig
        from mba_vo_tpu.tracker.detector import DetectorOptions
        from mba_vo_tpu.utils.checkpoint import save_tracker_state, load_tracker_state

        H, W = 32, 40
        cfg = TrackerConfig(
            num_pyramid_levels=2, num_virtual_poses=(3, 3),
            detector=DetectorOptions(score_threshold=1.0, cell_h=8, cell_w=8,
                                     max_keypoints=32),
            dtype="float32",
        )
        K = np.array([30.0, 30.0, 19.5, 15.5])
        tr = BlurAwareTracker(cfg, K, (H, W))
        img = np.random.default_rng(7).uniform(0, 255, (H, W))
        depth = np.full((H, W), 2.0, np.float32)
        tr.track_frame(img, img, 0.0, 0.03, depth)

        path = str(tmp_path / "ckpt")
        save_tracker_state(tr, path)

        tr2 = BlurAwareTracker(cfg, K, (H, W))
        load_tracker_state(tr2, path)
        assert not tr2.is_first_frame
        assert tr2.prev_timestamp == tr.prev_timestamp
        np.testing.assert_allclose(np.asarray(tr2.knots.t), np.asarray(tr.knots.t))
        assert len(tr2.keyframe_levels) == len(tr.keyframe_levels)
        np.testing.assert_allclose(
            np.asarray(tr2.keyframe_levels[0]["kp_xy"]),
            np.asarray(tr.keyframe_levels[0]["kp_xy"]),
        )


class TestViz:
    def test_jet_endpoints(self):
        np.testing.assert_allclose(jet_color(0.0), [0, 0, 0.5], atol=0.01)
        np.testing.assert_allclose(jet_color(1.0), [0.5, 0, 0], atol=0.01)
        np.testing.assert_allclose(jet_color(0.5), [0.5, 1.0, 0.5], atol=0.01)

    def test_draw_points(self):
        img = to_rgb(np.zeros((10, 10)))
        out = draw_points(img, np.array([[5, 5]]), color=(255, 0, 0), radius=0)
        assert tuple(out[5, 5]) == (255, 0, 0)
        assert tuple(out[0, 0]) == (0, 0, 0)


class TestBackendConfigLoading:
    def test_backend_config_from_dict_nested(self):
        from mba_vo_tpu.utils.config import backend_config_from_dict

        cfg = backend_config_from_dict({
            "window_size": 5,
            "loop_min_matches": 15,
            "detector": {"score_threshold": 2.0, "cell_h": 12, "cell_w": 12,
                         "max_keypoints": 128},
            "ba": {"max_iterations": 7},
            "pose_graph": {"max_iterations": 11},
        })
        assert cfg.window_size == 5
        assert cfg.loop_min_matches == 15
        assert cfg.detector.cell_h == 12
        assert cfg.ba.max_iterations == 7
        assert cfg.pose_graph.max_iterations == 11

    def test_backend_config_unknown_key_errors(self):
        import pytest

        from mba_vo_tpu.utils.config import backend_config_from_dict

        with pytest.raises(ValueError, match="unknown"):
            backend_config_from_dict({"not_a_knob": 1})
