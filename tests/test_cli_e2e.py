"""End-to-end CLI regression on an in-test eth3d-format fixture: 8-bit PNG
blurred frames + 16-bit PNG depth (/5000, the reference's dataset contract,
blur_aware_direct_tracker.cpp:373-386) + times file, driven through
``cli track`` single-frame and chunked, asserting a sane trajectory."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image as PILImage

from mba_vo_tpu import cli
from mba_vo_tpu.core.spline import spline_pose_at
from mba_vo_tpu.data.synthetic import synthesize_blurred_image, warp_image
from mba_vo_tpu.data import datasets as ds

from test_tracker import smooth_texture, world_spline

H, W, FX = 96, 128, 90.0
KVEC = np.array([FX, FX, (W - 1) / 2, (H - 1) / 2])
DEPTH, EXPOSURE, FRAME_DT = 2.0, 0.03, 0.1
N_FRAMES = 4


@pytest.fixture(scope="module")
def eth3d_fixture(tmp_path_factory):
    """frames/ (8-bit PNG), depths/ (16-bit PNG /5000), sharp/, times.txt,
    groundtruth.txt in a temp dir."""
    root = tmp_path_factory.mktemp("eth3d_seq")
    img_dir = root / "images"
    sharp_dir = root / "sharp"
    depth_dir = root / "depths"
    for d in (img_dir, sharp_dir, depth_dir):
        os.makedirs(d)

    img0 = jnp.asarray(smooth_texture(H, W, seed=13))
    traj = world_spline(num_knots=N_FRAMES + 5, dt=FRAME_DT)
    K = jnp.asarray(KVEC)

    def save_gray(path, arr):
        PILImage.fromarray(
            np.clip(np.asarray(arr), 0, 255).astype(np.uint8)
        ).save(path)

    def save_depth16(path, depth_m):
        d = np.clip(np.asarray(depth_m) * 5000.0, 0, 65535).astype(np.uint16)
        PILImage.fromarray(d, mode="I;16").save(path)

    lines = []
    gt_times, gt_t, gt_q = [], [], []
    for i in range(N_FRAMES + 1):
        cap = i * FRAME_DT
        p = spline_pose_at(traj, cap, 2)
        if i == 0:
            blurred = img0
            sharp = img0
        else:
            blurred = synthesize_blurred_image(
                img0, traj, 2, cap, EXPOSURE, 5, DEPTH, K
            )
            sharp = warp_image(img0, p.t, p.q, DEPTH, K)
        name = f"frame_{i:04d}.png"
        save_gray(img_dir / name, blurred)
        save_gray(sharp_dir / name, sharp)
        # plane z=DEPTH seen from pose p ~ frontoparallel distance (pure-ish
        # translation sequence)
        save_depth16(depth_dir / name,
                     np.full((H, W), DEPTH - float(p.t[2]), np.float32))
        lines.append(f"{name} {cap} {EXPOSURE}")
        gt_times.append(cap)
        gt_t.append(np.asarray(p.t))
        gt_q.append(np.asarray(p.q))

    (root / "times.txt").write_text("\n".join(lines) + "\n")
    ds.save_tum_trajectory(str(root / "groundtruth.txt"),
                           np.asarray(gt_times), np.asarray(gt_t),
                           np.asarray(gt_q))
    # tracker config tuned for the small low-contrast fixture (the stock
    # defaults keep the reference's loose LM stop at 1e-3 and a threshold-25
    # detector, both of which under-converge on this texture)
    (root / "config.json").write_text(json.dumps({
        "num_pyramid_levels": 2,
        "num_virtual_poses": [5, 5],
        "huber_a": 10.0,
        "min_abs_cost_decrease": 1e-6,
        "keyframe_max_flow_mag0": 1e9,
        "keyframe_max_flow_mag1": 1e9,
        "detector": {"score_threshold": 5.0, "cell_h": 12, "cell_w": 12,
                     "max_keypoints": 256},
        "dtype": "float64",
    }))
    return root


def _track(root, out_name, chunk, extra=()):
    args = [
        "track",
        "--images", str(root / "images"),
        "--sharp-images", str(root / "sharp"),
        "--depths", str(root / "depths"),
        "--dataset-type", "eth3d",
        "--times", str(root / "times.txt"),
        "--intrinsics", ",".join(str(v) for v in KVEC),
        "--output", str(root / out_name),
        "--chunk", str(chunk),
        "--config", str(root / "config.json"),
        *extra,
    ]
    assert cli.main(args) == 0
    t_est_times, est_t, _ = ds.load_tum_trajectory(str(root / out_name))
    _, ref_t, _ = ds.load_tum_trajectory(str(root / "groundtruth.txt"))
    n = min(len(est_t), len(ref_t))
    err = np.linalg.norm(est_t[:n] - ref_t[:n], axis=1)
    return float(np.sqrt(np.mean(err ** 2)))


class TestCliEth3dEndToEnd:
    def test_single_frame_dispatch(self, eth3d_fixture):
        viz_dir = eth3d_fixture / "viz"
        ate = _track(eth3d_fixture, "est_single.txt", chunk=1,
                     extra=("--viz-dir", str(viz_dir)))
        # 8-bit image quantization + 16-bit depth rounding floor the accuracy
        assert ate < 5e-3, ate
        # overlay PNGs written for the tracked (non-bootstrap) frames
        pngs = sorted(viz_dir.glob("frame_*.png"))
        assert len(pngs) >= N_FRAMES, pngs

    def test_chunked_viz_writes_per_frame_overlays(self, eth3d_fixture):
        # chunked mode must render per-frame overlays from each frame's own
        # committed knot window (tracker.frame_callback), not just the
        # final knot window of the batch
        viz_dir = eth3d_fixture / "viz_chunked"
        _track(eth3d_fixture, "est_chunk_viz.txt", chunk=3,
               extra=("--viz-dir", str(viz_dir)))
        pngs = sorted(viz_dir.glob("frame_*.png"))
        assert len(pngs) >= N_FRAMES, pngs

    def test_chunked_dispatch_matches(self, eth3d_fixture):
        ate1 = _track(eth3d_fixture, "est_single.txt", chunk=1)
        ate3 = _track(eth3d_fixture, "est_chunked.txt", chunk=3)
        assert ate3 < 5e-3, ate3
        assert abs(ate3 - ate1) < 1e-6, (ate1, ate3)

    def test_joint_window_mode(self, eth3d_fixture):
        """--joint-window tracks the sequence as chunked joint LM problems
        over a sliding knot window, through the real CLI, with the
        keyframe-switch criteria active (the fixture forces switches via
        its config) — VERDICT r03 item 5's CLI 'done' criterion."""
        ate = _track(eth3d_fixture, "est_joint.txt", chunk=3,
                     extra=("--joint-window",))
        assert ate < 5e-3, ate

    def test_joint_window_degree4(self, eth3d_fixture):
        """Degree-4 (cumulative cubic) spline end-to-end through the CLI in
        joint-window mode — the configuration that makes deg-4 well-posed
        (multi-frame coupling across shared knots)."""
        root = eth3d_fixture
        cfg = json.loads((root / "config.json").read_text())
        cfg["spline_degree"] = 4
        (root / "config_deg4.json").write_text(json.dumps(cfg))
        args = [
            "track",
            "--images", str(root / "images"),
            "--sharp-images", str(root / "sharp"),
            "--depths", str(root / "depths"),
            "--dataset-type", "eth3d",
            "--times", str(root / "times.txt"),
            "--intrinsics", ",".join(str(v) for v in KVEC),
            "--output", str(root / "est_deg4.txt"),
            "--chunk", "3", "--joint-window",
            "--config", str(root / "config_deg4.json"),
        ]
        assert cli.main(args) == 0
        _, est_t, _ = ds.load_tum_trajectory(str(root / "est_deg4.txt"))
        _, ref_t, _ = ds.load_tum_trajectory(str(root / "groundtruth.txt"))
        n = min(len(est_t), len(ref_t))
        err = np.linalg.norm(est_t[:n] - ref_t[:n], axis=1)
        ate = float(np.sqrt(np.mean(err ** 2)))
        assert ate < 5e-3, ate

    def test_backend_flag(self, eth3d_fixture):
        ate = _track(eth3d_fixture, "est_backend.txt", chunk=1,
                     extra=("--backend", "ba", "--backend-window", "4"))
        assert ate < 5e-3, ate

    def test_shard_devices_matches_single_device(self, eth3d_fixture):
        """--shard-devices 4 routes every fused dispatch's LM through the
        keypoint-sharded shard_map AND the backend's window BA through the
        landmark-sharded Schur path, on the 4-of-8-device CPU mesh; the
        trajectory must match the single-device run (r04 verdict item 2's
        'done' criterion: sharded ~= single at rtol ~1e-4; f64 CPU matches
        far tighter)."""
        root = eth3d_fixture
        be = ("--backend", "ba", "--backend-window", "4")
        _track(root, "est_ref_be.txt", chunk=3, extra=be)
        _track(root, "est_shard_be.txt", chunk=3,
               extra=be + ("--shard-devices", "4"))
        _, ref_t, _ = ds.load_tum_trajectory(str(root / "est_ref_be.txt"))
        _, sh_t, _ = ds.load_tum_trajectory(str(root / "est_shard_be.txt"))
        assert len(sh_t) == len(ref_t)
        np.testing.assert_allclose(sh_t, ref_t, atol=1e-6)

    def test_distortion_undistorts_before_tracking(self, eth3d_fixture,
                                                   tmp_path):
        """Rad-tan-distorted copies of the fixture tracked with
        --distortion must recover the same trajectory — the reference's
        Undistort.{h,cpp} remap pipeline reachable from the CLI."""
        import jax.numpy as jnp

        from mba_vo_tpu.models.camera import PinholeCamera, RadTanDistortion
        from mba_vo_tpu.ops.image import build_undistort_map, remap

        root = eth3d_fixture
        dist_coeffs = (-0.12, 0.04, 0.001, -0.002)
        dist = RadTanDistortion(*(jnp.float32(c) for c in dist_coeffs))
        clean_cam = PinholeCamera(K=jnp.asarray(KVEC, jnp.float32),
                                  height=H, width=W)
        dist_cam = clean_cam._replace(distortion=dist)
        # distorted image: for each distorted pixel, sample the clean image
        # at the pinhole projection of the (iteratively undistorted) ray
        dmap = build_undistort_map(clean_cam, dist_cam)

        droot = tmp_path / "distorted"
        for sub in ("images", "sharp"):
            os.makedirs(droot / sub)
            for p in sorted((root / sub).iterdir()):
                img = ds.load_gray_image(str(p))
                out = np.asarray(remap(jnp.asarray(img, jnp.float32), dmap))
                PILImage.fromarray(
                    np.clip(out, 0, 255).astype(np.uint8)
                ).save(droot / sub / p.name)
        # depth: plane depth is near-constant; reuse the originals
        (droot / "depths").symlink_to(root / "depths")
        for name in ("times.txt", "groundtruth.txt", "config.json"):
            (droot / name).symlink_to(root / name)

        # '=' form: a leading minus in the value would otherwise parse as
        # an option flag
        ate = _track(droot, "est_dist.txt", chunk=1,
                     extra=("--distortion=" + ",".join(map(str, dist_coeffs)),))
        # border truncation + double resampling raise the floor slightly
        assert ate < 8e-3, ate


class TestSynthToTrackContract:
    def test_synth_output_tracks_directly(self, tmp_path):
        """`cli synth` output must feed straight into `cli track`: the synth
        command writes .npy depth maps, which the eth3d depth listing must
        accept (regression: they were silently dropped and the tracker then
        crashed on a missing keyframe depth)."""
        root = tmp_path / "seq"
        rc = cli.main([
            "synth", "--output", str(root), "--num-frames", "3",
            "--height", "64", "--width", "96", "--num-samples", "7",
        ])
        assert rc == 0
        (root / "config.json").write_text(json.dumps({
            "num_pyramid_levels": 2,
            "num_virtual_poses": [5, 5],
            "huber_a": 10.0,
            "keyframe_max_flow_mag0": 1e9,
            "keyframe_max_flow_mag1": 1e9,
            "detector": {"score_threshold": 5.0, "cell_h": 12, "cell_w": 12,
                         "max_keypoints": 256},
            "dtype": "float64",
        }))
        intr = (root / "intrinsics.txt").read_text().strip()
        rc = cli.main([
            "track",
            "--images", str(root / "images"),
            "--depths", str(root / "depths"),
            "--dataset-type", "eth3d",
            "--times", str(root / "times.txt"),
            "--intrinsics", intr,
            "--output", str(root / "est.txt"),
            "--chunk", "2", "--inflight", "2",
            "--config", str(root / "config.json"),
        ])
        assert rc == 0
        _, est_t, _ = ds.load_tum_trajectory(str(root / "est.txt"))
        _, ref_t, _ = ds.load_tum_trajectory(str(root / "groundtruth.txt"))
        n = min(len(est_t), len(ref_t))
        err = np.linalg.norm(est_t[:n] - ref_t[:n], axis=1)
        ate = float(np.sqrt(np.mean(err ** 2)))
        # blurred keyframe reuse (no --sharp-images) + 8-bit quantization
        # keep this a sanity bound, not an accuracy bound
        assert ate < 2e-2, ate

    def test_synth_3d_scene_tracks(self, tmp_path):
        """`cli synth --scene 3d` emits a non-planar sequence with TRUE
        per-frame depth maps (depth varies across the map) and `cli track`
        stays accurate on it — the end-to-end non-planar benchmark path
        (VERDICT r03 missing #3 / BASELINE config 3 readiness)."""
        root = tmp_path / "seq3d"
        rc = cli.main([
            "synth", "--output", str(root), "--num-frames", "3",
            "--height", "96", "--width", "128", "--num-samples", "7",
            "--scene", "3d",
        ])
        assert rc == 0
        z0 = np.load(root / "depths" / "frame_0000.npy")
        assert z0.min() > 0.3
        assert (z0.max() - z0.min()) / z0.mean() > 0.2, (
            "3d synth must write varying depth maps")
        (root / "config.json").write_text(json.dumps({
            "num_pyramid_levels": 2,
            "num_virtual_poses": [5, 5],
            "huber_a": 10.0,
            "keyframe_max_flow_mag0": 1e9,
            "keyframe_max_flow_mag1": 1e9,
            "detector": {"score_threshold": 5.0, "cell_h": 12, "cell_w": 12,
                         "max_keypoints": 256},
            "dtype": "float64",
        }))
        intr = (root / "intrinsics.txt").read_text().strip()
        rc = cli.main([
            "track",
            "--images", str(root / "images"),
            "--depths", str(root / "depths"),
            "--dataset-type", "eth3d",
            "--times", str(root / "times.txt"),
            "--intrinsics", intr,
            "--output", str(root / "est.txt"),
            "--chunk", "2", "--inflight", "2",
            "--config", str(root / "config.json"),
        ])
        assert rc == 0
        _, est_t, _ = ds.load_tum_trajectory(str(root / "est.txt"))
        _, ref_t, _ = ds.load_tum_trajectory(str(root / "groundtruth.txt"))
        n = min(len(est_t), len(ref_t))
        err = np.linalg.norm(est_t[:n] - ref_t[:n], axis=1)
        ate = float(np.sqrt(np.mean(err ** 2)))
        # non-planar geometry + blurred-keyframe reuse + 8-bit quantization:
        # honest sanity bound (the model-error benchmark proper lives in
        # tests/test_scene3d.py with a clean keyframe)
        assert ate < 4e-2, ate

    def test_empty_depth_folder_fails_loudly(self, tmp_path, eth3d_fixture):
        empty = tmp_path / "empty_depths"
        os.makedirs(empty)
        rc = cli.main([
            "track",
            "--images", str(eth3d_fixture / "images"),
            "--depths", str(empty),
            "--dataset-type", "eth3d",
            "--times", str(eth3d_fixture / "times.txt"),
            "--intrinsics", ",".join(str(v) for v in KVEC),
            "--output", str(tmp_path / "est.txt"),
        ])
        assert rc == 2
