"""Command-line driver for the blur-aware VO engine — the application layer
the reference never shipped (SURVEY.md §1 "missing layers").

Subcommands:
  track   run the tracker over an image folder + depth maps, write a TUM
          trajectory
  synth   generate a synthetic blurred benchmark sequence to disk (the
          oracle of generate_synthetic_data.cpp as a dataset)
  eval    ATE/RPE between two TUM trajectory files

Sequence format for `track`:
  --images DIR        sorted image files (png/jpg/pgm...)
  --times FILE        lines: "<image_name> <capture_time> <exposure_time>"
                      (missing file: frame index * --frame-dt, fixed exposure)
  --depths DIR        depth maps matching image order (only consulted on
                      keyframes; "unreal" ASCII or "eth3d" 16-bit PNG)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="mba_vo_tpu", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    t = sub.add_parser("track", help="run the blur-aware tracker")
    t.add_argument("--images", required=True, help="image folder")
    t.add_argument("--sharp-images",
                   help="folder of SHARP keyframe images matching --images "
                        "order; without it the blurred frame is reused as "
                        "its own keyframe (degrades the blur model)")
    t.add_argument("--depths", help="depth-map folder (keyframes)")
    t.add_argument("--dataset-type", default="eth3d",
                   choices=["unreal", "eth3d", "npy"])
    t.add_argument("--intrinsics", required=True,
                   help="fx,fy,cx,cy")
    t.add_argument("--times", help="timestamps file")
    t.add_argument("--frame-dt", type=float, default=0.05)
    t.add_argument("--exposure", type=float, default=0.02)
    t.add_argument("--config", help="tracker config JSON")
    t.add_argument("--output", default="trajectory.txt")
    t.add_argument("--checkpoint-every", type=int, default=0)
    t.add_argument("--checkpoint-dir", default="ckpt")
    t.add_argument("--resume", action="store_true")
    t.add_argument("--max-frames", type=int, default=0)
    t.add_argument("--chunk", type=int, default=1,
                   help="frames per device dispatch (>1 = chunked lax.scan "
                        "tracking; amortizes dispatch latency, ~5x faster "
                        "on remote-attached TPUs)")
    t.add_argument("--inflight", type=int, default=2,
                   help="chunk dispatches kept speculatively in flight "
                        "(cross-chunk pipelining; 1 = strictly sequential)")
    t.add_argument("--distortion",
                   help="k1,k2,p1,p2 radial-tangential coefficients of the "
                        "input images; every frame (and depth map) is "
                        "undistorted to the pinhole model before tracking "
                        "(reference Undistort.{h,cpp} cv::remap pipeline)")
    t.add_argument("--camera-model", choices=["pinhole", "unified"],
                   default="pinhole",
                   help="input camera model; 'unified' (omnidirectional, "
                        "reference CameraUnified) remaps frames to the "
                        "pinhole view given --xi")
    t.add_argument("--xi", type=float, default=0.0,
                   help="unified-model mirror parameter (with "
                        "--camera-model unified)")
    t.add_argument("--backend", choices=["none", "ba", "ba+pg"],
                   default="none",
                   help="keyframe backend: 'ba' = sliding-window Schur BA "
                        "with odometry priors refining the keyframe chain; "
                        "'ba+pg' additionally detects loop closures and "
                        "relaxes the chain with a pose graph")
    t.add_argument("--backend-window", type=int, default=7,
                   help="BA window size in keyframes (BASELINE config 4)")
    t.add_argument("--viz-dir",
                   help="write per-frame overlay PNGs (tracked keypoints + "
                        "estimated blur-kernel polylines, the reference's "
                        "drawCurrFrameKeypoints GUI output, headless)")

    s = sub.add_parser("synth", help="generate a synthetic blurred sequence")
    s.add_argument("--output", required=True, help="output directory")
    s.add_argument("--num-frames", type=int, default=20)
    s.add_argument("--height", type=int, default=480)
    s.add_argument("--width", type=int, default=640)
    s.add_argument("--exposure", type=float, default=0.03)
    s.add_argument("--frame-dt", type=float, default=0.1)
    s.add_argument("--depth", type=float, default=2.0)
    s.add_argument("--num-samples", type=int, default=31)
    s.add_argument("--seed", type=int, default=0)

    e = sub.add_parser("eval", help="ATE/RPE between two TUM trajectories")
    e.add_argument("--est", required=True)
    e.add_argument("--ref", required=True)
    e.add_argument("--with-scale", action="store_true")
    return p


def cmd_track(args) -> int:
    import jax.numpy as jnp

    from .data import datasets as ds
    from .tracker.blur_tracker import BlurAwareTracker, TrackerConfig
    from .utils.config import load_tracker_config
    from .utils.checkpoint import load_tracker_state, save_tracker_state

    K = np.array([float(x) for x in args.intrinsics.split(",")])
    if K.shape != (4,):
        print("--intrinsics must be fx,fy,cx,cy", file=sys.stderr)
        return 2

    image_paths = ds.list_image_folder(args.images)
    if not image_paths:
        print(f"no images found in {args.images}", file=sys.stderr)
        return 2
    if args.max_frames:
        image_paths = image_paths[: args.max_frames]

    if args.depths:
        if args.dataset_type == "eth3d":
            # 16-bit PNG depth maps per the reference contract
            # (blur_aware_direct_tracker.cpp:379-386), plus raw .npy dumps —
            # the `synth` command writes .npy, so synth -> track must work
            names = sorted(os.listdir(args.depths))
            depth_paths = [
                os.path.join(args.depths, f) for f in names
                if f.lower().endswith(ds.IMAGE_EXTENSIONS + (".npy",))
            ]
        else:
            depth_paths = sorted(
                os.path.join(args.depths, f) for f in os.listdir(args.depths)
            )
        if not depth_paths:
            # silently tracking depth-less (map-less keyframes) when the
            # user pointed at a depth folder would be a confusing crash later
            print(f"no depth maps found in {args.depths}", file=sys.stderr)
            return 2
    else:
        depth_paths = []
    if depth_paths and len(depth_paths) < len(image_paths):
        # a silent reuse of the last depth map would corrupt every keyframe
        # after the mismatch point — fail loudly instead
        print(
            f"depth/image count mismatch: {len(depth_paths)} depth maps for "
            f"{len(image_paths)} images",
            file=sys.stderr,
        )
        return 2

    sharp_paths = (
        ds.list_image_folder(args.sharp_images) if args.sharp_images else []
    )
    if sharp_paths and len(sharp_paths) < len(image_paths):
        print(
            f"sharp/blurred count mismatch: {len(sharp_paths)} sharp images "
            f"for {len(image_paths)} blurred frames",
            file=sys.stderr,
        )
        return 2
    if not sharp_paths:
        print(
            "warning: no --sharp-images given; keyframes will reuse the "
            "tracked (blurred) frame, which violates the sharp-keyframe "
            "model when blur is strong",
            file=sys.stderr,
        )

    # timestamps
    times = {}
    if args.times:
        with open(args.times) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 3 and not line.startswith("#"):
                    times[parts[0]] = (float(parts[1]), float(parts[2]))

    first = ds.load_gray_image(image_paths[0])
    H, W = first.shape

    undistort = None
    if args.distortion or args.camera_model != "pinhole":
        import jax
        import jax.numpy as jnp

        from .models.camera import (
            PinholeCamera,
            RadTanDistortion,
            UnifiedCamera,
        )
        from .ops.image import build_undistort_map, remap

        dist = None
        if args.distortion:
            k1, k2, p1, p2 = (float(x) for x in args.distortion.split(","))
            dist = RadTanDistortion(
                jnp.float32(k1), jnp.float32(k2), jnp.float32(p1),
                jnp.float32(p2),
            )
        Kf = jnp.asarray(K, jnp.float32)
        if args.camera_model == "unified":
            src_cam = UnifiedCamera(K=Kf, xi=jnp.float32(args.xi), height=H,
                                    width=W, distortion=dist)
        else:
            src_cam = PinholeCamera(K=Kf, height=H, width=W, distortion=dist)
        dst_cam = PinholeCamera(K=Kf, height=H, width=W)
        umap = build_undistort_map(src_cam, dst_cam)   # built ONCE
        _remap = jax.jit(lambda im: remap(jnp.asarray(im, jnp.float32), umap))
        # depth must NOT be bilinearly interpolated: blending across an
        # occlusion boundary invents 3D points that exist nowhere in the
        # scene. Rounding the map to integer source pixels makes the
        # bilinear weights exact one-hots = nearest-neighbor sampling
        _remap_nn = jax.jit(
            lambda im: remap(jnp.asarray(im, jnp.float32), jnp.round(umap))
        )

        def undistort(im):
            return np.asarray(_remap(im)) if im is not None else None

        def undistort_depth(im):
            return np.asarray(_remap_nn(im)) if im is not None else None
    else:
        undistort_depth = None

    cfg = (
        load_tracker_config(args.config) if args.config else TrackerConfig()
    )
    backend = None
    if args.backend != "none":
        from .backend.vo_backend import BackendConfig, VOBackend

        backend = VOBackend(
            BackendConfig(
                window_size=args.backend_window,
                run_pose_graph=(args.backend == "ba+pg"),
            ),
            K,
        )
    tracker = BlurAwareTracker(cfg, K, (H, W), backend=backend)
    start_idx = 0
    if args.resume and os.path.exists(
        os.path.join(args.checkpoint_dir, "meta.json")
    ):
        with open(os.path.join(args.checkpoint_dir, "meta.json")) as f:
            meta = json.load(f)
        load_tracker_state(tracker, os.path.join(args.checkpoint_dir, "state"))
        start_idx = meta["next_frame"]
        print(f"resumed at frame {start_idx}")

    def load_image(i):
        img = ds.load_gray_image(image_paths[i])
        return undistort(img) if undistort else img

    def load_depth(i):
        if not depth_paths:
            return None
        path = depth_paths[i]
        if path.lower().endswith(".npy"):
            d = np.load(path)
        elif args.dataset_type == "unreal":
            d = ds.load_depth(path, "unreal", K, H, W)
        elif args.dataset_type == "eth3d":
            d = ds.load_depth(path, "eth3d")
        else:
            d = np.load(path)
        return undistort_depth(d) if undistort_depth else d

    def load_sharp(i, blurred):
        """Keyframe-candidate sharp image: --sharp-images when given, else
        the tracked frame itself (reference dataset contract:
        blur_aware_direct_tracker.cpp:373-386 expects a sharp keyframe)."""
        if sharp_paths:
            img = ds.load_gray_image(sharp_paths[i])
            return undistort(img) if undistort else img
        return blurred

    def frame_meta(i):
        name = os.path.basename(image_paths[i])
        return times.get(name, (i * args.frame_dt, args.exposure))

    out_times, out_t, out_q = [], [], []

    def record(i, cap, pose, kernel=None):
        out_times.append(cap)
        out_t.append(np.asarray(pose.t))
        out_q.append(np.asarray(pose.q))
        if kernel is None:
            # single-frame path: the decision statistics resolve one frame
            # late (deferred keyframe pipeline), so this reads the PREVIOUS
            # frame's kernel length
            kernel = tracker.avg_kernel_length
        print(
            f"frame {i:4d} t={cap:.3f} pos="
            + np.array2string(np.asarray(pose.t), precision=4)
            + f" kernel={kernel:.2f}px"
        )
        if args.viz_dir and tracker.keyframe_levels and tracker.knots is not None:
            # keypoint + estimated blur-kernel overlay on the tracked frame
            # (reference drawCurrFrameKeypoints, with_gui hooks —
            # blur_aware_direct_tracker.cpp:436-491, headless PNGs here).
            # The live knot window only describes the LAST tracked frame: in
            # chunked mode earlier frames of a batch would be rendered from
            # a spline evaluated far outside its window — skip those instead
            # of writing extrapolated-garbage overlays
            exp_i = frame_meta(i)[1]
            t0 = float(tracker.knots.t0)
            t_end = t0 + float(tracker.knots.dt) * (
                tracker.knots.num_knots - 1
            )
            if not (t0 - 1e-9 <= cap - 0.5 * exp_i
                    and cap + 0.5 * exp_i <= t_end + 1e-9):
                return
            from .utils import viz

            os.makedirs(args.viz_dir, exist_ok=True)
            kf0 = tracker.keyframe_levels[0]
            m = np.asarray(kf0["kp_mask"]) > 0
            segs = viz.blur_kernel_segments(
                tracker.knots, np.asarray(kf0["kp_xy"])[m],
                np.asarray(kf0["kp_z"])[m], K, cap,
                frame_meta(i)[1], cfg.spline_degree,
            )
            img = viz.to_rgb(ds.load_gray_image(image_paths[i]))
            img = viz.draw_segments(img, segs, color=(64, 220, 64))
            ends = np.stack([s[len(s) // 2] for s in segs]) if segs else None
            if ends is not None:
                img = viz.draw_points(img, ends, color=(255, 64, 64))
            viz.save_png(
                os.path.join(args.viz_dir, f"frame_{i:05d}.png"), img
            )

    def checkpoint(next_frame):
        # resolve any deferred keyframe decision first: _pending is not part
        # of the serialized pytree, so an unflushed decision would be dropped
        # by a resume and the trajectory would diverge
        tracker.flush()
        os.makedirs(args.checkpoint_dir, exist_ok=True)
        save_tracker_state(tracker, os.path.join(args.checkpoint_dir, "state"))
        with open(os.path.join(args.checkpoint_dir, "meta.json"), "w") as f:
            json.dump({"next_frame": next_frame}, f)

    chunk = max(1, args.chunk)
    i = start_idx
    n = len(image_paths)
    since_ckpt = 0
    while i < n:
        if chunk == 1 or tracker.is_first_frame:
            c = 1
            cap, exp = frame_meta(i)
            img = load_image(i)
            depth = load_depth(i)
            n_fail = len(tracker.failure_log)
            pose = tracker.track_frame(load_sharp(i, img), img, cap, exp, depth)
            if len(tracker.failure_log) > n_fail and out_t:
                # the deferred health check (flush inside this call) just
                # rejected the PREVIOUS frame: its already-recorded pose is
                # the diverged one. Substitute the last good pose, matching
                # what the chunked path emits for a rejected frame
                good = -2 if len(out_t) >= 2 else None
                out_t[-1] = (out_t[good].copy() if good
                             else np.asarray(tracker.T_keyframe.t))
                out_q[-1] = (out_q[good].copy() if good
                             else np.asarray(tracker.T_keyframe.q))
            record(i, cap, pose)
            i += 1
        else:
            # hand track_frames MANY chunks at once so its cross-chunk
            # speculation pipeline stays full (inflight dispatches overlap
            # the per-chunk stats fetch); a checkpoint cadence caps the
            # batch so checkpoints stay near the requested granularity
            c = n - i
            if args.checkpoint_every:
                c = min(c, max(args.checkpoint_every - since_ckpt, chunk))
            c = min(c, chunk * 8)
            idx = list(range(i, i + c))
            metas = [frame_meta(j) for j in idx]
            imgs = [load_image(j) for j in idx]
            depths = [load_depth(j) for j in idx]
            sharps = [load_sharp(j, imgs[r]) for r, j in enumerate(idx)]
            poses = tracker.track_frames(
                imgs, [m[0] for m in metas], [m[1] for m in metas],
                sharp_imgs=sharps, depth_maps=depths, chunk=chunk,
                inflight=max(1, args.inflight),
            )
            stats = tracker.last_track_stats
            for r, pose in enumerate(poses):
                kern = float(stats[r, 1]) if stats is not None else None
                record(idx[r], metas[r][0], pose, kernel=kern)
            i += c
        since_ckpt += c
        if args.checkpoint_every and since_ckpt >= args.checkpoint_every:
            checkpoint(i)
            since_ckpt = 0

    # the final frame's deferred decision: if its health check rejects it,
    # substitute the last good pose before writing the trajectory
    n_fail = len(tracker.failure_log)
    tracker.flush()
    if len(tracker.failure_log) > n_fail and len(out_t) >= 2:
        out_t[-1] = out_t[-2].copy()
        out_q[-1] = out_q[-2].copy()

    ds.save_tum_trajectory(
        args.output, np.asarray(out_times), np.asarray(out_t), np.asarray(out_q)
    )
    print(f"wrote {len(out_times)} poses to {args.output}")
    return 0


def cmd_synth(args) -> int:
    import jax
    import jax.numpy as jnp
    from PIL import Image as PILImage

    from .core import lie
    from .core.spline import make_knots, spline_pose_at
    from .data.synthetic import synthesize_blurred_image, smooth_shapes_image
    from .data import datasets as ds

    os.makedirs(args.output, exist_ok=True)
    H, W = args.height, args.width
    fx = 0.75 * W
    K = np.array([fx, fx, (W - 1) / 2, (H - 1) / 2])

    img0 = jnp.asarray(smooth_shapes_image(H, W), jnp.float32)
    rng = np.random.default_rng(args.seed)
    vel_t = rng.uniform(-0.08, 0.08, 3)
    vel_w = rng.uniform(-0.08, 0.08, 3)
    n_knots = args.num_frames + 4
    kt, kq = [np.zeros(3)], [np.array([0.0, 0.0, 0.0, 1.0])]
    q = kq[0]
    for _ in range(1, n_knots):
        kt.append(kt[-1] + vel_t * args.frame_dt + rng.normal(0, 1e-3, 3))
        import jax.numpy as _j

        q = np.array(
            lie.quat_multiply(
                _j.asarray(q),
                lie.quat_exp(_j.asarray(vel_w * args.frame_dt + rng.normal(0, 1e-3, 3))),
            )
        )
        q = q / np.linalg.norm(q)
        kq.append(q)
    traj = make_knots(
        jnp.asarray(np.array(kt), jnp.float32),
        jnp.asarray(np.array(kq), jnp.float32), 0.0, args.frame_dt,
    )

    Kj = jnp.asarray(K, jnp.float32)
    synth = jax.jit(
        lambda cap: synthesize_blurred_image(
            img0, traj, 2, cap, args.exposure, args.num_samples,
            args.depth, Kj,
        )
    )

    img_dir = os.path.join(args.output, "images")
    depth_dir = os.path.join(args.output, "depths")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(depth_dir, exist_ok=True)

    PILImage.fromarray(np.asarray(img0).astype(np.uint8)).save(
        os.path.join(img_dir, "frame_0000.png")
    )
    np.save(os.path.join(depth_dir, "frame_0000.npy"),
            np.full((H, W), args.depth, np.float32))

    gt_times, gt_t, gt_q = [0.0], [np.zeros(3)], [np.array([0, 0, 0, 1.0])]
    lines = [f"frame_0000.png 0.0 {args.exposure}"]
    for i in range(1, args.num_frames + 1):
        cap = i * args.frame_dt
        blurred = np.asarray(synth(jnp.float32(cap)))
        PILImage.fromarray(np.clip(blurred, 0, 255).astype(np.uint8)).save(
            os.path.join(img_dir, f"frame_{i:04d}.png")
        )
        np.save(os.path.join(depth_dir, f"frame_{i:04d}.npy"),
                np.full((H, W), args.depth, np.float32))
        p = spline_pose_at(traj, cap, 2)
        gt_times.append(cap)
        gt_t.append(np.asarray(p.t))
        gt_q.append(np.asarray(p.q))
        lines.append(f"frame_{i:04d}.png {cap} {args.exposure}")

    with open(os.path.join(args.output, "times.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    ds.save_tum_trajectory(
        os.path.join(args.output, "groundtruth.txt"),
        np.asarray(gt_times), np.asarray(gt_t), np.asarray(gt_q),
    )
    with open(os.path.join(args.output, "intrinsics.txt"), "w") as f:
        f.write(",".join(str(v) for v in K) + "\n")
    print(f"wrote {args.num_frames + 1} frames to {args.output}")
    return 0


def cmd_eval(args) -> int:
    from .data import datasets as ds
    from .utils.metrics import ate_rmse, rpe_rmse

    t_est, est_t, _ = ds.load_tum_trajectory(args.est)
    t_ref, ref_t, _ = ds.load_tum_trajectory(args.ref)
    n = min(len(t_est), len(t_ref))
    ate = ate_rmse(est_t[:n], ref_t[:n], with_scale=args.with_scale)
    rpe = rpe_rmse(est_t[:n], ref_t[:n])
    print(json.dumps({"ate_rmse": ate, "rpe_rmse": rpe, "num_poses": n}))
    return 0


def main(argv=None) -> int:
    args = _build_arg_parser().parse_args(argv)
    if args.command == "track":
        return cmd_track(args)
    if args.command == "synth":
        return cmd_synth(args)
    if args.command == "eval":
        return cmd_eval(args)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
