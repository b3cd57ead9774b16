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
    t.add_argument("--backend-config",
                   help="JSON file of BackendConfig overrides (detector, "
                        "matching, loop-closure, BA and pose-graph knobs)")
    t.add_argument("--shard-devices", type=int, default=0,
                   help="multi-chip: shard tracking keypoints (and backend "
                        "BA landmarks) over the first N devices of a 1-D "
                        "jax mesh; normal equations psum-assemble over ICI "
                        "(0 = single device)")
    t.add_argument("--joint-window", action="store_true",
                   help="optimize each chunk of frames as ONE joint LM "
                        "problem over a sliding multi-knot spline window "
                        "(the reference's <=16-frame/<=16-knot design "
                        "point; enables cross-frame smoothness and "
                        "degree-4 cubics; full keyframe switching + "
                        "failure recovery). Requires --chunk > 1")
    t.add_argument("--viz-dir",
                   help="write per-frame overlay PNGs (tracked keypoints + "
                        "estimated blur-kernel polylines, the reference's "
                        "drawCurrFrameKeypoints GUI output, headless). In "
                        "chunked mode overlays render from each frame's own "
                        "committed knot window; rejected frames are skipped")

    s = sub.add_parser("synth", help="generate a synthetic blurred sequence")
    s.add_argument("--output", required=True, help="output directory")
    s.add_argument("--texture", choices=("shapes", "random"),
                   default="shapes",
                   help="'random' = smoothed random albedo (locally "
                        "distinctive, feature-matching friendly); 'shapes' "
                        "= the reference's white-rectangle scene")
    s.add_argument("--trajectory", choices=("random", "loop"),
                   default="random",
                   help="'loop' = closed circle revisiting the start pose "
                        "(loop-closure benchmark, BASELINE configs 4-5)")
    s.add_argument("--noise", type=float, default=0.0,
                   help="additive Gaussian pixel noise sigma on blurred "
                        "frames (controlled drift source for the loop "
                        "benchmark)")
    s.add_argument("--scene", choices=("planar", "3d"), default="planar",
                   help="scene geometry: 'planar' = constant-depth textured "
                        "plane (the reference's generator); '3d' = slanted "
                        "plane + sphere field rendered by exact ray casting "
                        "with true per-frame depth maps (non-planar "
                        "benchmark, BASELINE config 3 readiness)")
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
    if getattr(args, "shard_devices", 0) and args.shard_devices > 1:
        import dataclasses as _dcs

        cfg = _dcs.replace(cfg, shard_devices=args.shard_devices)
    if cfg.dtype == "float64":
        # without this, a float64 config outside the test harness is
        # SILENTLY truncated to float32 (jax default) — the tracker then
        # runs at a precision the user did not ask for
        import jax

        jax.config.update("jax_enable_x64", True)
    backend = None
    if args.backend != "none":
        import dataclasses as _dc

        from .backend.vo_backend import BackendConfig, VOBackend
        from .utils.config import backend_config_from_dict

        if args.backend_config:
            with open(args.backend_config) as f:
                bcfg = backend_config_from_dict(json.load(f))
        else:
            bcfg = BackendConfig()
        rep = dict(
            window_size=args.backend_window,
            run_pose_graph=(args.backend == "ba+pg"),
        )
        # the CLI flag only OVERRIDES when actually given (>1): a
        # shard_devices set in --backend-config JSON must survive the
        # default flag value
        if getattr(args, "shard_devices", 0) and args.shard_devices > 1:
            rep["shard_devices"] = args.shard_devices
        bcfg = _dc.replace(bcfg, **rep)
        backend = VOBackend(bcfg, K)
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

    # ---- I/O prefetch: frame i+1's file reads overlap frame i's device
    # compute. Unreal ASCII depth goes through the NATIVE parser + thread
    # pool (runtime/dataio.cpp DepthPrefetcher — the production caller of
    # the reference InputOutput.cpp:12-41 path); images and other depth
    # formats prefetch on a small Python thread pool. Device-side undistort
    # stays on the caller thread.
    from concurrent.futures import ThreadPoolExecutor

    # the native library import may spawn a `make` subprocess to (re)build
    # itself — only pay that (and only load the .so) when the unreal ASCII
    # depth path actually uses it, not on every track invocation
    native_pf = None
    parse_depth_file = None
    if depth_paths and args.dataset_type == "unreal":
        _RUNTIME_DIR = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "runtime",
        )
        if _RUNTIME_DIR not in sys.path:
            sys.path.insert(0, _RUNTIME_DIR)
        from bindings import DepthPrefetcher, parse_depth_file

        native_pf = DepthPrefetcher(2)
    _pool = ThreadPoolExecutor(max_workers=2)
    _img_futs, _depth_futs = {}, {}
    PREFETCH_AHEAD = max(4, args.chunk)

    def _depth_raw(path):
        if path.lower().endswith(".npy"):
            return np.load(path)
        if args.dataset_type == "unreal":
            if native_pf is not None:
                return ds.ray_depth_to_z(
                    native_pf.fetch(path, H, W), K)
            return ds.ray_depth_to_z(parse_depth_file(path, H, W), K)
        if args.dataset_type == "eth3d":
            return ds.load_depth(path, "eth3d")
        return np.load(path)

    def _prefetch_ahead(j0):
        for j in range(j0, min(j0 + PREFETCH_AHEAD, len(image_paths))):
            if j not in _img_futs:
                _img_futs[j] = _pool.submit(
                    ds.load_gray_image, image_paths[j])
            if depth_paths and j not in _depth_futs:
                if native_pf is not None:
                    native_pf.submit(depth_paths[j])
                    _depth_futs[j] = True
                else:
                    _depth_futs[j] = _pool.submit(_depth_raw, depth_paths[j])

    def load_image(i):
        fut = _img_futs.pop(i, None)
        img = (fut.result() if fut is not None
               else ds.load_gray_image(image_paths[i]))
        _prefetch_ahead(i + 1)
        return undistort(img) if undistort else img

    def load_depth(i):
        if not depth_paths:
            return None
        fut = _depth_futs.pop(i, None)
        if fut is None or fut is True:
            d = _depth_raw(depth_paths[i])
        else:
            d = fut.result()
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
        if kernel is not None and np.isnan(kernel):
            # chunked path marks a health-check-rejected frame with NaN
            # stats; its pose is the last good pose, held
            tail = "(rejected, pose held)"
        else:
            tail = f"kernel={kernel:.2f}px"
        print(
            f"frame {i:4d} t={cap:.3f} pos="
            + np.array2string(np.asarray(pose.t), precision=4)
            + " " + tail
        )
        if args.viz_dir and chunk == 1:
            # chunked mode renders through the tracker's per-frame commit
            # callback instead (correct per-frame knots + keyframe pairing)
            render_overlay(i, tracker.knots)

    def render_overlay(i, knots):
        # keypoint + estimated blur-kernel overlay on the tracked frame
        # (reference drawCurrFrameKeypoints, with_gui hooks —
        # blur_aware_direct_tracker.cpp:436-491, headless PNGs here).
        # Skip frames whose exposure the given knot window does not cover
        # (bootstrap / re-anchor corner cases) rather than writing
        # extrapolated-garbage overlays
        if not tracker.keyframe_levels or knots is None:
            return
        cap, exp_i = frame_meta(i)
        t0 = float(knots.t0)
        t_end = t0 + float(knots.dt) * (knots.num_knots - 1)
        # float32 production knots round t0 by ~1e-7 of the time scale, so
        # the coverage tolerance must be well above f32 ulp (a 1e-9 epsilon
        # silently dropped ~half the overlays on TPU runs)
        tol = 1e-4 * max(1.0, abs(t_end), float(knots.dt))
        if not (t0 - tol <= cap - 0.5 * exp_i
                and cap + 0.5 * exp_i <= t_end + tol):
            return
        from .utils import viz

        os.makedirs(args.viz_dir, exist_ok=True)
        kf0 = tracker.keyframe_levels[0]
        m = np.asarray(kf0["kp_mask"]) > 0
        segs = viz.blur_kernel_segments(
            knots, np.asarray(kf0["kp_xy"])[m],
            np.asarray(kf0["kp_z"])[m], K, cap,
            exp_i, cfg.spline_degree,
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
    if args.joint_window and chunk <= 1:
        print("warning: --joint-window needs --chunk > 1; falling back to "
              "per-frame tracking")
    if args.viz_dir and chunk > 1:
        # per-frame overlays in chunked mode: the tracker invokes this at
        # each frame's COMMIT (correct per-frame knot window + the keyframe
        # it was actually tracked against); knots is None for a rejected
        # frame, which render_overlay skips
        viz_base = [start_idx]
        tracker.frame_callback = (
            lambda r, knots: render_overlay(viz_base[0] + r, knots)
        )
    i = start_idx
    n = len(image_paths)
    since_ckpt = 0
    try:
        while i < n:
            if chunk == 1 or tracker.is_first_frame:
                c = 1
                cap, exp = frame_meta(i)
                img = load_image(i)
                depth = load_depth(i)
                n_fail = len(tracker.failure_log)
                pose = tracker.track_frame(
                    load_sharp(i, img), img, cap, exp, depth)
                if len(tracker.failure_log) > n_fail and out_t:
                    # the deferred health check (flush inside this call)
                    # just rejected the PREVIOUS frame: its already-recorded
                    # pose is the diverged one. Substitute the last good
                    # pose, matching what the chunked path emits for a
                    # rejected frame
                    good = -2 if len(out_t) >= 2 else None
                    out_t[-1] = (out_t[good].copy() if good
                                 else np.asarray(tracker.T_keyframe.t))
                    out_q[-1] = (out_q[good].copy() if good
                                 else np.asarray(tracker.T_keyframe.q))
                record(i, cap, pose)
                i += 1
            else:
                # hand track_frames MANY chunks at once so its cross-chunk
                # speculation pipeline stays full (inflight dispatches
                # overlap the per-chunk stats fetch); a checkpoint cadence
                # caps the batch so checkpoints stay near the requested
                # granularity
                c = n - i
                if args.checkpoint_every:
                    c = min(c, max(args.checkpoint_every - since_ckpt,
                                   chunk))
                c = min(c, chunk * 8)
                idx = list(range(i, i + c))
                metas = [frame_meta(j) for j in idx]
                imgs = [load_image(j) for j in idx]
                depths = [load_depth(j) for j in idx]
                sharps = [load_sharp(j, imgs[r]) for r, j in enumerate(idx)]
                if args.viz_dir:
                    viz_base[0] = i
                track = (tracker.track_frames_joint if args.joint_window
                         else tracker.track_frames)
                poses = track(
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
    finally:
        # pending prefetch futures are non-daemon threads; cancel them so
        # an error exit does not hang on slow file reads
        _pool.shutdown(wait=False, cancel_futures=True)

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

    use_3d = getattr(args, "scene", "planar") == "3d"
    if getattr(args, "texture", "shapes") == "random":
        # smoothed random texture: locally distinctive everywhere — the
        # shapes scene's repeated rectangle corners alias BRIEF descriptors
        # and starve feature-based loop closure
        from .data.synthetic import _box_filter_1d

        timg = np.random.default_rng(args.seed + 1).uniform(0, 255, (H, W))
        for _ in range(2):
            timg = _box_filter_1d(timg, 2, 0)
            timg = _box_filter_1d(timg, 2, 1)
        img0 = jnp.asarray(timg, jnp.float32)
    else:
        img0 = jnp.asarray(smooth_shapes_image(H, W), jnp.float32)
    rng = np.random.default_rng(args.seed)
    n_knots = args.num_frames + 4
    import jax.numpy as _j
    if getattr(args, "trajectory", "random") == "loop":
        # closed loop revisiting the start: a lateral circle + yaw wiggle,
        # one full revolution over the sequence (the BASELINE configs 4-5
        # loop-closure benchmark geometry)
        R = 0.12 * args.depth
        kt, kq = [], []
        for k in range(n_knots):
            th = 2.0 * np.pi * k / max(args.num_frames, 1)
            kt.append(np.array([R * np.sin(th), R * (1 - np.cos(th)),
                                0.02 * args.depth * np.sin(2 * th)]))
            yaw = 0.06 * np.sin(th)
            pitch = 0.04 * np.sin(2 * th)
            q = np.array(lie.quat_exp(_j.asarray([pitch, yaw, 0.0])))
            kq.append(q / np.linalg.norm(q))
    else:
        vel_t = rng.uniform(-0.08, 0.08, 3)
        vel_w = rng.uniform(-0.08, 0.08, 3)
        kt, kq = [np.zeros(3)], [np.array([0.0, 0.0, 0.0, 1.0])]
        q = kq[0]
        for _ in range(1, n_knots):
            kt.append(kt[-1] + vel_t * args.frame_dt + rng.normal(0, 1e-3, 3))
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
    if use_3d:
        # non-planar scene: slanted textured plane + sphere field, rendered
        # by exact ray casting with TRUE per-frame depth maps
        # (data.scene3d — the BASELINE config 3 readiness benchmark)
        from .data import scene3d

        scene = scene3d.default_scene(
            np.asarray(img0), depth=args.depth, seed=args.seed)
        QID = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32)
        synth = jax.jit(
            lambda cap: scene3d.synthesize_blurred_image_scene(
                scene, traj, 2, cap, args.exposure, args.num_samples,
                Kj, H, W,
            )
        )
        render0 = jax.jit(
            lambda t, q: scene3d.render_scene(scene, t, q, Kj, H, W)
        )

        def depth_at(cap):
            p = spline_pose_at(traj, jnp.float32(cap), 2)
            _, z = render0(p.t, p.q)
            return np.asarray(z, np.float32)
    else:
        synth = jax.jit(
            lambda cap: synthesize_blurred_image(
                img0, traj, 2, cap, args.exposure, args.num_samples,
                args.depth, Kj,
            )
        )

        # exact z-depth of the world plane z=args.depth from pose (t, R):
        # the ray through pixel (u,v) hits at ray parameter
        # s = (depth - t_z) / (R d_cam)_z and with d_cam = (x', y', 1) the
        # camera z-depth IS s — per-pose depth maps, not a constant fill
        ys_g, xs_g = np.mgrid[0:H, 0:W]
        _dcam = np.stack(
            [(xs_g - K[2]) / K[0], (ys_g - K[3]) / K[1],
             np.ones((H, W))], axis=-1)

        def depth_at(cap):
            from .core.lie import quat_rotate as _qr

            p = spline_pose_at(traj, jnp.float32(cap), 2)
            R_d = np.asarray(_qr(
                jnp.asarray(p.q)[None, None, :], jnp.asarray(_dcam, jnp.float32)
            ))
            s = (args.depth - float(p.t[2])) / R_d[..., 2]
            return s.astype(np.float32)

    img_dir = os.path.join(args.output, "images")
    depth_dir = os.path.join(args.output, "depths")
    sharp_dir = os.path.join(args.output, "sharp")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(depth_dir, exist_ok=True)
    os.makedirs(sharp_dir, exist_ok=True)

    def sharp_at(cap):
        """True sharp render at the capture-time pose — keyframe candidates
        for mid-sequence switches (the reference dataset contract expects a
        sharp keyframe, blur_aware_direct_tracker.cpp:373-386)."""
        p = spline_pose_at(traj, jnp.float32(cap), 2)
        if use_3d:
            im, _ = render0(p.t, p.q)
        else:
            from .data.synthetic import warp_image

            im = warp_image(img0, p.t, p.q, args.depth, Kj)
        return np.clip(np.asarray(im), 0, 255).astype(np.uint8)

    if use_3d:
        frame0, _ = render0(jnp.zeros(3, jnp.float32),
                            jnp.asarray([0, 0, 0, 1.0], jnp.float32))
        frame0 = np.clip(np.asarray(frame0), 0, 255)
    else:
        frame0 = np.asarray(img0)
    PILImage.fromarray(frame0.astype(np.uint8)).save(
        os.path.join(img_dir, "frame_0000.png")
    )
    PILImage.fromarray(frame0.astype(np.uint8)).save(
        os.path.join(sharp_dir, "frame_0000.png")
    )
    np.save(os.path.join(depth_dir, "frame_0000.npy"), depth_at(0.0))

    gt_times, gt_t, gt_q = [0.0], [np.zeros(3)], [np.array([0, 0, 0, 1.0])]
    lines = [f"frame_0000.png 0.0 {args.exposure}"]
    for i in range(1, args.num_frames + 1):
        cap = i * args.frame_dt
        blurred = np.asarray(synth(jnp.float32(cap)))
        if args.noise > 0:
            blurred = blurred + rng.normal(0, args.noise, blurred.shape)
        PILImage.fromarray(np.clip(blurred, 0, 255).astype(np.uint8)).save(
            os.path.join(img_dir, f"frame_{i:04d}.png")
        )
        np.save(os.path.join(depth_dir, f"frame_{i:04d}.npy"), depth_at(cap))
        PILImage.fromarray(sharp_at(cap)).save(
            os.path.join(sharp_dir, f"frame_{i:04d}.png")
        )
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
