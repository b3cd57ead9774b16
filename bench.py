"""Benchmark: blur-aware tracked frames/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Scenario = BASELINE.json config 2: blur-aware tracking with 5 virtual poses,
3-level pyramid, VGA-scale frames, semi-dense keypoints, synthetic blurred
sequence from the exact forward model. Measures steady-state per-frame
tracking wall time (full coarse-to-fine LM, keyframe pinned).

``--keyframe`` switches to the KEYFRAME-INCLUSIVE scenario (r04 verdict
weak #4: the steady-state headline silently assumed keyframes are free):
real keyframe thresholds (TrackerConfig defaults 15/30 px flow, 3 px
kernel), per-frame sharp/depth candidates, and a motion that forces
switches — the amortized fps then pays for process_keyframe (semi-dense
detection + depth ingestion + window-cache extraction) and the
chunk-speculation redos a mid-chunk switch triggers (reference
tmpProcessKeyframe, blur_aware_direct_tracker.cpp:344-416).

The reference publishes no numbers (BASELINE.md); vs_baseline is reported
against a 30 frames/s real-time tracking budget, the conventional VO
real-time bar.
"""

import json
import os
import sys
import time

import numpy as np

REALTIME_BASELINE_FPS = 30.0


def main(keyframe_mode: bool = False):
    import jax
    import jax.numpy as jnp

    from mba_vo_tpu.core import lie
    from mba_vo_tpu.core.spline import make_knots
    from mba_vo_tpu.data.synthetic import synthesize_blurred_image, _box_filter_1d
    from mba_vo_tpu.tracker.blur_tracker import BlurAwareTracker, TrackerConfig
    from mba_vo_tpu.tracker.detector import DetectorOptions

    H, W, FX = 480, 640, 480.0
    KVEC = np.array([FX, FX, (W - 1) / 2, (H - 1) / 2])
    DEPTH, EXPOSURE, FRAME_DT, DEG = 2.0, 0.03, 0.1, 2

    img = np.random.default_rng(0).uniform(0, 255, (H, W))
    for _ in range(2):
        img = _box_filter_1d(img, 2, 0)
        img = _box_filter_1d(img, 2, 1)
    img0 = jnp.asarray(img, jnp.float32)

    vel_t = np.array([0.06, -0.04, 0.02])
    vel_w = np.array([0.02, 0.05, -0.08])
    kt, kq = [np.zeros(3)], [np.array([0.0, 0.0, 0.0, 1.0])]
    q = kq[0]
    n_frames = int(os.environ.get("MBA_VO_BENCH_FRAMES", "72"))
    for _ in range(1, n_frames + 4):
        kt.append(kt[-1] + vel_t * FRAME_DT)
        q = np.asarray(
            lie.quat_multiply(
                jnp.asarray(q), lie.quat_exp(jnp.asarray(vel_w * FRAME_DT))
            )
        )
        kq.append(q / np.linalg.norm(q))
    traj = make_knots(
        jnp.asarray(np.array(kt), jnp.float32),
        jnp.asarray(np.array(kq), jnp.float32),
        0.0,
        FRAME_DT,
    )

    # one jitted renderer reused for every frame (capture time is traced, so
    # there is exactly one compilation)
    Kj = jnp.asarray(KVEC, jnp.float32)
    synth = jax.jit(
        lambda cap: synthesize_blurred_image(
            img0, traj, DEG, cap, EXPOSURE, 5, DEPTH, Kj
        )
    )
    frames = []
    for i in range(1, n_frames + 1):
        cap = i * FRAME_DT
        frames.append((cap, np.asarray(synth(jnp.float32(cap)))))

    if keyframe_mode:
        # real keyframe criteria (TrackerConfig defaults: 15/30 px flow,
        # 3 px kernel) + per-frame sharp/depth keyframe candidates: this
        # motion crosses the flow threshold every ~9 frames, so the run
        # pays detection + depth ingestion + window-cache extraction and
        # the chunk-speculation redo at every switch
        cfg = TrackerConfig(
            num_pyramid_levels=3,
            num_virtual_poses=(5, 5, 5),
            huber_a=10.0,
            max_chi_square_error=3.0,
            keyframe_max_blur_kernel_mag=1e9,  # flow criterion drives
            detector=DetectorOptions(
                score_threshold=5.0, cell_h=30, cell_w=30, max_keypoints=512
            ),
            dtype="float32",
        )
    else:
        cfg = TrackerConfig(
            num_pyramid_levels=3,
            num_virtual_poses=(5, 5, 5),
            huber_a=10.0,
            max_chi_square_error=3.0,
            keyframe_max_flow_mag0=1e9,
            keyframe_max_flow_mag1=1e9,
            detector=DetectorOptions(
                score_threshold=5.0, cell_h=30, cell_w=30, max_keypoints=512
            ),
            dtype="float32",
        )
    tracker = BlurAwareTracker(cfg, KVEC, (H, W))
    depth = np.full((H, W), DEPTH, np.float32)
    tracker.track_frame(np.asarray(img0), np.asarray(img0), 0.0, EXPOSURE, depth)

    sharps = depths = None
    if keyframe_mode:
        from mba_vo_tpu.core.spline import spline_pose_at
        from mba_vo_tpu.data.synthetic import warp_image

        warp = jax.jit(lambda t, q: warp_image(img0, t, q, DEPTH, Kj))
        sharps, depths = [], []
        for cap, _ in frames:
            p = spline_pose_at(traj, jnp.float32(cap), DEG)
            sharps.append(np.asarray(warp(p.t, p.q)))
            depths.append(
                np.full((H, W), DEPTH - float(p.t[2]), np.float32))

    # stage frames on device up front: input prefetch overlaps tracking in
    # production (runtime/dataio.cpp prefetcher); the metric is tracked
    # frames/s of the engine, not host link bandwidth. A LIST of per-frame
    # device arrays, not one stacked array: the stacked-array + eager-slice
    # variant measured 10x slower on the remote backend (see the note in
    # blur_tracker._dispatch).
    frames_dev = [jax.device_put(jnp.asarray(b, jnp.float32))
                  for _, b in frames]

    # warmup (compile all three pyramid levels + the chunked scan).
    # CHUNK=24: the r05 on-chip sweep (CHUNK 8/12/24 x INFLIGHT 3/4, 72
    # frames) measured 221 / 331-359 / 438 fps — wall time is dominated by
    # per-dispatch link latency on the remote-attached chip, so doubling
    # the frames per lax.scan dispatch is the single largest wall lever
    CHUNK = int(os.environ.get("MBA_VO_BENCH_CHUNK", "24"))
    INFLIGHT = int(os.environ.get("MBA_VO_BENCH_INFLIGHT", "3"))
    caps = [cap for cap, _ in frames]
    exps = [EXPOSURE] * len(frames)

    def run(lo, hi):
        kw = {}
        if keyframe_mode:
            kw = dict(sharp_imgs=sharps[lo:hi], depth_maps=depths[lo:hi])
        est = tracker.track_frames(frames_dev[lo:hi], caps[lo:hi],
                                   exps[lo:hi],
                                   chunk=CHUNK, inflight=INFLIGHT, **kw)
        jax.block_until_ready(est[-1].t)
        return est

    n_switches = [0]
    if keyframe_mode:
        # count keyframe switches (process_keyframe invocations) so the
        # artifact records how much keyframe work the amortized fps paid for
        orig_pk = tracker.process_keyframe

        def counting_pk(s, d):
            n_switches[0] += 1
            return orig_pk(s, d)

        tracker.process_keyframe = counting_pk

    run(0, CHUNK)
    n_switches[0] = 0  # timed segment only

    # steady state: 5 full chunks with INFLIGHT dispatches speculatively in
    # flight, so per-chunk stats fetches overlap device compute
    n_timed = len(frames) - CHUNK
    t0 = time.time()
    run(CHUNK, len(frames))
    wall = time.time() - t0
    fps = n_timed / wall

    rec = {
        "metric": ("blur_aware_tracked_frames_per_s_per_chip_incl_keyframes"
                   if keyframe_mode
                   else "blur_aware_tracked_frames_per_s_per_chip"),
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / REALTIME_BASELINE_FPS, 3),
    }
    if keyframe_mode:
        rec["num_keyframe_switches_timed"] = n_switches[0]
    print(json.dumps(rec))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main(keyframe_mode="--keyframe" in sys.argv)
