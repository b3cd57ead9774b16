"""Long-sequence loop-closure benchmark (BASELINE configs 4-5).

Generates a closed-loop synthetic blurred sequence (cli synth
--trajectory loop: the camera leaves the start, circles, and returns),
tracks it TWICE through the real CLI — tracker-only and
--backend ba+pg — and reports full-trajectory and final-segment ATE for
both. Drift accumulates naturally from per-keyframe chaining + 8-bit
quantization + pixel noise; the pose graph's PnP loop edges against early
keyframes must cut the final-segment error when the camera revisits the
start (reference scaffolding: Point3dStatic.h:19-33 observations,
MapSparse.h; the backend glue is ours).

Writes LOOP_r{N}.json via --out. Run on CPU or TPU (the CLI is
platform-agnostic); the committed artifact records the platform.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile

import numpy as np


def _ate(est_path, gt_path, tail_frac=None):
    from mba_vo_tpu.data import datasets as ds

    _, est_t, _ = ds.load_tum_trajectory(est_path)
    _, ref_t, _ = ds.load_tum_trajectory(gt_path)
    n = min(len(est_t), len(ref_t))
    err = np.linalg.norm(est_t[:n] - ref_t[:n], axis=1)
    if tail_frac is not None:
        err = err[int(n * (1 - tail_frac)):]
    return float(np.sqrt(np.mean(err ** 2)))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--num-frames", type=int, default=60)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--noise", type=float, default=1.5)
    p.add_argument("--keep", default=None,
                   help="keep the sequence + trajectories in this directory")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from mba_vo_tpu import cli

    root = args.keep or tempfile.mkdtemp(prefix="loopbench_")
    os.makedirs(root, exist_ok=True)
    seq = os.path.join(root, "seq")

    rc = cli.main([
        "synth", "--output", seq, "--num-frames", str(args.num_frames),
        "--height", str(args.height), "--width", str(args.width),
        "--num-samples", "7", "--trajectory", "loop",
        "--texture", "random",
        "--noise", str(args.noise),
    ])
    assert rc == 0

    with open(os.path.join(seq, "config.json"), "w") as f:
        json.dump({
            "num_pyramid_levels": 2,
            "num_virtual_poses": [5, 5],
            "huber_a": 10.0,
            "min_abs_cost_decrease": 1e-6,
            # aggressive keyframing: drift accumulates per switch, giving
            # the loop closure something real to correct
            "keyframe_max_flow_mag0": 1.5,
            "keyframe_max_flow_mag1": 3.0,
            "keyframe_max_blur_kernel_mag": 1e9,
            "max_sane_flow": 200.0,
            "detector": {"score_threshold": 5.0, "cell_h": 12, "cell_w": 12,
                         "max_keypoints": 256},
            "dtype": "float64",
        }, f)

    # denser backend corners than the VGA-tuned default (grid cells scale
    # with resolution) so the loop detector has real match support
    with open(os.path.join(seq, "backend.json"), "w") as f:
        json.dump({
            "detector": {"score_threshold": 1.0, "cell_h": 12, "cell_w": 12,
                         "max_keypoints": 512},
        }, f)

    intr = open(os.path.join(seq, "intrinsics.txt")).read().strip()
    runs = {}
    for name, extra in (
        ("tracker_only", []),
        ("ba_pg", ["--backend", "ba+pg",
                   "--backend-config", os.path.join(seq, "backend.json")]),
    ):
        out_file = os.path.join(root, f"est_{name}.txt")
        rc = cli.main([
            "track",
            "--images", os.path.join(seq, "images"),
            "--sharp-images", os.path.join(seq, "sharp"),
            "--depths", os.path.join(seq, "depths"),
            "--dataset-type", "eth3d",
            "--times", os.path.join(seq, "times.txt"),
            "--intrinsics", intr,
            "--output", out_file,
            "--chunk", "1",
            "--config", os.path.join(seq, "config.json"),
            *extra,
        ])
        assert rc == 0
        gt = os.path.join(seq, "groundtruth.txt")
        runs[name] = {
            "ate_full_m": round(_ate(out_file, gt), 6),
            "ate_final_quarter_m": round(_ate(out_file, gt, tail_frac=0.25),
                                         6),
        }
        print(json.dumps({name: runs[name]}), flush=True)

    imp = 1.0 - (runs["ba_pg"]["ate_final_quarter_m"]
                 / max(runs["tracker_only"]["ate_final_quarter_m"], 1e-12))
    summary = {
        "metric": "loop_closure_final_segment_ate",
        "num_frames": args.num_frames,
        "image": [args.height, args.width],
        "noise_sigma": args.noise,
        "runs": runs,
        "final_segment_improvement_frac": round(imp, 3),
    }
    print(json.dumps(summary), flush=True)
    if args.out:
        import jax

        summary["platform"] = jax.default_backend()
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {args.out}")
    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.path.insert(0, ".")
    raise SystemExit(main())
