"""Per-stage device-time breakdown of the production tracking frame.

VERDICT r03 weak #4: the 203-fps headline implied ~4.9 ms of device time per
frame with no committed evidence of where it goes. This harness decomposes
the EXACT production configuration (bench.py: VGA, 3 pyramid levels, 512
semi-dense keypoints, 5 virtual poses, degree-2 spline, windowed sampling)
into its pipeline stages and times each ON CHIP with the two-scan-length
differencing method (time(R2 iters) - time(R1 iters) over a carry-dependent
lax.scan, so dispatch+link setup cancels and iterations cannot fuse away or
overlap).

Stages per pyramid level (names match ops.residual / solver.lm):
  window_cache   prepare_window_cache — per-keypoint window extraction
  rjv_cost       compute_rjv without Jacobian (primal residual pass)
  rjv_jac        compute_rjv with Jacobian (primal + 12 linearize tangents)
  assemble_cost  Huber cost reduction only
  assemble_Hg    Huber-weighted H/g normal-equation matmuls
  solve          damped 12x12 Cholesky solve
  outliers       chi-square re-masking
  level_full     the whole optimize_level LM loop (its iteration count is
                 recorded so the stage model can be reconciled against it)
  warp_core      frontoparallel_warp of all F*N*P*V samples (inside rjv)
  sampling_core  windowed bilinear sampling, 3 channels (inside rjv)

The reference carries the same decomposition as commented-out timer prints
around each CUDA stage (spline_update_step.cpp:126-240); this makes ours
real, committed, and roofline-annotated.

Writes PROFILE_r{N}.json via --out; prints one JSON record per stage.
"""

import argparse
import json
import sys
import time

import numpy as np

HBM_PEAK_GBPS = 819.0   # TPU v5 lite


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from mba_vo_tpu.core import lie
    from mba_vo_tpu.core.spline import make_knots
    from mba_vo_tpu.data.synthetic import synthesize_blurred_image, _box_filter_1d
    from mba_vo_tpu.ops import residual as res
    from mba_vo_tpu.ops.warp import frontoparallel_warp
    from mba_vo_tpu.ops.window_sampling import sample_windows_lk
    from mba_vo_tpu.ops.image import in_bounds
    from mba_vo_tpu.solver import lm as lm_mod
    from mba_vo_tpu.tracker.blur_tracker import BlurAwareTracker, TrackerConfig
    from mba_vo_tpu.tracker.detector import DetectorOptions

    # ---- EXACT bench.py production scenario -------------------------------
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
    for _ in range(1, 8):
        kt.append(kt[-1] + vel_t * FRAME_DT)
        q = np.asarray(lie.quat_multiply(
            jnp.asarray(q), lie.quat_exp(jnp.asarray(vel_w * FRAME_DT))))
        kq.append(q / np.linalg.norm(q))
    traj = make_knots(jnp.asarray(np.array(kt), jnp.float32),
                      jnp.asarray(np.array(kq), jnp.float32), 0.0, FRAME_DT)
    Kj = jnp.asarray(KVEC, jnp.float32)

    cfg = TrackerConfig(
        num_pyramid_levels=3,
        num_virtual_poses=(5, 5, 5),
        huber_a=10.0,
        max_chi_square_error=3.0,
        keyframe_max_flow_mag0=1e9,
        keyframe_max_flow_mag1=1e9,
        detector=DetectorOptions(score_threshold=5.0, cell_h=30, cell_w=30,
                                 max_keypoints=512),
        dtype="float32",
    )
    tracker = BlurAwareTracker(cfg, KVEC, (H, W))
    depth = np.full((H, W), DEPTH, np.float32)
    tracker.track_frame(np.asarray(img0), np.asarray(img0), 0.0, EXPOSURE,
                        depth)
    # track 2 frames so knots/velocity are realistic warm-start state
    frames = []
    for i in (1, 2, 3):
        cap = i * FRAME_DT
        b = synthesize_blurred_image(img0, traj, DEG, cap, EXPOSURE, 5,
                                     DEPTH, Kj)
        frames.append((cap, b))
        tracker.track_frame(None, np.asarray(b), cap, EXPOSURE, None)
    tracker.flush()

    knots = tracker.knots
    opts = cfg.lm_options()
    cap3 = jnp.float32(frames[-1][0])
    cur_img = frames[-1][1]

    from mba_vo_tpu.ops.image import image_pyramid
    pyr = image_pyramid(cur_img, 3)
    levels = []
    for lv in range(3):
        kf = tracker.keyframe_levels[lv]
        levels.append(res.TrackingLevelData(
            img_ref=kf["img"], grad_ref=kf["grad"],
            cur_imgs=pyr[lv][None], cap_times=cap3[None],
            exp_times=jnp.float32(EXPOSURE)[None],
            kp_xy=kf["kp_xy"], kp_z=kf["kp_z"], kp_mask=kf["kp_mask"],
            pattern=tracker.pattern, K=jnp.asarray(KVEC, jnp.float32) / 2**lv,
        ))

    # ---- timing scaffold --------------------------------------------------
    records = []

    def timed(name, fn, *args, n1=20, n2=220, traffic_bytes=None, extra=None):
        """Stage time via two-length scan differencing; fn(carry, *args) ->
        new scalar carry (must depend on carry and feed the next iter)."""
        def make(R):
            @jax.jit
            def run(*a):
                def body(c, _):
                    return fn(c, *a), None
                tot, _ = lax.scan(body, jnp.float32(0.0), None, length=R)
                return tot
            return run
        def measure(na, nb):
            ga, gb = make(na), make(nb)
            float(ga(*args)); float(gb(*args))      # compile + warm
            t0 = time.time(); float(ga(*args)); t1 = time.time()
            float(gb(*args)); t2 = time.time()
            return ((t2 - t1) - (t1 - t0)) / (nb - na)

        per = measure(n1, n2)
        if per * (n2 - n1) < 20e-3:
            # differencing noise over the remote link is ~ms-scale: small
            # stages need enough iterations that the difference is >> noise
            scale = min(
                int(np.ceil(25e-3 / max(per, 2e-6) / (n2 - n1))) + 1, 100
            )
            per = measure(n1 * scale, n2 * scale)
        rec = {"stage": name, "us": round(per * 1e6, 1)}
        if traffic_bytes:
            gbps = traffic_bytes / per / 1e9
            rec["min_traffic_GBps"] = round(gbps, 1)
            rec["hbm_roofline_frac"] = round(gbps / HBM_PEAK_GBPS, 3)
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)
        records.append(rec)
        return per

    eps = 1e-9
    P = int(tracker.pattern.shape[0])
    V = 5

    # ---- whole-frame and per-level totals ---------------------------------
    from mba_vo_tpu.tracker.blur_tracker import _frame_step
    kf_imgs = tuple(kf["img"] for kf in tracker.keyframe_levels)
    kf_grads = tuple(kf["grad"] for kf in tracker.keyframe_levels)
    kf_xy = tuple(kf["kp_xy"] for kf in tracker.keyframe_levels)
    kf_z = tuple(kf["kp_z"] for kf in tracker.keyframe_levels)
    kf_m = tuple(kf["kp_mask"] for kf in tracker.keyframe_levels)
    kf_caches = tuple(kf["wincache"] for kf in tracker.keyframe_levels)
    scal = jnp.asarray([FRAME_DT, float(cap3), EXPOSURE,
                        float(cap3) - 0.5 * EXPOSURE,
                        float(tracker.knots.dt)], jnp.float32)

    def frame_fn(c, img):
        k2, pose_cap, vel, stats, _ = _frame_step(
            jax.tree.map(lambda x: x + 0 * c, knots),
            tracker.neigh_velocity, tracker.T_prev_b2w, scal, img,
            kf_imgs, kf_grads, kf_xy, kf_z, kf_m, kf_caches,
            tracker.pattern,
            jnp.asarray(KVEC, jnp.float32), 3, (5, 5, 5), DEG, opts)
        return c + stats[2] * 1e-20, None

    def frame_wrap(c, img):
        out, _ = frame_fn(c, img)
        return out
    t_frame = timed("frame_full", frame_wrap, cur_img, n1=5, n2=55)

    # per-frame work OUTSIDE the LM levels: current-frame pyramid build,
    # constant-velocity pre-track, pose/stats post-track
    def pyr_fn(c, img):
        p = image_pyramid(img + c * 1e-20, 3)
        return c + p[-1][0, 0] * 1e-20
    timed("frame_pyramid", pyr_fn, cur_img)

    from mba_vo_tpu.tracker.blur_tracker import _post_track, _pre_track

    def prepost_fn(c, k):
        k2 = _pre_track(jax.tree.map(lambda x: x + 0 * c, k),
                        tracker.neigh_velocity, scal[0], scal[3], scal[4])
        pose_cap, vel, fl, kern = _post_track(
            k2, tracker.T_prev_b2w, scal[1], scal[0],
            kf_xy[0], kf_z[0], kf_m[0],
            jnp.asarray(KVEC, jnp.float32), scal[2], DEG)
        return c + fl * 1e-20
    timed("frame_prepost_stats", prepost_fn, knots)

    iters_per_level = []
    for lv in (2, 1, 0):
        data = levels[lv]
        N = int(data.kp_xy.shape[0])
        mask0 = jnp.ones((N,), jnp.float32)

        lvl_cache = tracker.keyframe_levels[lv]["wincache"]

        # observed LM iteration count at this level (for reconciliation)
        _, summary = lm_mod.optimize_level_jit(knots, data, V, DEG, opts)
        n_iters = int(summary.num_iterations)
        iters_per_level.append(n_iters)

        def level_fn(c, d):
            # production configuration: the keyframe window cache is passed
            # in (extracted once per keyframe, r04 hoist) — window_cache
            # below is the amortized-per-keyframe cost, NOT per frame
            k2, s = lm_mod.optimize_level(
                jax.tree.map(lambda x: x + 0 * c, knots), d, V, DEG, opts,
                cache=lvl_cache)
            return c + s.final_cost * 1e-20
        t_level = timed(f"level{lv}_full", level_fn, data, n1=5, n2=55,
                        extra={"lm_iterations": n_iters, "keypoints": N})

        # window extraction — amortized ONCE PER KEYFRAME in production
        # (process_keyframe hoist, r04); kept here as the amortized cost
        win_bytes = (N * 3 * 32 * 32 + N * 2) * 4 + data.img_ref.size * 3 * 4

        def cache_fn(c, d):
            w, s = res.prepare_window_cache(
                d._replace(kp_xy=d.kp_xy + c * eps), 32)
            return c + w[0, 0, 0, 0] * 1e-20
        timed(f"level{lv}_window_cache_per_keyframe", cache_fn, data,
              traffic_bytes=win_bytes)

        cache = res.prepare_window_cache(data, 32)
        layout0 = res.prepare_frame_layout(knots, data, V, DEG)

        def rjv(c, d, wj, use_layout):
            r, J, _ = res.compute_rjv(
                jax.tree.map(lambda x: x + 0 * c, knots), d, V, DEG, wj,
                sampling="windowed", window=32, cache=cache,
                layout=layout0 if use_layout else None)
            out = r.sum() if J is None else r.sum() + J[0, 0, 0, 0]
            return c + out * 1e-20
        # production (hoist_layout=False default): layout (anchors + pix +
        # obs gather) recomputed inside every rjv call — measured the right
        # trade at the production ~1.1 LM iterations/level (see
        # LMOptions.hoist_layout)
        t_cost = timed(f"level{lv}_rjv_cost",
                       lambda c, d: rjv(c, d, False, False), data)
        t_jac = timed(f"level{lv}_rjv_jac",
                      lambda c, d: rjv(c, d, True, False), data,
                      extra={"jacobian_overhead_us":
                             None})
        records[-1]["jacobian_overhead_us"] = round((t_jac - t_cost) * 1e6, 1)
        # A/B: the same passes with the layout hoisted out (what the
        # opt-in hoist buys per iteration when a config runs many)
        timed(f"level{lv}_rjv_cost_hoisted",
              lambda c, d: rjv(c, d, False, True), data)
        timed(f"level{lv}_rjv_jac_hoisted",
              lambda c, d: rjv(c, d, True, True), data)

        # layout decomposition: the per-sample obs gather was r04's prime
        # unattributed-suspect inside rjv (XLA scalarizes gathers on TPU)
        def layout_fn(c, d):
            pixl, vc, ob = res.prepare_frame_layout(
                jax.tree.map(lambda x: x + 0 * c, knots), d, V, DEG)
            return c + ob[0, 0, 0] * 1e-20
        timed(f"level{lv}_layout_prep", layout_fn, data)

        pix0 = layout0[0]

        def obs_fn(c, d, p):
            ob = res._current_intensity(d.cur_imgs, p + c * eps)
            return c + ob[0, 0, 0] * 1e-20
        timed(f"level{lv}_obs_gather", obs_fn, data, pix0,
              traffic_bytes=pix0.size // 2 * 4)

        r0, J0, _ = res.compute_rjv(knots, data, V, DEG, True,
                                    sampling="windowed", window=32,
                                    cache=cache)

        def asm(c, r, J, with_J):
            ev = res.assemble(r + c * eps, J if with_J else None, data,
                              opts.huber_a, mask0)
            out = ev.cost if not with_J else ev.cost + ev.hessian[0, 0]
            return c + out * 1e-20
        timed(f"level{lv}_assemble_cost",
              lambda c, r, J: asm(c, r, J, False), r0, J0)
        timed(f"level{lv}_assemble_Hg",
              lambda c, r, J: asm(c, r, J, True), r0, J0,
              traffic_bytes=r0.size * 13 * 4)

        ev0 = res.assemble(r0, J0, data, opts.huber_a, mask0)

        def solve_fn(c, Hm, g):
            H1 = Hm + jnp.diag(jnp.diag(Hm)) / jnp.float32(1e4) + c * eps
            step = lm_mod._solve(H1, g, opts.solver)
            return c + step[0] * 1e-20
        timed(f"level{lv}_solve", solve_fn, ev0.hessian, ev0.gradient)

        def outl_fn(c, pc):
            m, n = lm_mod.detect_outliers(pc + c * eps, data.kp_mask,
                                          opts.max_chi_square_error)
            return c + m[0] * 1e-20
        timed(f"level{lv}_outliers", outl_fn, ev0.patch_costs)

        # -- inside rjv: warp core and sampling core at this level's shape
        pt0, pq0 = res.sample_virtual_poses(
            knots, data.cap_times, data.exp_times, V, DEG)
        mid = V // 2
        anchors = res.patch_anchors(pt0[:, mid], pq0[:, mid], data.kp_xy,
                                    data.kp_z, data.K)
        pix = res.patch_pixel_grid(anchors, data.pattern)
        Hl, Wl = data.img_ref.shape

        def warp_fn(c, pt, pq):
            xy = frontoparallel_warp(
                pt[:, None, None, :, :] + c * eps, pq[:, None, None, :, :],
                data.kp_z[None, :, None, None], data.K,
                pix[:, :, :, None, :])
            return c + xy[0, 0, 0, 0, 0] * 1e-20
        timed(f"level{lv}_warp_core", warp_fn, pt0, pq0)

        windows, starts = cache
        ref_xy = frontoparallel_warp(
            pt0[:, None, None, :, :], pq0[:, None, None, :, :],
            data.kp_z[None, :, None, None], data.K, pix[:, :, :, None, :])
        loc = (ref_xy - starts.astype(jnp.float32)[None, :, None, None, :]
               ).transpose(1, 0, 2, 3, 4).reshape(N, P * V, 2)
        vs = in_bounds(ref_xy, Hl, Wl).transpose(1, 0, 2, 3).reshape(
            N, P * V).astype(jnp.float32)
        samp_bytes = (N * 3 * windows.shape[-1] * windows.shape[-2]
                      + N * P * V * 3 + N * P * V) * 4

        def samp_fn(c, w, l, v):
            out = sample_windows_lk(w, l + c * eps, v)
            return c + out[0, 0] * 1e-20
        timed(f"level{lv}_sampling_core", samp_fn, windows, loc, vs,
              traffic_bytes=samp_bytes)

        def poses_fn(c, k):
            pt, pq = res.sample_virtual_poses(
                jax.tree.map(lambda x: x + 0 * c, k),
                data.cap_times, data.exp_times, V, DEG)
            return c + pt[0, 0, 0] * 1e-20
        timed(f"level{lv}_virtual_poses", poses_fn, knots)

    # ---- frame-CONTEXT (chained) level timings ---------------------------
    # r04's ~745 us frame gap hypothesis: standalone level timings start
    # from the tracker's CONVERGED knots (1/3/1 LM iterations), while the
    # real frame starts from the constant-velocity _pre_track prediction and
    # each level runs MORE iterations. Chain the levels exactly as
    # _frame_step does and time each from its true input state.
    k_chain = jax.jit(_pre_track)(knots, tracker.neigh_velocity, scal[0],
                                  scal[3], scal[4])
    chained_total = 0.0
    chained_iters = []
    for lv in (2, 1, 0):
        data = levels[lv]
        lvl_cache = tracker.keyframe_levels[lv]["wincache"]

        def level_run(k, d, _c=lvl_cache):
            return lm_mod.optimize_level(k, d, V, DEG, opts, cache=_c)

        k_next, summary = jax.jit(level_run)(k_chain, data)
        n_it = int(summary.num_iterations)
        chained_iters.append(n_it)

        def level_fn_c(c, d, _k=k_chain, _c2=lvl_cache):
            k2, s = lm_mod.optimize_level(
                jax.tree.map(lambda x: x + 0 * c, _k), d, V, DEG, opts,
                cache=_c2)
            return c + s.final_cost * 1e-20
        t = timed(f"level{lv}_chained", level_fn_c, data, n1=5, n2=55,
                  extra={"lm_iterations": n_it})
        chained_total += t
        k_chain = k_next

    # ---- reconciliation summary ------------------------------------------
    model = {}
    for lv in (2, 1, 0):
        rec = {r["stage"]: r for r in records}
        it = rec[f"level{lv}_full"]["lm_iterations"]
        # per-level model (production: window cache amortized per keyframe,
        # so NOT part of the per-frame level time): initial eval (rjv_jac +
        # assemble_Hg) + it * (solve + rjv_jac + assemble_cost + outliers +
        # assemble_Hg)
        per_iter = (rec[f"level{lv}_solve"]["us"]
                    + rec[f"level{lv}_rjv_jac"]["us"]
                    + rec[f"level{lv}_assemble_cost"]["us"]
                    + rec[f"level{lv}_outliers"]["us"]
                    + rec[f"level{lv}_assemble_Hg"]["us"])
        total = (rec[f"level{lv}_rjv_jac"]["us"]
                 + rec[f"level{lv}_assemble_Hg"]["us"]
                 + it * per_iter)
        model[f"level{lv}_modeled_us"] = round(total, 1)
        model[f"level{lv}_measured_us"] = rec[f"level{lv}_full"]["us"]
    model["frame_measured_us"] = round(t_frame * 1e6, 1)
    model["levels_sum_measured_us"] = round(sum(
        r["us"] for r in records if r["stage"].endswith("_full")
        and r["stage"] != "frame_full"), 1)
    rec = {r["stage"]: r for r in records}
    model["levels_sum_chained_us"] = round(chained_total * 1e6, 1)
    model["chained_lm_iterations"] = chained_iters
    # attribution target (r05): pyramid + pre/post + chained levels must
    # explain >= 90% of frame_full
    explained = (chained_total * 1e6 + rec["frame_pyramid"]["us"]
                 + rec["frame_prepost_stats"]["us"])
    model["frame_explained_us"] = round(explained, 1)
    model["frame_attribution_frac"] = round(
        explained / max(model["frame_measured_us"], 1e-9), 3)
    print(json.dumps({"summary": model}), flush=True)

    if ARGS.out:
        import jax
        artifact = {
            "platform": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "scenario": "bench.py production config: VGA, 3 levels, 512 kp, "
                        "V=5, deg-2, windowed sampling (cached)",
            "method": "two-scan-length differencing (n2-n1 extra iterations "
                      "inside one jit with carry dependence); dispatch/link "
                      "latency cancels",
            "records": records,
            "summary": model,
        }
        with open(ARGS.out, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {ARGS.out}")


ARGS = None

if __name__ == "__main__":
    sys.path.insert(0, ".")
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    ARGS = p.parse_args()
    main()
