"""Multi-frame blur-aware optimization: several blurred frames constrain one
spline jointly, with exposures in different knot segments — exercising the
global-knot-tangent design that replaces the reference's per-frame
merge/scatter-add (merge_hessian_gradient_cost.cpp). The reference allocates
for up to 16 frames (blur_aware_direct_tracker.h:43) but its absent app layer
never drives more than one."""

import jax.numpy as jnp
import numpy as np
import pytest

from mba_vo_tpu.core import lie
from mba_vo_tpu.core.spline import (
    identity_knots, make_knots, spline_pose_at, spline_retract,
)
from mba_vo_tpu.data.synthetic import synthesize_blurred_image, _box_filter_1d
from mba_vo_tpu.ops import image as im
from mba_vo_tpu.ops import residual as res
from mba_vo_tpu.solver import lm

H, W = 64, 80
KMAT = jnp.asarray([60.0, 60.0, (W - 1) / 2, (H - 1) / 2])
DEPTH, NUM_VIR, DEGREE = 2.0, 3, 2
EXP = 0.04
CAPS = [0.05, 0.15]     # two frames, exposures inside different segments
N_KNOTS = 3             # knots at 0.03, 0.13, 0.23
T0, DT = 0.03, 0.1


def smooth_texture(h, w, seed=0, passes=2):
    img = np.random.default_rng(seed).uniform(0, 255, (h, w))
    for _ in range(passes):
        img = _box_filter_1d(img, 2, 0)
        img = _box_filter_1d(img, 2, 1)
    return img


def true_knots():
    kt = jnp.asarray(
        [[0.0, 0.0, 0.0], [0.012, -0.008, 0.005], [0.022, -0.015, 0.009]],
        dtype=jnp.float64,
    )
    qs = [jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float64)]
    qs.append(lie.quat_exp(jnp.asarray([0.004, -0.006, 0.012], jnp.float64)))
    qs.append(lie.quat_exp(jnp.asarray([0.007, -0.011, 0.022], jnp.float64)))
    return make_knots(kt, jnp.stack(qs), T0, DT)


def make_data(knots, n_kp=32, seed=6):
    img_ref = jnp.asarray(smooth_texture(H, W, seed=seed))
    blurred = jnp.stack(
        [
            synthesize_blurred_image(
                img_ref, knots, DEGREE, cap, EXP, NUM_VIR, DEPTH, KMAT
            )
            for cap in CAPS
        ]
    )
    rng = np.random.default_rng(seed + 1)
    kp = rng.uniform([10, 10], [W - 11, H - 11], (n_kp, 2))
    return res.TrackingLevelData(
        img_ref=img_ref,
        grad_ref=im.image_gradients(img_ref),
        cur_imgs=blurred,
        cap_times=jnp.asarray(CAPS),
        exp_times=jnp.full((2,), EXP),
        kp_xy=jnp.asarray(kp),
        kp_z=jnp.full((n_kp,), DEPTH),
        kp_mask=jnp.ones((n_kp,)),
        pattern=jnp.asarray(
            [[0, 0], [1, 0], [-1, 0], [0, 1], [0, -1], [1, 1], [-1, -1], [2, 0]],
            dtype=jnp.int32,
        ),
        K=KMAT,
    )


class TestMultiFrame:
    def test_zero_residual_at_truth(self):
        truth = true_knots()
        data = make_data(truth)
        r, _, valid = res.compute_residuals(truth, data, NUM_VIR, DEGREE, False)
        assert np.abs(np.asarray(r)[np.asarray(valid)]).max() < 1e-8

    def test_jacobian_spans_both_segments(self):
        """Frame 0 (exposure in segment 0) must produce nonzero Jacobian for
        knots 0-1 only; frame 1 (segment 1) for knots 1-2 only — the global
        indexing the reference achieves via per-frame scatter-add."""
        truth = true_knots()
        data = make_data(truth)
        _, J, valid = res.compute_residuals(truth, data, NUM_VIR, DEGREE, True)
        J = np.asarray(J)  # [2, N, P, 18]
        K = 3

        def knot_energy(frame, knot):
            cols_t = slice(3 * knot, 3 * knot + 3)
            cols_w = slice(3 * K + 3 * knot, 3 * K + 3 * knot + 3)
            return (
                np.abs(J[frame, ..., cols_t]).max()
                + np.abs(J[frame, ..., cols_w]).max()
            )

        assert knot_energy(0, 0) > 1e-6
        assert knot_energy(0, 1) > 1e-6
        assert knot_energy(0, 2) < 1e-12, "frame 0 must not touch knot 2"
        assert knot_energy(1, 1) > 1e-6
        assert knot_energy(1, 2) > 1e-6
        assert knot_energy(1, 0) < 1e-12, "frame 1 must not touch knot 0"

    def test_joint_recovery(self):
        """LM over both frames jointly recovers all three knots."""
        truth = true_knots()
        data = make_data(truth)
        init = identity_knots(N_KNOTS, t0=T0, dt=DT, dtype=jnp.float64)
        opts = lm.LMOptions(huber_a=100.0, max_chi_square_error=1e9,
                            min_abs_cost_decrease=1e-7)
        out, summary = lm.optimize_level(init, data, NUM_VIR, DEGREE, opts)
        assert float(summary.final_cost) < 1e-2
        for cap in CAPS:
            pg = spline_pose_at(out, cap, DEGREE)
            pw = spline_pose_at(truth, cap, DEGREE)
            dt_err = float(jnp.linalg.norm(pg.t - pw.t))
            dq = lie.quat_multiply(lie.quat_conjugate(pg.q), pw.q)
            dr_err = float(jnp.linalg.norm(lie.quat_log(dq)))
            assert dt_err < 1e-3, f"cap {cap}: {dt_err}"
            assert dr_err < 1e-3, f"cap {cap}: {dr_err}"
