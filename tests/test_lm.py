"""End-to-end LM solver tests: the minimum slice — recover a known SE(3)
spline from a synthetically blurred frame (BASELINE.json configs 1-2; the
synthetic-blur oracle of generate_synthetic_data.cpp is exact ground truth).
Also units for the Ceres step-evaluator port and outlier detection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mba_vo_tpu.core import lie
from mba_vo_tpu.core.spline import make_knots, identity_knots, spline_pose_at, spline_retract
from mba_vo_tpu.data.synthetic import synthesize_blurred_image, _box_filter_1d
from mba_vo_tpu.ops import image as im
from mba_vo_tpu.ops import residual as res
from mba_vo_tpu.solver import lm

H, W = 64, 80
KMAT = jnp.asarray([60.0, 60.0, (W - 1) / 2, (H - 1) / 2])
DEPTH = 2.0
NUM_VIR = 5
DEGREE = 2
CAP, EXP = 0.05, 0.04

PATTERN = jnp.asarray(
    [[0, 0], [1, 0], [-1, 0], [0, 1], [0, -1], [1, 1], [-1, -1], [2, 0]],
    dtype=jnp.int32,
)


def smooth_texture(h, w, seed=0, passes=2):
    img = np.random.default_rng(seed).uniform(0, 255, (h, w))
    for _ in range(passes):
        img = _box_filter_1d(img, 2, 0)
        img = _box_filter_1d(img, 2, 1)
    return img


def true_knots(degree=2):
    """A degree-knot ground-truth spline whose single segment spans the
    exposure window (deg 2 = 2 knots, deg 4 = 4 knots)."""
    if degree == 2:
        kt = jnp.asarray([[0.0, 0.0, 0.0], [0.015, -0.01, 0.006]],
                         dtype=jnp.float64)
        omegas = [[0.0, 0.0, 0.0], [0.003, -0.008, 0.015]]
    else:
        kt = jnp.asarray(
            [[-0.01, 0.008, -0.004], [0.0, 0.0, 0.0],
             [0.015, -0.01, 0.006], [0.028, -0.022, 0.01]],
            dtype=jnp.float64,
        )
        omegas = [[-0.002, 0.005, -0.01], [0.0, 0.0, 0.0],
                  [0.003, -0.008, 0.015], [0.007, -0.014, 0.028]]
    kq = jnp.stack(
        [lie.quat_exp(jnp.asarray(w, dtype=jnp.float64)) for w in omegas]
    )
    return make_knots(kt, kq, CAP - 0.5 * EXP, EXP)


def make_data(knots, n_kp=40, seed=2, degree=DEGREE, caps=(CAP,)):
    img_ref = jnp.asarray(smooth_texture(H, W, seed=seed))
    blurred = jnp.stack([
        synthesize_blurred_image(
            img_ref, knots, degree, cap, EXP, NUM_VIR, DEPTH, KMAT
        )
        for cap in caps
    ])
    rng = np.random.default_rng(seed + 10)
    kp = rng.uniform([10, 10], [W - 11, H - 11], (n_kp, 2))
    return res.TrackingLevelData(
        img_ref=img_ref,
        grad_ref=im.image_gradients(img_ref),
        cur_imgs=blurred,
        cap_times=jnp.asarray(list(caps)),
        exp_times=jnp.full((len(caps),), EXP),
        kp_xy=jnp.asarray(kp),
        kp_z=jnp.full((n_kp,), DEPTH),
        kp_mask=jnp.ones((n_kp,)),
        pattern=PATTERN,
        K=KMAT,
    )


def pose_error(got, want, time, degree=DEGREE):
    pg = spline_pose_at(got, time, degree)
    pw = spline_pose_at(want, time, degree)
    dt = float(jnp.linalg.norm(pg.t - pw.t))
    dq = lie.quat_multiply(lie.quat_conjugate(pg.q), pw.q)
    dr = float(jnp.linalg.norm(lie.quat_log(dq)))
    return dt, dr


class TestRecovery:
    def test_recovers_spline_from_identity_init(self):
        """Blur-aware tracking on a synthetic blurred frame from identity
        initialization must recover the generating trajectory."""
        truth = true_knots()
        data = make_data(truth)
        init = identity_knots(2, t0=float(truth.t0), dt=float(truth.dt),
                              dtype=jnp.float64)
        opts = lm.LMOptions(huber_a=100.0, max_chi_square_error=1e9,
                            min_abs_cost_decrease=1e-7)
        out, summary = lm.optimize_level(init, data, NUM_VIR, DEGREE, opts)

        dt_mid, dr_mid = pose_error(out, truth, CAP)
        # accuracy floor is the Lucas-Kanade gradient bias on this texture:
        # ~3e-4 m at 2 m depth = ~0.01 px reprojection
        assert dt_mid < 5e-4, f"translation error {dt_mid}"
        assert dr_mid < 3e-4, f"rotation error {dr_mid}"
        assert float(summary.final_cost) < 1e-2
        assert int(summary.num_iterations) >= 2

    def test_recovers_degree4_spline_multiframe(self):
        """Cumulative-cubic (deg 4) recovery over a multi-frame window
        (the configuration the reference designs for,
        blur_aware_direct_tracker.h:43-47, <=16 frames / <=16 knots).

        Blurred frames only observe exposure-AVERAGES of the trajectory, so
        a cubic segment keeps near-gauge knot directions even with several
        frames in it (measured: 2 frames, no prior -> 7e-3 translation
        error along the flat valley). The constant-velocity knot prior the
        tracker runs in production for deg 4 (TrackerConfig.lm_options:
        weight 10.0) pins those directions; this test uses exactly that
        configuration so the solver-level and tracker-level deg-4 settings
        are one and the same."""
        degree = 4
        truth = true_knots(degree)
        caps = (CAP - 0.015, CAP, CAP + 0.015)   # u ~ 0.12, 0.5, 0.88
        data = make_data(truth, degree=degree, caps=caps)
        init = identity_knots(degree, t0=float(truth.t0), dt=float(truth.dt),
                              dtype=jnp.float64)
        opts = lm.LMOptions(huber_a=100.0, max_chi_square_error=1e9,
                            min_abs_cost_decrease=1e-9,
                            knot_prior_weight=10.0)
        out, summary = lm.optimize_level(init, data, NUM_VIR, degree, opts)

        for cap in caps:
            dt_mid, dr_mid = pose_error(out, truth, cap, degree)
            assert dt_mid < 5e-4, f"translation error {dt_mid} at {cap}"
            assert dr_mid < 3e-4, f"rotation error {dr_mid} at {cap}"
        assert float(summary.final_cost) < 1e-2

    def test_recovery_jits(self):
        truth = true_knots()
        data = make_data(truth)
        init = identity_knots(2, t0=float(truth.t0), dt=float(truth.dt),
                              dtype=jnp.float64)
        opts = lm.LMOptions(huber_a=100.0, max_chi_square_error=1e9,
                            min_abs_cost_decrease=1e-7)
        out, summary = lm.optimize_level_jit(init, data, NUM_VIR, DEGREE, opts)
        dt_mid, dr_mid = pose_error(out, truth, CAP)
        assert dt_mid < 5e-4 and dr_mid < 3e-4

    def test_at_optimum_no_divergence(self):
        """Starting at the truth must stay at the truth (first step decrease
        is below min_abs_cost_decrease -> immediate clean exit)."""
        truth = true_knots()
        data = make_data(truth)
        opts = lm.LMOptions(huber_a=100.0, max_chi_square_error=1e9)
        out, summary = lm.optimize_level(truth, data, NUM_VIR, DEGREE, opts)
        dt_mid, dr_mid = pose_error(out, truth, CAP)
        assert dt_mid < 1e-6 and dr_mid < 1e-6


class TestStepEvaluator:
    """Differential test of the Ceres evaluator port against a direct Python
    mirror of trust_region_step_evaluator.cpp."""

    class PyEvaluator:
        def __init__(self, max_steps):
            self.max_steps = max_steps

        def reset(self, cost):
            self.minimum = self.current = self.reference = self.candidate = cost
            self.acc_ref = self.acc_cand = 0.0
            self.nonmono = 0

        def quality(self, cost, mcc):
            rel = (self.current - cost) / mcc
            hist = (self.reference - cost) / (self.acc_ref + mcc)
            return max(rel, hist)

        def accepted(self, cost, mcc):
            self.current = cost
            self.acc_cand += mcc
            self.acc_ref += mcc
            if self.current < self.minimum:
                self.minimum = self.current
                self.nonmono = 0
                self.candidate = self.current
                self.acc_cand = 0.0
            else:
                self.nonmono += 1
                if self.current > self.candidate:
                    self.candidate = self.current
                    self.acc_cand = 0.0
            if self.nonmono == self.max_steps:
                self.reference = self.candidate
                self.acc_ref = self.acc_cand

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_python_mirror(self, seed):
        rng = np.random.default_rng(seed)
        init = 100.0
        st = lm._evaluator_reset(jnp.asarray(init))
        py = self.PyEvaluator(5)
        py.reset(init)
        cost = init
        for _ in range(25):
            mcc = rng.uniform(0.5, 5.0)
            cost = max(cost + rng.normal(0, 3.0) - 1.0, 1.0)
            q_jax = float(lm._step_quality(st, jnp.asarray(cost), jnp.asarray(mcc)))
            q_py = py.quality(cost, mcc)
            assert q_jax == pytest.approx(q_py, rel=1e-12)
            st = lm._step_accepted(st, jnp.asarray(cost), jnp.asarray(mcc), 5)
            py.accepted(cost, mcc)
            assert float(st.minimum_cost) == pytest.approx(py.minimum)
            assert float(st.reference_cost) == pytest.approx(py.reference)
            assert float(st.candidate_cost) == pytest.approx(py.candidate)
            assert int(st.num_nonmonotonic) == py.nonmono


class TestOutlierDetection:
    def test_flags_corrupted_keypoint(self):
        truth = true_knots()
        data = make_data(truth)
        # corrupt one keypoint's depth so its patch cost explodes
        bad_z = data.kp_z.at[7].set(0.4)
        data = data._replace(kp_z=bad_z)
        # evaluate slightly away from the optimum: at the exact truth every
        # healthy patch cost is exactly 0 and the mu/sigma statistic
        # degenerates (the reference's >=1e-8 filter has the same edge case)
        eval_at = spline_retract(
            truth, jnp.full((2, 3), 5e-4), jnp.zeros((2, 3))
        )
        ev = res.evaluate(eval_at, data, NUM_VIR, DEGREE, 1e6, data.kp_mask, False)
        mask, n_out = lm.detect_outliers(ev.patch_costs, data.kp_mask, 3.0)
        assert float(mask[7]) == 0.0
        assert int(n_out) >= 1
        # the vast majority of keypoints stay inliers
        assert float(mask.sum()) >= data.kp_mask.shape[0] - 3

    def test_uniform_costs_no_outliers(self):
        costs = jnp.full((1, 16), 0.5)
        mask, n_out = lm.detect_outliers(costs, jnp.ones(16), 3.0)
        assert int(n_out) == 0
        assert float(mask.sum()) == 16
