"""Differential tests for the blur-aware residual / Jacobian / normal-equation
pipeline (reference analogue: the pixel-Jacobian-vs-finite-difference and
patch-H/g-vs-CPU tests, test_blur_aware_tracker_modules.cpp:502-1011).

Key oracle property: the synthetic blur generator shares the tracker's
measurement model, so at the generating knots the residual field is exactly
zero (SURVEY.md §3.5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mba_vo_tpu.core import lie
from mba_vo_tpu.core.spline import (
    SplineKnots, identity_knots, make_knots, spline_retract,
)
from mba_vo_tpu.data.synthetic import synthesize_blurred_image, _box_filter_1d
from mba_vo_tpu.ops import image as im
from mba_vo_tpu.ops import residual as res
from mba_vo_tpu.ops.warp import warp_and_sample

RNG = np.random.default_rng(11)

H, W = 64, 80
KMAT = jnp.asarray([60.0, 60.0, (W - 1) / 2, (H - 1) / 2])
DEPTH = 2.0
NUM_VIR = 3
DEGREE = 2
CAP, EXP = 0.05, 0.04

PATTERN = jnp.asarray(
    [[0, 0], [1, 0], [-1, 0], [0, 1], [0, -1], [2, 0], [0, 2], [-2, -2]],
    dtype=jnp.int32,
)


def smooth_texture(h, w, seed=0, passes=3):
    img = np.random.default_rng(seed).uniform(0, 255, (h, w))
    for _ in range(passes):
        img = _box_filter_1d(img, 2, 0)
        img = _box_filter_1d(img, 2, 1)
    return img


def true_knots(dtype=jnp.float64):
    kt = jnp.asarray([[0.0, 0.0, 0.0], [0.02, -0.012, 0.008]], dtype=dtype)
    kq = jnp.stack(
        [
            jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=dtype),
            lie.quat_exp(jnp.asarray([0.004, -0.01, 0.02], dtype=dtype)),
        ]
    )
    # spline spans exactly the exposure window [cap - exp/2, cap + exp/2]
    return make_knots(kt, kq, CAP - 0.5 * EXP, EXP)


def build_level_data(knots, n_kp=24, seed=4):
    img_ref = jnp.asarray(smooth_texture(H, W, seed=seed))
    blurred = synthesize_blurred_image(
        img_ref, knots, DEGREE, CAP, EXP, NUM_VIR, DEPTH, KMAT
    )
    rng = np.random.default_rng(seed + 1)
    kp = rng.uniform([8, 8], [W - 9, H - 9], (n_kp, 2))
    return res.TrackingLevelData(
        img_ref=img_ref,
        grad_ref=im.image_gradients(img_ref),
        cur_imgs=blurred[None],
        cap_times=jnp.asarray([CAP]),
        exp_times=jnp.asarray([EXP]),
        kp_xy=jnp.asarray(kp),
        kp_z=jnp.full((n_kp,), DEPTH),
        kp_mask=jnp.ones((n_kp,)),
        pattern=PATTERN,
        K=KMAT,
    )


class TestOracleProperty:
    def test_zero_residual_at_true_knots(self):
        knots = true_knots()
        data = build_level_data(knots)
        r, _, valid = res.compute_residuals(knots, data, NUM_VIR, DEGREE, False)
        r = np.asarray(r)[np.asarray(valid)]
        assert np.abs(r).max() < 1e-8

    def test_nonzero_residual_at_wrong_knots(self):
        knots = true_knots()
        data = build_level_data(knots)
        wrong = spline_retract(
            knots,
            jnp.asarray([[0.01, 0.0, 0.0], [0.01, 0.0, 0.0]]),
            jnp.zeros((2, 3)),
        )
        r, _, valid = res.compute_residuals(wrong, data, NUM_VIR, DEGREE, False)
        assert np.abs(np.asarray(r)[np.asarray(valid)]).max() > 0.1


class TestJacobianFactorization:
    """The factorized J (per-pose intensity gradient x pose-to-knot chain)
    must equal direct autodiff through the same LK sampling chain."""

    def test_factorized_matches_autodiff(self):
        knots = true_knots()
        data = build_level_data(knots)
        r0, J, valid = res.compute_residuals(knots, data, NUM_VIR, DEGREE, True)
        K = knots.num_knots

        def residual_direct(step):
            # NOTE: with_jacobian=False — the cost-only path samples through
            # sample_lk first-order, so jacfwd applies the LK custom JVP. The
            # with_jacobian=True value output is second-order through the
            # custom rule (value_and_grad), whose primal falls back to raw
            # bilinear derivatives — not the convention under test.
            k = spline_retract(
                knots,
                step[: 3 * K].reshape(K, 3),
                step[3 * K :].reshape(K, 3),
            )
            r, _, _ = res.compute_residuals(k, data, NUM_VIR, DEGREE, False)
            return r

        J_direct = jax.jacfwd(residual_direct)(jnp.zeros(6 * K))
        np.testing.assert_allclose(
            np.asarray(J), np.asarray(J_direct), atol=1e-9,
            err_msg="factorized Jacobian != end-to-end autodiff Jacobian",
        )

    def test_jacobian_vs_finite_difference(self):
        """LK-convention J approximates true FD on a *smooth* image (the
        reference's numeric check uses the locally-linear ((r+c) mod 255)
        fixture for the same reason, test_blur_aware_tracker_modules.cpp:69-81,
        768-892). On low-curvature images the central-difference gradient and
        the interpolant derivative agree to O(1/lambda^2)."""
        ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
        smooth = (
            128.0
            + 60.0 * np.sin(xs / 7.0) * np.cos(ys / 9.0)
            + 40.0 * np.sin(xs / 13.0 + ys / 11.0)
        )
        knots = true_knots()
        data = build_level_data(knots)
        img = jnp.asarray(smooth)
        blurred = synthesize_blurred_image(
            img, knots, DEGREE, CAP, EXP, NUM_VIR, DEPTH, KMAT
        )
        data = data._replace(
            img_ref=img, grad_ref=im.image_gradients(img), cur_imgs=blurred[None]
        )
        _, J, valid = res.compute_residuals(knots, data, NUM_VIR, DEGREE, True)
        K, eps = knots.num_knots, 1e-5

        def residuals_at(step):
            k = spline_retract(
                knots, step[: 3 * K].reshape(K, 3), step[3 * K:].reshape(K, 3)
            )
            r, _, _ = res.compute_residuals(k, data, NUM_VIR, DEGREE, False)
            return np.asarray(r)

        for col in [0, 2, 4, 7, 9]:
            step = np.zeros(6 * K)
            step[col] = eps
            fd = (residuals_at(jnp.asarray(step)) - residuals_at(jnp.asarray(-step))) / (2 * eps)
            got = np.asarray(J[..., col])
            mask = np.asarray(valid)
            denom = max(np.abs(fd[mask]).max(), 1.0)
            # LK central-difference vs interpolant derivative differ by
            # O(1/lambda^2) ~ 2% at the fixture's shortest wavelength (7 px)
            assert np.abs(got[mask] - fd[mask]).max() / denom < 0.03, f"col {col}"


class TestNormalEquations:
    def test_gradient_matches_autodiff_of_cost(self):
        knots = true_knots()
        data = build_level_data(knots)
        # evaluate away from the optimum so Huber and gradients are nontrivial
        knots_off = spline_retract(
            knots,
            jnp.asarray([[0.004, -0.002, 0.0], [0.0, 0.003, 0.001]]),
            jnp.asarray([[0.002, 0.0, -0.001], [0.0, 0.001, 0.0]]),
        )
        huber_a = 5.0
        mask = jnp.ones(data.kp_mask.shape)
        ev = res.evaluate(knots_off, data, NUM_VIR, DEGREE, huber_a, mask, True)
        K = knots.num_knots

        def cost_fn(step):
            k = spline_retract(
                knots_off, step[: 3 * K].reshape(K, 3), step[3 * K:].reshape(K, 3)
            )
            r, _, _ = res.compute_residuals(k, data, NUM_VIR, DEGREE, False)
            rho, _ = res.huber_weights(r, huber_a)
            n = data.kp_mask.sum() * 1 * PATTERN.shape[0]
            return jnp.sum(rho * data.kp_mask[None, :, None]) / n

        g_auto = jax.grad(cost_fn)(jnp.zeros(6 * K))
        np.testing.assert_allclose(
            np.asarray(ev.gradient), np.asarray(g_auto), atol=1e-9
        )
        # cost agrees too
        assert float(ev.cost) == pytest.approx(float(cost_fn(jnp.zeros(6 * K))), abs=1e-12)

    def test_hessian_is_gauss_newton(self):
        knots = true_knots()
        data = build_level_data(knots)
        mask = jnp.ones(data.kp_mask.shape)
        ev = res.evaluate(knots, data, NUM_VIR, DEGREE, 5.0, mask, True)
        Hm = np.asarray(ev.hessian)
        assert Hm.shape == (12, 12)
        np.testing.assert_allclose(Hm, Hm.T, atol=1e-12)
        assert np.all(np.linalg.eigvalsh(Hm) > -1e-9)

    def test_outlier_mask_removes_keypoints(self):
        knots = true_knots()
        data = build_level_data(knots)
        mask = jnp.ones(data.kp_mask.shape).at[:5].set(0.0)
        ev_masked = res.evaluate(knots, data, NUM_VIR, DEGREE, 5.0, mask, True)
        # residuals are ~0 at truth; perturb to get nonzero structure
        off = spline_retract(knots, jnp.full((2, 3), 0.003), jnp.zeros((2, 3)))
        ev_all = res.evaluate(off, data, NUM_VIR, DEGREE, 5.0,
                              jnp.ones(data.kp_mask.shape), True)
        ev_m = res.evaluate(off, data, NUM_VIR, DEGREE, 5.0, mask, True)
        assert not np.allclose(np.asarray(ev_all.hessian), np.asarray(ev_m.hessian))
        # patch costs are reported for all keypoints regardless of mask
        assert np.asarray(ev_m.patch_costs).shape == (1, data.kp_mask.shape[0])

    def test_gauss_newton_step_reduces_cost(self):
        """One damped GN step from a perturbed start must reduce the cost —
        the minimal end-to-end solver sanity check."""
        knots = true_knots()
        data = build_level_data(knots)
        start = spline_retract(
            knots,
            jnp.asarray([[0.005, -0.003, 0.002], [-0.004, 0.002, 0.0]]),
            jnp.asarray([[0.003, 0.002, -0.004], [0.002, -0.003, 0.001]]),
        )
        mask = jnp.ones(data.kp_mask.shape)
        ev = res.evaluate(start, data, NUM_VIR, DEGREE, 20.0, mask, True)
        Hd = ev.hessian + jnp.diag(jnp.diag(ev.hessian)) * 1e-4
        step = -jnp.linalg.solve(Hd, ev.gradient)
        from mba_vo_tpu.core.spline import spline_retract_flat

        moved = spline_retract_flat(start, step)
        ev2 = res.evaluate(moved, data, NUM_VIR, DEGREE, 20.0, mask, False)
        assert float(ev2.cost) < 0.7 * float(ev.cost)


class TestAffineCorrect:
    """ops.residual.affine_correct: closed-form per-frame gain/bias
    elimination (the photometric extension the reference's pure-intensity
    model cannot express, compute_pixel_intensity.h:26-72)."""

    def test_exact_affine_disturbance_is_eliminated(self):
        rng = np.random.default_rng(0)
        pred = jnp.asarray(rng.uniform(0, 255, (2, 40, 8)))
        valid = jnp.asarray(rng.uniform(0, 1, (2, 40, 8)) > 0.2)
        # obs = (pred - b_f) / a_f per frame -> the fit recovers (a, b)
        # exactly and the residual vanishes on valid samples
        a = jnp.asarray([1.3, 0.8])[:, None, None]
        b = jnp.asarray([12.0, -7.0])[:, None, None]
        obs = (pred - b) / a
        r = res.affine_correct(pred, obs, valid)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-9)

    def test_matches_least_squares_optimum(self):
        """The residual must equal pred - a*obs - b at the per-frame
        least-squares (a, b) — checked against numpy lstsq."""
        rng = np.random.default_rng(1)
        pred = jnp.asarray(rng.normal(128, 30, (1, 60, 8)))
        obs = jnp.asarray(rng.normal(128, 30, (1, 60, 8)))
        valid = jnp.ones((1, 60, 8), bool)
        r = np.asarray(res.affine_correct(pred, obs, valid))
        x = np.asarray(obs).ravel()
        y = np.asarray(pred).ravel()
        A = np.stack([x, np.ones_like(x)], axis=1)
        (a, b), *_ = np.linalg.lstsq(A, y, rcond=None)
        np.testing.assert_allclose(r.ravel(), y - a * x - b, atol=1e-8)
        # eliminating (a, b) can only reduce the residual energy
        assert (r ** 2).sum() <= ((y - x) ** 2).sum() + 1e-9

    def test_degenerate_textureless_frame_falls_back(self):
        """Constant obs (zero variance): the fit is ill-posed; the
        residual must fall back to (a, b) = (1, 0) — the uncorrected
        difference — instead of NaN."""
        pred = jnp.asarray(np.linspace(0, 255, 16).reshape(1, 2, 8))
        obs = jnp.full((1, 2, 8), 100.0)
        valid = jnp.ones((1, 2, 8), bool)
        r = np.asarray(res.affine_correct(pred, obs, valid))
        np.testing.assert_allclose(r, np.asarray(pred) - 100.0, atol=1e-12)

    def test_invalid_samples_excluded_and_zeroed(self):
        rng = np.random.default_rng(2)
        pred = jnp.asarray(rng.uniform(0, 255, (1, 30, 8)))
        obs = pred * 0.9 + 5.0
        valid = jnp.asarray(rng.uniform(0, 1, (1, 30, 8)) > 0.5)
        # corrupt the INVALID samples wildly: they must affect nothing
        obs = jnp.where(valid, obs, 1e6)
        r = res.affine_correct(pred, obs, valid)
        np.testing.assert_allclose(np.asarray(r)[np.asarray(valid)], 0.0,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(r)[~np.asarray(valid)], 0.0)
