"""Differential tests: the windowed (MXU-contraction) sampling path must
match the direct (gather) path exactly when windows cover all samples —
values, Jacobians, and the full LM trajectory."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mba_vo_tpu.core import lie
from mba_vo_tpu.core.spline import identity_knots, make_knots, spline_retract
from mba_vo_tpu.data.synthetic import synthesize_blurred_image, _box_filter_1d
from mba_vo_tpu.ops import image as im
from mba_vo_tpu.ops import residual as res
from mba_vo_tpu.ops.window_sampling import (
    extract_windows, sample_windows_lk, stack_image_channels, window_bilinear,
)
from mba_vo_tpu.solver import lm

RNG = np.random.default_rng(51)

H, W = 64, 80
KMAT = jnp.asarray([60.0, 60.0, (W - 1) / 2, (H - 1) / 2])
DEPTH, NUM_VIR, DEGREE = 2.0, 3, 2
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


def true_knots():
    kt = jnp.asarray([[0.0, 0.0, 0.0], [0.015, -0.01, 0.006]], dtype=jnp.float64)
    kq = jnp.stack([
        jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float64),
        lie.quat_exp(jnp.asarray([0.003, -0.008, 0.015], jnp.float64)),
    ])
    return make_knots(kt, kq, CAP - 0.5 * EXP, EXP)


def make_data(knots, n_kp=24, seed=4):
    img_ref = jnp.asarray(smooth_texture(H, W, seed=seed))
    blurred = synthesize_blurred_image(
        img_ref, knots, DEGREE, CAP, EXP, NUM_VIR, DEPTH, KMAT
    )
    rng = np.random.default_rng(seed + 1)
    kp = rng.uniform([14, 14], [W - 15, H - 15], (n_kp, 2))
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


class TestWindowBilinear:
    def test_matches_bilinear_sample(self):
        img = jnp.asarray(smooth_texture(40, 48, seed=2))
        grad = im.image_gradients(img)
        chans = stack_image_channels(img, grad)
        centers = jnp.asarray([[20.0, 18.0], [30.0, 25.0]])
        windows, starts = extract_windows(chans, centers, 16)
        pts_local = jnp.asarray(RNG.uniform(1, 14, (2, 9, 2)))
        valid = jnp.ones((2, 9))
        out = window_bilinear(windows[:, :1], pts_local, valid)[:, 0]
        for n in range(2):
            for s in range(9):
                gxy = pts_local[n, s] + starts[n].astype(jnp.float64)
                want = float(im.bilinear_sample(img, gxy))
                assert float(out[n, s]) == pytest.approx(want, abs=1e-10)

    def test_out_of_window_zero(self):
        img = jnp.asarray(smooth_texture(40, 48, seed=2)) + 10.0
        grad = im.image_gradients(img)
        chans = stack_image_channels(img, grad)
        windows, starts = extract_windows(chans, jnp.asarray([[20.0, 20.0]]), 8)
        pts = jnp.asarray([[[20.0, 3.0], [-5.0, 2.0], [3.0, 3.0]]])
        out = window_bilinear(windows[:, :1], pts, jnp.ones((1, 3)))[:, 0]
        assert float(out[0, 0]) == 0.0  # beyond window
        assert float(out[0, 1]) == 0.0  # negative
        assert float(out[0, 2]) > 0.0   # inside

    def test_lk_jvp_uses_gradient_channels(self):
        img = jnp.asarray(smooth_texture(40, 48, seed=3))
        grad = im.image_gradients(img)
        chans = stack_image_channels(img, grad)
        windows, starts = extract_windows(chans, jnp.asarray([[20.0, 20.0]]), 16)
        loc = jnp.asarray([[[7.3, 6.1]]])
        valid = jnp.ones((1, 1))

        val, tang = jax.jvp(
            lambda p: sample_windows_lk(windows, p, valid),
            (loc,), (jnp.ones_like(loc) * jnp.asarray([1.0, 0.0]),),
        )
        gxy = loc[0, 0] + starts[0].astype(jnp.float64)
        want = float(im.bilinear_sample(grad[..., 0], gxy))
        assert float(tang[0, 0]) == pytest.approx(want, abs=1e-10)


class TestEquivalenceWithDirect:
    def test_residuals_and_jacobian_match(self):
        knots = true_knots()
        data = make_data(knots)
        at = spline_retract(knots, jnp.full((2, 3), 2e-3), jnp.zeros((2, 3)))

        r_d, J_d, v_d = res.compute_residuals(at, data, NUM_VIR, DEGREE, True)
        r_w, J_w, v_w = res.compute_residuals_windowed(
            at, data, NUM_VIR, DEGREE, True, window=24
        )
        np.testing.assert_array_equal(np.asarray(v_d), np.asarray(v_w))
        np.testing.assert_allclose(np.asarray(r_w), np.asarray(r_d), atol=1e-9)
        np.testing.assert_allclose(np.asarray(J_w), np.asarray(J_d), atol=1e-8)

    def test_evaluate_matches(self):
        knots = true_knots()
        data = make_data(knots)
        at = spline_retract(knots, jnp.full((2, 3), 2e-3), jnp.zeros((2, 3)))
        mask = jnp.ones(data.kp_mask.shape)
        ev_d = res.evaluate(at, data, NUM_VIR, DEGREE, 10.0, mask, True)
        ev_w = res.evaluate(at, data, NUM_VIR, DEGREE, 10.0, mask, True,
                            sampling="windowed", window=24)
        np.testing.assert_allclose(float(ev_w.cost), float(ev_d.cost), rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(ev_w.gradient), np.asarray(ev_d.gradient), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(ev_w.hessian), np.asarray(ev_d.hessian), atol=1e-8
        )

    def test_lm_recovery_windowed(self):
        knots = true_knots()
        data = make_data(knots, n_kp=40)
        init = identity_knots(2, t0=float(knots.t0), dt=float(knots.dt),
                              dtype=jnp.float64)
        opts = lm.LMOptions(huber_a=100.0, max_chi_square_error=1e9,
                            min_abs_cost_decrease=1e-7, sampling="windowed",
                            window=24)
        out, summary = lm.optimize_level(init, data, NUM_VIR, DEGREE, opts)
        from test_lm import pose_error

        dt_mid, dr_mid = pose_error(out, knots, CAP)
        assert dt_mid < 5e-4 and dr_mid < 3e-4
        assert float(summary.final_cost) < 1e-2
