"""Dynamic (scene-flow) landmark tests: the dense Point3dDynamic analogue
(Point3dDynamic.h:1-90) — constant-velocity moving points recovered from
multi-frame observations, and motion-status classification."""

import jax.numpy as jnp
import numpy as np
import pytest

import np_ref as ref
from mba_vo_tpu.backend.dynamic_points import (
    MOTION_DYNAMIC,
    MOTION_STATIC,
    classify_motion,
    dynamic_reprojection_residuals,
    fit_scene_flow,
    make_dynamic_points,
    position_at,
)

K = jnp.asarray([400.0, 400.0, 320.0, 240.0])
T_FRAMES = 6


def _scene(seed=0, n_static=24, n_dyn=8):
    """Cameras on a small arc; static cloud + constant-velocity movers.
    Returns (truth X0, truth flow, cam_t, cam_q, times, obs_xy, obs_mask)."""
    rng = np.random.default_rng(seed)
    M = n_static + n_dyn
    X0 = np.stack([rng.uniform(-1.5, 1.5, M), rng.uniform(-1, 1, M),
                   rng.uniform(3, 6, M)], axis=-1)
    flow = np.zeros((M, 3))
    flow[n_static:] = rng.uniform(-0.4, 0.4, (n_dyn, 3))

    times = np.arange(T_FRAMES) * 0.1
    cam_t = np.stack([np.array([0.12 * i, 0.02 * i, 0.0])
                      for i in range(T_FRAMES)])
    cam_q = np.stack([ref.qexp(np.array([0.0, 0.015, 0.0]) * i)
                      for i in range(T_FRAMES)])

    obs = np.zeros((T_FRAMES, M, 2))
    for i in range(T_FRAMES):
        X = X0 + flow * times[i]
        R = ref.qmat(cam_q[i])
        Pc = (X - cam_t[i]) @ R
        obs[i, :, 0] = Pc[:, 0] / Pc[:, 2] * float(K[0]) + float(K[2])
        obs[i, :, 1] = Pc[:, 1] / Pc[:, 2] * float(K[1]) + float(K[3])
    mask = np.ones((T_FRAMES, M))
    return (X0, flow, jnp.asarray(cam_t), jnp.asarray(cam_q),
            jnp.asarray(times), jnp.asarray(obs), jnp.asarray(mask))


class TestDynamicPoints:
    def test_zero_residual_at_truth(self):
        X0, flow, cam_t, cam_q, times, obs, mask = _scene()
        pts = make_dynamic_points(X0, 0.0, flow=flow)
        r = dynamic_reprojection_residuals(pts, cam_t, cam_q, times, obs,
                                           mask, K)
        assert float(jnp.abs(r).max()) < 1e-9

    def test_position_at_linear_model(self):
        X0, flow, *_ = _scene()
        pts = make_dynamic_points(X0, 0.5, flow=flow)
        X = position_at(pts, jnp.asarray([0.5, 1.5]))
        np.testing.assert_allclose(np.asarray(X[0]), X0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(X[1]), X0 + flow, atol=1e-12)

    def _curved_scene(self, seed=0, M=32):
        """Curved (sinusoidal) camera path: a LINEAR camera path makes
        constant-velocity points structurally ambiguous — any line meeting
        all the observation rays reprojects exactly (the camera path itself
        is one such transversal) — so exact recovery needs path curvature."""
        rng = np.random.default_rng(seed)
        X0 = np.stack([rng.uniform(-1.5, 1.5, M), rng.uniform(-1, 1, M),
                       rng.uniform(3, 6, M)], axis=-1)
        flow = rng.uniform(-0.4, 0.4, (M, 3))
        times = np.arange(T_FRAMES) * 0.1
        cam_t = np.stack([
            np.array([0.3 * np.sin(1.3 * i), 0.25 * np.cos(0.9 * i) - 0.25,
                      0.1 * np.sin(0.7 * i)])
            for i in range(T_FRAMES)
        ])
        cam_q = np.stack([
            ref.qexp(np.array([0.02 * np.sin(i), 0.03 * i,
                               0.01 * np.cos(i)]))
            for i in range(T_FRAMES)
        ])
        obs = np.zeros((T_FRAMES, M, 2))
        for i in range(T_FRAMES):
            X = X0 + flow * times[i]
            R = ref.qmat(cam_q[i])
            Pc = (X - cam_t[i]) @ R
            obs[i, :, 0] = Pc[:, 0] / Pc[:, 2] * float(K[0]) + float(K[2])
            obs[i, :, 1] = Pc[:, 1] / Pc[:, 2] * float(K[1]) + float(K[3])
        mask = np.ones((T_FRAMES, M))
        return (X0, flow, jnp.asarray(cam_t), jnp.asarray(cam_q),
                jnp.asarray(times), jnp.asarray(obs), jnp.asarray(mask))

    def test_fit_recovers_points_and_flow(self):
        X0, flow, cam_t, cam_q, times, obs, mask = self._curved_scene()
        rng = np.random.default_rng(3)
        pts0 = make_dynamic_points(
            X0 + rng.normal(0, 0.05, X0.shape), 0.0,
            flow=flow + rng.normal(0, 0.05, flow.shape),
        )
        fitted = fit_scene_flow(pts0, cam_t, cam_q, times, obs, mask, K,
                                iterations=25)
        np.testing.assert_allclose(np.asarray(fitted.points), X0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(fitted.flow), flow, atol=1e-6)

    def test_fit_explains_observations_on_degenerate_path(self):
        """On the (near-linear) arc scene the individual (X0, v) are NOT
        uniquely observable — the guarantee is that the fitted model
        explains the observations exactly."""
        X0, flow, cam_t, cam_q, times, obs, mask = _scene()
        rng = np.random.default_rng(3)
        pts0 = make_dynamic_points(
            X0 + rng.normal(0, 0.05, X0.shape), 0.0,
            flow=flow + rng.normal(0, 0.05, flow.shape),
        )
        fitted = fit_scene_flow(pts0, cam_t, cam_q, times, obs, mask, K,
                                iterations=15)
        r = dynamic_reprojection_residuals(fitted, cam_t, cam_q, times, obs,
                                           mask, K)
        assert float(jnp.abs(r).max()) < 1e-6

    def test_motion_classification(self):
        X0, flow, cam_t, cam_q, times, obs, mask = _scene()
        pts = make_dynamic_points(X0, 0.0, flow=flow)
        out = classify_motion(pts, cam_t, cam_q, times, obs, mask, K)
        status = np.asarray(out.status)
        np.testing.assert_array_equal(status[:24], MOTION_STATIC)
        np.testing.assert_array_equal(status[24:], MOTION_DYNAMIC)

    def test_masked_slots_inert(self):
        X0, flow, cam_t, cam_q, times, obs, mask = _scene()
        pmask = np.ones(X0.shape[0])
        pmask[5] = 0.0
        pts = make_dynamic_points(X0 + 7.0, 0.0, flow=flow,
                                  mask=jnp.asarray(pmask))
        fitted = fit_scene_flow(pts, cam_t, cam_q, times, obs, mask, K,
                                iterations=3)
        # dead slot unchanged
        np.testing.assert_allclose(np.asarray(fitted.points[5]),
                                   X0[5] + 7.0, atol=1e-12)
