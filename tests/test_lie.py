"""Differential tests for the Lie-group core against NumPy float64 oracles
plus autodiff finite-difference checks (mechanizing the reference's
analytic-vs-numeric Jacobian tests, test_blur_aware_tracker_modules.cpp:154-180).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

import np_ref as ref
from mba_vo_tpu.core import lie


RNG = np.random.default_rng(42)


def rand_quats(n):
    q = RNG.standard_normal((n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestQuaternionAlgebra:
    def test_multiply_matches_oracle(self):
        qs, ps = rand_quats(32), rand_quats(32)
        got = np.asarray(lie.quat_multiply(jnp.asarray(qs), jnp.asarray(ps)))
        want = np.stack([ref.qmul(a, b) for a, b in zip(qs, ps)])
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_rotate_matches_matrix(self):
        qs = rand_quats(32)
        vs = RNG.standard_normal((32, 3))
        got = np.asarray(lie.quat_rotate(jnp.asarray(qs), jnp.asarray(vs)))
        want = np.stack([ref.qmat(q) @ v for q, v in zip(qs, vs)])
        np.testing.assert_allclose(got, want, atol=1e-10)

    def test_to_matrix(self):
        qs = rand_quats(8)
        got = np.asarray(lie.quat_to_matrix(jnp.asarray(qs)))
        want = np.stack([ref.qmat(q) for q in qs])
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_conjugate_inverse(self):
        qs = rand_quats(8)
        prod = lie.quat_multiply(jnp.asarray(qs), lie.quat_conjugate(jnp.asarray(qs)))
        want = np.tile([0.0, 0.0, 0.0, 1.0], (8, 1))
        np.testing.assert_allclose(np.asarray(prod), want, atol=1e-12)


class TestLogExp:
    def test_exp_log_roundtrip(self):
        qs = rand_quats(64)
        back = lie.quat_exp(lie.quat_log(jnp.asarray(qs)))
        np.testing.assert_allclose(np.asarray(back), qs, atol=1e-9)

    def test_log_exp_roundtrip_small_and_large(self):
        omegas = np.concatenate(
            [
                RNG.standard_normal((16, 3)) * 1e-8,
                RNG.standard_normal((16, 3)) * 0.5,
                RNG.standard_normal((16, 3)) * 2.5,
            ]
        )
        # keep |omega| < 2*pi so log is the principal branch
        back = lie.quat_log(lie.quat_exp(jnp.asarray(omegas)))
        np.testing.assert_allclose(np.asarray(back), omegas, atol=1e-8)

    def test_log_matches_oracle(self):
        qs = rand_quats(64)
        got = np.asarray(lie.quat_log(jnp.asarray(qs)))
        want = np.stack([ref.qlog(q) for q in qs])
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_exp_matches_oracle(self):
        omegas = RNG.standard_normal((32, 3))
        got = np.asarray(lie.quat_exp(jnp.asarray(omegas)))
        want = np.stack([ref.qexp(w) for w in omegas])
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_exp_grads(self):
        omega = jnp.asarray(RNG.standard_normal(3))
        check_grads(lie.quat_exp, (omega,), order=2, atol=1e-3, rtol=1e-3)
        # near-zero branch
        check_grads(
            lie.quat_exp, (jnp.asarray([1e-7, -2e-7, 1e-7]),), order=1,
            atol=1e-5, rtol=1e-5,
        )

    def test_log_grads(self):
        q = jnp.asarray(ref.qnorm(np.array([0.2, -0.1, 0.3, 0.9])))
        check_grads(lie.quat_log, (q,), order=2, atol=1e-3, rtol=1e-3)

    def test_log_grad_near_identity_finite(self):
        q = jnp.asarray([1e-9, 0.0, -1e-9, 1.0])
        jac = jax.jacobian(lie.quat_log)(q)
        assert np.all(np.isfinite(np.asarray(jac)))
        # d log / d xyz at identity is 2*I (lambda = 2/w)
        np.testing.assert_allclose(np.asarray(jac)[:, :3], 2 * np.eye(3), atol=1e-6)


class TestSE3:
    def test_exp_matches_oracle(self):
        tangents = RNG.standard_normal((32, 6))
        t_got, q_got = lie.se3_exp(jnp.asarray(tangents))
        for i, tau in enumerate(tangents):
            t_want, q_want = ref.se3_exp(tau)
            np.testing.assert_allclose(np.asarray(t_got[i]), t_want, atol=1e-10)
            np.testing.assert_allclose(np.asarray(q_got[i]), q_want, atol=1e-10)

    def test_log_roundtrip(self):
        tangents = RNG.standard_normal((32, 6)) * 0.8
        t, q = lie.se3_exp(jnp.asarray(tangents))
        back = lie.se3_log(t, q)
        np.testing.assert_allclose(np.asarray(back), tangents, atol=1e-9)

    def test_pure_translation(self):
        tau = jnp.asarray([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])
        t, q = lie.se3_exp(tau)
        np.testing.assert_allclose(np.asarray(t), [1, 2, 3], atol=1e-12)
        np.testing.assert_allclose(np.asarray(q), [0, 0, 0, 1], atol=1e-12)

    def test_exp_grads(self):
        tau = jnp.asarray(RNG.standard_normal(6) * 0.5)
        check_grads(lie.se3_exp, (tau,), order=1, atol=1e-5, rtol=1e-5)

    def test_small_angle_V_finite(self):
        tau = jnp.asarray([0.5, -0.2, 0.1, 1e-9, 1e-9, -1e-9])
        t, q = lie.se3_exp(tau)
        assert np.all(np.isfinite(np.asarray(t)))
        np.testing.assert_allclose(np.asarray(t), [0.5, -0.2, 0.1], atol=1e-8)


class TestFloat32Stability:
    """The TPU path runs float32; branch thresholds must keep it finite."""

    @pytest.mark.parametrize("scale", [0.0, 1e-8, 1e-5, 1e-3, 1.0])
    def test_exp_log_f32(self, scale):
        omega = (RNG.standard_normal((8, 3)) * scale).astype(np.float32)
        q = lie.quat_exp(jnp.asarray(omega))
        assert q.dtype == jnp.float32
        back = lie.quat_log(q)
        assert np.all(np.isfinite(np.asarray(back)))
        np.testing.assert_allclose(np.asarray(back), omega, atol=5e-6)

    def test_grad_f32_finite(self):
        omega = jnp.asarray([1e-6, 0.0, -1e-6], dtype=jnp.float32)
        jac = jax.jacobian(lie.quat_exp)(omega)
        assert np.all(np.isfinite(np.asarray(jac)))
