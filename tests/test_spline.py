"""Differential tests for the SE(3) B-spline against the NumPy oracle and
finite differences (reference analogue: GPU spline interpolation vs
SplineSE3::GetPose, test_blur_aware_tracker_modules.cpp:183-342)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

import np_ref as ref
from mba_vo_tpu.core import spline as sp
from mba_vo_tpu.core import lie
from mba_vo_tpu.core.transform import Pose


@pytest.fixture(params=[2, 4], ids=["deg2", "deg4"])
def degree(request):
    return request.param


@pytest.fixture
def fixture_spline():
    kt, kq, t0, dt = ref.make_test_spline(num_knots=7, dt=0.1, seed=3)
    knots = sp.make_knots(jnp.asarray(kt), jnp.asarray(kq), t0, dt)
    return knots, (kt, kq, t0, dt)


class TestInterpolation:
    def test_pose_matches_oracle(self, fixture_spline, degree):
        knots, (kt, kq, t0, dt) = fixture_spline
        # times spread over every valid segment, incl. segment boundaries
        tmax = t0 + (7 - degree) * dt
        times = np.linspace(t0, tmax - 1e-9, 23)
        pose = sp.spline_pose_at_times(knots, jnp.asarray(times), degree)
        for i, time in enumerate(times):
            t_want, q_want = ref.spline_pose(kt, kq, t0, dt, degree, time)
            np.testing.assert_allclose(np.asarray(pose.t[i]), t_want, atol=1e-9)
            np.testing.assert_allclose(np.asarray(pose.q[i]), q_want, atol=1e-9)

    def test_interpolates_knots_deg2(self, fixture_spline):
        """Degree-2 spline passes exactly through its knots."""
        knots, (kt, kq, t0, dt) = fixture_spline
        for i in range(6):
            p = sp.spline_pose_at(knots, t0 + i * dt, 2)
            np.testing.assert_allclose(np.asarray(p.t), kt[i], atol=1e-9)
            np.testing.assert_allclose(np.asarray(p.q), kq[i], atol=1e-9)

    def test_continuity_across_segments(self, fixture_spline, degree):
        knots, _ = fixture_spline
        eps = 1e-7
        t_knot = 0.2  # interior segment boundary
        a = sp.spline_pose_at(knots, t_knot - eps, degree)
        b = sp.spline_pose_at(knots, t_knot + eps, degree)
        np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t), atol=1e-5)
        dq = lie.quat_multiply(lie.quat_conjugate(a.q), b.q)
        np.testing.assert_allclose(np.asarray(dq), [0, 0, 0, 1], atol=1e-5)

    def test_segment_lookup(self):
        idx, u = sp.spline_segment_start_and_u(0.37, 0.0, 0.1, 7, 2)
        assert int(idx) == 3
        np.testing.assert_allclose(float(u), 0.7, atol=1e-12)


class TestJacobians:
    """Autodiff through the retraction replaces the reference's hand-derived
    4x(3k) local-parameterization chain rules (SplineFunctor.h:155-365)."""

    def test_pose_jacobian_vs_fd(self, fixture_spline, degree):
        knots, _ = fixture_spline
        time = 0.234

        def pose_fn(delta_t, delta_o):
            k = sp.spline_retract(knots, delta_t, delta_o)
            p = sp.spline_pose_at(k, time, degree)
            return jnp.concatenate([p.t, p.q])

        z = jnp.zeros((7, 3))
        check_grads(pose_fn, (z, z), order=1, modes=["fwd", "rev"],
                    atol=1e-4, rtol=1e-4, eps=1e-5)

    def test_jacobian_sparsity(self, fixture_spline, degree):
        """Only the knots of the active segment get nonzero Jacobian."""
        knots, _ = fixture_spline
        time = 0.234  # segment start idx 2
        z = jnp.zeros((7, 3))

        def pose_t(delta_t):
            k = sp.spline_retract(knots, delta_t, z)
            return sp.spline_pose_at(k, time, degree).t

        J = np.asarray(jax.jacfwd(pose_t)(z))  # [3, 7, 3]
        active = set(range(2, 2 + degree))
        for i in range(7):
            mag = np.abs(J[:, i, :]).max()
            if i in active:
                assert mag > 1e-8, f"knot {i} should be active"
            else:
                assert mag < 1e-12, f"knot {i} should be inactive"


class TestWindowOps:
    def test_transform_to_anchors_rotation_exactly(self, fixture_spline, degree):
        """Right-composing all knots by a constant dT anchors the rotation
        exactly (cumulative-form conjugation identity); translation is only
        approximate for heterogeneous knot rotations — the same semantics as
        the reference's TransformTo (Spline.h:184-201)."""
        knots, _ = fixture_spline
        target = Pose(
            t=jnp.asarray([1.0, -2.0, 0.5]),
            q=lie.quat_exp(jnp.asarray([0.1, 0.2, -0.3])),
        )
        time = 0.31
        out = sp.spline_transform_to(knots, time, target, degree)
        got = sp.spline_pose_at(out, time, degree)
        dq = lie.quat_multiply(lie.quat_conjugate(got.q), target.q)
        np.testing.assert_allclose(np.abs(float(dq[3])), 1.0, atol=1e-9)

    def test_transform_to_exact_for_common_rotation(self, degree):
        """When all knot rotations are equal, TransformTo anchors the full
        pose exactly (the tracker's identity re-anchor use case,
        blur_aware_direct_tracker.cpp:192-194)."""
        rng = np.random.default_rng(5)
        q = ref.qnorm(rng.standard_normal(4))
        knots = sp.make_knots(
            jnp.asarray(rng.standard_normal((7, 3))),
            jnp.tile(jnp.asarray(q), (7, 1)),
            0.0,
            0.1,
        )
        target = Pose(
            t=jnp.asarray([1.0, -2.0, 0.5]),
            q=lie.quat_exp(jnp.asarray([0.1, 0.2, -0.3])),
        )
        time = 0.31
        out = sp.spline_transform_to(knots, time, target, degree)
        got = sp.spline_pose_at(out, time, degree)
        np.testing.assert_allclose(np.asarray(got.t), np.asarray(target.t), atol=1e-9)
        dq = lie.quat_multiply(lie.quat_conjugate(got.q), target.q)
        np.testing.assert_allclose(np.abs(float(dq[3])), 1.0, atol=1e-9)

    def test_transform_by_right(self, fixture_spline):
        knots, (kt, kq, _, _) = fixture_spline
        d = Pose(t=jnp.asarray([0.1, 0.0, -0.2]), q=lie.quat_exp(jnp.asarray([0.0, 0.3, 0.0])))
        out = sp.spline_transform_by_right(knots, d)
        for i in range(7):
            t_want = kt[i] + ref.qmat(kq[i]) @ np.asarray(d.t)
            q_want = ref.qmul(kq[i], np.asarray(d.q))
            np.testing.assert_allclose(np.asarray(out.t[i]), t_want, atol=1e-9)
            np.testing.assert_allclose(np.asarray(out.q[i]), q_want, atol=1e-9)

    def test_retract_flat_layout(self, fixture_spline):
        """Flat step layout is [all t; all omega] (merge_hessian_gradient_cost.cpp:52-62)."""
        knots, (kt, kq, _, _) = fixture_spline
        step = np.zeros(42)
        step[3] = 0.5       # knot 1, t_x
        step[21 + 5] = 0.25  # knot 1, omega_z
        out = sp.spline_retract_flat(knots, jnp.asarray(step))
        np.testing.assert_allclose(np.asarray(out.t[1]), kt[1] + [0.5, 0, 0], atol=1e-12)
        q_want = ref.qmul(kq[1], ref.qexp(np.array([0.0, 0.0, 0.25])))
        np.testing.assert_allclose(np.asarray(out.q[1]), q_want, atol=1e-12)


class TestVirtualPoseTimes:
    def test_formula(self):
        times = np.asarray(sp.virtual_pose_times(10.0, 0.04, 5))
        want = 10.0 - 0.02 + np.arange(5) * 0.04 / (4 + 1e-8)
        np.testing.assert_allclose(times, want, atol=1e-12)
        assert times[0] == pytest.approx(9.98)
        assert times[-1] == pytest.approx(10.02)

    def test_single_pose(self):
        times = np.asarray(sp.virtual_pose_times(10.0, 0.04, 1))
        assert times.shape == (1,)
        assert np.isfinite(times).all()


class TestJit:
    def test_pose_at_jits(self, fixture_spline, degree):
        knots, _ = fixture_spline
        f = jax.jit(sp.spline_pose_at, static_argnums=2)
        p1 = f(knots, 0.25, degree)
        p2 = sp.spline_pose_at(knots, 0.25, degree)
        np.testing.assert_allclose(np.asarray(p1.t), np.asarray(p2.t), atol=1e-12)
