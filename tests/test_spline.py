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


class TestKnotWindowManagement:
    """Insert/pop-front/slide window ops (reference Spline.h:146-183)."""

    def test_insert_appends(self, fixture_spline):
        knots, (kt, kq, t0, dt) = fixture_spline
        t_new = jnp.asarray([1.0, 2.0, 3.0])
        q_new = lie.quat_exp(jnp.asarray([0.1, 0.0, -0.2]))
        out = sp.insert_control_knot(knots, t_new, q_new)
        assert out.num_knots == knots.num_knots + 1
        np.testing.assert_allclose(np.asarray(out.t[:-1]), kt, atol=1e-15)
        np.testing.assert_allclose(np.asarray(out.t[-1]), t_new, atol=1e-15)
        np.testing.assert_allclose(np.asarray(out.q[-1]), q_new, atol=1e-15)
        assert float(out.t0) == pytest.approx(t0)

    def test_pop_front_advances_start(self, fixture_spline):
        knots, (kt, kq, t0, dt) = fixture_spline
        out = sp.pop_front_control_knot(knots)
        assert out.num_knots == knots.num_knots - 1
        np.testing.assert_allclose(np.asarray(out.t), kt[1:], atol=1e-15)
        assert float(out.t0) == pytest.approx(t0 + dt)

    def test_pop_then_insert_equals_slide(self, fixture_spline):
        knots, _ = fixture_spline
        t_new = jnp.asarray([0.4, -0.2, 0.9])
        q_new = lie.quat_exp(jnp.asarray([0.0, 0.3, 0.1]))
        a = sp.insert_control_knot(sp.pop_front_control_knot(knots), t_new, q_new)
        b = sp.slide_control_window(knots, t_new, q_new)
        np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t), atol=1e-15)
        np.testing.assert_allclose(np.asarray(a.q), np.asarray(b.q), atol=1e-15)
        assert float(a.t0) == pytest.approx(float(b.t0))

    def test_slide_preserves_interpolation(self, fixture_spline, degree):
        """Sliding the window must not change the pose at times still covered
        by the remaining knots."""
        knots, (kt, kq, t0, dt) = fixture_spline
        t_new = jnp.asarray(kt[-1] + 0.01)
        q_new = jnp.asarray(kq[-1])
        slid = sp.slide_control_window(knots, t_new, q_new)
        # a time well inside both windows' valid ranges
        t_probe = t0 + 2.4 * dt if degree == 2 else t0 + 2.4 * dt
        p_old = sp.spline_pose_at(knots, t_probe, degree)
        p_new = sp.spline_pose_at(slid, t_probe, degree)
        np.testing.assert_allclose(np.asarray(p_old.t), np.asarray(p_new.t),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(p_old.q), np.asarray(p_new.q),
                                   atol=1e-12)

    def test_slide_jits(self, fixture_spline):
        knots, _ = fixture_spline
        t_new = jnp.asarray([0.4, -0.2, 0.9])
        q_new = lie.quat_exp(jnp.asarray([0.0, 0.3, 0.1]))
        f = jax.jit(sp.slide_control_window)
        a = f(knots, t_new, q_new)
        b = sp.slide_control_window(knots, t_new, q_new)
        np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t), atol=1e-15)

    def test_extrapolate_constant_velocity(self):
        """For a constant-velocity knot sequence the extrapolated knot must
        continue the motion exactly."""
        v_t = np.array([0.02, -0.01, 0.005])
        v_w = np.array([0.01, 0.03, -0.02])
        kt, kq = [np.zeros(3)], [np.array([0.0, 0.0, 0.0, 1.0])]
        for _ in range(3):
            q_prev = jnp.asarray(kq[-1])
            d = lie.quat_exp(jnp.asarray(v_w))
            kt.append(kt[-1] + np.asarray(lie.quat_rotate(q_prev, jnp.asarray(v_t))))
            kq.append(np.asarray(lie.quat_multiply(q_prev, d)))
        knots = sp.make_knots(jnp.asarray(np.array(kt)),
                              jnp.asarray(np.array(kq)), 0.0, 0.1)
        pred = sp.extrapolate_knot(knots)
        q_prev = jnp.asarray(kq[-1])
        want_t = kt[-1] + np.asarray(lie.quat_rotate(q_prev, jnp.asarray(v_t)))
        want_q = np.asarray(lie.quat_multiply(q_prev, lie.quat_exp(jnp.asarray(v_w))))
        np.testing.assert_allclose(np.asarray(pred.t), want_t, atol=1e-12)
        np.testing.assert_allclose(np.asarray(pred.q), want_q, atol=1e-12)
