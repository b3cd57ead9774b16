"""Backend tests: two-view geometry, Schur-complement bundle adjustment, and
pose-graph optimization (BASELINE.json config 4 analogue on synthetic data)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import np_ref as ref
from mba_vo_tpu.backend import geometry as geo
from mba_vo_tpu.backend.ba import (
    BAOptions, BAProblem, evaluate_cost, run_bundle_adjustment,
)
from mba_vo_tpu.backend.map import make_map, pad_map
from mba_vo_tpu.backend.pose_graph import (
    PoseGraphEdge, PoseGraphOptions, edge_residuals, optimize_pose_graph,
)
from mba_vo_tpu.core import lie
from mba_vo_tpu.core.transform import Pose
from mba_vo_tpu.utils.metrics import ate_rmse

RNG = np.random.default_rng(21)
KVEC = jnp.asarray([400.0, 400.0, 319.5, 239.5])


def synthetic_ba_problem(W=4, M=60, seed=0):
    """Poses on an arc looking at a landmark cloud; exact observations."""
    rng = np.random.default_rng(seed)
    X = np.stack(
        [
            rng.uniform(-1.5, 1.5, M),
            rng.uniform(-1.0, 1.0, M),
            rng.uniform(3.0, 6.0, M),
        ],
        axis=-1,
    )
    ts, qs = [], []
    for w in range(W):
        ts.append(np.array([0.15 * w, 0.02 * w, 0.05 * w]))
        qs.append(ref.qexp(np.array([0.01, 0.03, -0.02]) * w))
    poses = Pose(t=jnp.asarray(np.array(ts)), q=jnp.asarray(np.array(qs)))

    obs = np.zeros((W, M, 2))
    for w in range(W):
        R = ref.qmat(qs[w])
        Pc = (X - ts[w]) @ R  # R^T (X - t)
        obs[w, :, 0] = Pc[:, 0] / Pc[:, 2] * float(KVEC[0]) + float(KVEC[2])
        obs[w, :, 1] = Pc[:, 1] / Pc[:, 2] * float(KVEC[1]) + float(KVEC[3])
    m = make_map(X, obs, np.ones((W, M)))
    return BAProblem(poses=poses, map=m, K=KVEC), X, np.array(ts), np.array(qs)


class TestGeometry:
    def test_fundamental_epipolar_constraint(self):
        """x_cur^T F x_ref = 0 for projections of common 3D points, with
        the reference's F = Kinv_cur^T R [-R^T t]x Kinv_ref convention
        (EpipolarGeometry.h:17-26, T_ref2cur maps ref-cam to cur-cam)."""
        q = ref.qnorm(RNG.standard_normal(4))
        R = ref.qmat(q)
        t = np.array([0.3, -0.1, 0.05])
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        fx, fy, cx, cy = 400.0, 420.0, 320.0, 240.0
        Km = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
        Kinv = np.linalg.inv(Km)
        F = geo.fundamental_matrix(
            jnp.asarray(Kinv), jnp.asarray(T), jnp.asarray(Kinv)
        )
        for _ in range(8):
            X_ref = RNG.standard_normal(3) + np.array([0, 0, 5.0])
            X_cur = R @ X_ref + t
            x_ref = Km @ (X_ref / X_ref[2])
            x_cur = Km @ (X_cur / X_cur[2])
            val = float(x_cur @ np.asarray(F) @ x_ref)
            assert abs(val) < 1e-8, val

    def test_triangulation_recovers_points(self):
        R1, t1 = np.eye(3), np.zeros(3)
        q2 = ref.qexp(np.array([0.05, -0.1, 0.02]))
        R2 = ref.qmat(q2)
        t2 = np.array([0.3, 0.0, 0.0])
        # projection matrices world->cam: x = K [R^T | -R^T t] X
        P1 = geo.projection_matrix(
            KVEC, jnp.asarray(R1.T), jnp.asarray(-R1.T @ t1)
        )
        P2 = geo.projection_matrix(
            KVEC, jnp.asarray(R2.T), jnp.asarray(-R2.T @ t2)
        )
        X = np.stack(
            [RNG.uniform(-1, 1, 16), RNG.uniform(-1, 1, 16), RNG.uniform(3, 6, 16)],
            axis=-1,
        )

        def proj(P, X):
            Xh = np.concatenate([X, np.ones((len(X), 1))], axis=1)
            x = (np.asarray(P) @ Xh.T).T
            return x[:, :2] / x[:, 2:3]

        x1 = proj(P1, X)
        x2 = proj(P2, X)
        out = geo.triangulate_points(P1, P2, jnp.asarray(x1), jnp.asarray(x2))
        np.testing.assert_allclose(np.asarray(out), X, atol=1e-6)


class TestBundleAdjustment:
    def test_zero_cost_at_truth(self):
        problem, *_ = synthetic_ba_problem()
        assert float(evaluate_cost(problem, 1e6)) < 1e-12

    def test_recovers_from_perturbation(self):
        problem, X_true, t_true, q_true = synthetic_ba_problem()
        rng = np.random.default_rng(3)
        # perturb all poses except 0 (gauge) and all landmarks
        dp = rng.normal(0, 0.02, (4, 6))
        dp[0] = 0
        noisy_poses = Pose(
            t=problem.poses.t + jnp.asarray(dp[:, :3]),
            q=lie.quat_multiply(
                problem.poses.q, lie.quat_exp(jnp.asarray(dp[:, 3:]))
            ),
        )
        noisy_map = problem.map._replace(
            points=problem.map.points + jnp.asarray(rng.normal(0, 0.05, X_true.shape))
        )
        noisy = problem._replace(poses=noisy_poses, map=noisy_map)
        cost_before = float(evaluate_cost(noisy, 1e6))
        assert cost_before > 1.0

        opts = BAOptions(max_iterations=30, huber_a=1e6)
        out, summary = run_bundle_adjustment(noisy, opts)
        assert float(summary.final_cost) < 1e-8, float(summary.final_cost)
        # trajectory matches truth up to the similarity gauge
        assert ate_rmse(np.asarray(out.poses.t), t_true, with_scale=True) < 2e-3

    def test_huber_downweights_gross_outlier(self):
        problem, *_ = synthetic_ba_problem()
        bad_obs = problem.map.obs_xy.at[1, 5].add(jnp.asarray([80.0, -60.0]))
        noisy = problem._replace(map=problem.map._replace(obs_xy=bad_obs))
        opts_robust = BAOptions(max_iterations=25, huber_a=2.0)
        out, summary = run_bundle_adjustment(noisy, opts_robust)
        # robust BA keeps poses near truth (mm-scale drag from the non-
        # redescending Huber influence) and absorbs the outlier mostly into
        # the corrupted landmark's position
        pose_dev = np.abs(np.asarray(out.poses.t) - np.asarray(problem.poses.t)).max()
        assert pose_dev < 5e-3, pose_dev
        lm_dev = np.abs(np.asarray(out.map.points) - np.asarray(problem.map.points))
        assert lm_dev[5].max() > 3 * np.delete(lm_dev, 5, axis=0).max()

    def test_padded_landmarks_inert(self):
        problem, *_ = synthetic_ba_problem()
        padded = problem._replace(map=pad_map(problem.map, 80))
        assert float(evaluate_cost(padded, 1e6)) == pytest.approx(
            float(evaluate_cost(problem, 1e6)), abs=1e-12
        )
        opts = BAOptions(max_iterations=5, huber_a=1e6)
        out, _ = run_bundle_adjustment(padded, opts)
        # padded slots must not move
        np.testing.assert_allclose(
            np.asarray(out.map.points[60:]), np.ones((20, 3)), atol=1e-12
        )

    def test_jits(self):
        problem, *_ = synthetic_ba_problem()
        opts = BAOptions(max_iterations=3, huber_a=1e6)
        from mba_vo_tpu.backend.ba import run_bundle_adjustment_jit

        out, summary = run_bundle_adjustment_jit(problem, opts)
        assert np.isfinite(float(summary.final_cost))


class TestPoseGraph:
    def make_chain(self, N=8, noise=0.05, seed=4):
        rng = np.random.default_rng(seed)
        ts, qs = [np.zeros(3)], [np.array([0.0, 0.0, 0.0, 1.0])]
        for i in range(1, N):
            ts.append(ts[-1] + np.array([0.5, 0.05 * np.sin(i), 0.0]))
            qs.append(ref.qnorm(ref.qmul(qs[-1], ref.qexp([0.0, 0.0, 0.12]))))
        truth = Pose(t=jnp.asarray(np.array(ts)), q=jnp.asarray(np.array(qs)))

        # exact odometry edges + one loop closure 0 -> N-1
        ii, jj, t_ij, q_ij = [], [], [], []
        for i in range(N - 1):
            ii.append(i); jj.append(i + 1)
            dq = ref.qmul(ref.qconj(qs[i]), qs[i + 1])
            dt = ref.qmat(ref.qconj(qs[i])) @ (ts[i + 1] - ts[i])
            t_ij.append(dt); q_ij.append(dq)
        ii.append(0); jj.append(N - 1)
        dq = ref.qmul(ref.qconj(qs[0]), qs[N - 1])
        dt = ref.qmat(ref.qconj(qs[0])) @ (ts[N - 1] - ts[0])
        t_ij.append(dt); q_ij.append(dq)

        edges = PoseGraphEdge(
            i=jnp.asarray(ii, jnp.int32),
            j=jnp.asarray(jj, jnp.int32),
            t_ij=jnp.asarray(np.array(t_ij)),
            q_ij=jnp.asarray(np.array(q_ij)),
            weight=jnp.ones(len(ii)),
        )

        # noisy initialization (drifted odometry integration)
        tn, qn = [np.zeros(3)], [np.array([0.0, 0.0, 0.0, 1.0])]
        for i in range(1, N):
            tn.append(ts[i] + rng.normal(0, noise, 3) * (i > 0))
            qn.append(ref.qnorm(ref.qmul(qs[i], ref.qexp(rng.normal(0, noise, 3)))))
        init = Pose(t=jnp.asarray(np.array(tn)), q=jnp.asarray(np.array(qn)))
        return truth, edges, init

    def test_zero_residual_at_truth(self):
        truth, edges, _ = self.make_chain()
        r = edge_residuals(truth, edges)
        assert float(jnp.abs(r).max()) < 1e-10

    def test_recovers_truth_from_noisy_init(self):
        truth, edges, init = self.make_chain()
        out, cost = optimize_pose_graph(init, edges, PoseGraphOptions())
        assert float(cost) < 1e-16
        np.testing.assert_allclose(
            np.asarray(out.t), np.asarray(truth.t), atol=1e-6
        )
        for i in range(8):
            dq = lie.quat_multiply(
                lie.quat_conjugate(out.q[i]), truth.q[i]
            )
            assert abs(abs(float(dq[3])) - 1.0) < 1e-9

    def test_node0_fixed(self):
        truth, edges, init = self.make_chain()
        out, _ = optimize_pose_graph(init, edges, PoseGraphOptions())
        np.testing.assert_allclose(np.asarray(out.t[0]), np.asarray(init.t[0]), atol=1e-12)
        np.testing.assert_allclose(np.asarray(out.q[0]), np.asarray(init.q[0]), atol=1e-12)
