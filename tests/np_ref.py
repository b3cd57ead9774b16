"""Independent NumPy float64 oracle implementations used for differential
testing of the JAX library (the reference repo validates every GPU kernel
against an independent CPU implementation — test_blur_aware_tracker_modules.cpp;
we do the same against these NumPy oracles).

Everything here is deliberately written straight from the math, not by
calling into mba_vo_tpu.
"""

import numpy as np

# ---------------------------------------------------------------- quaternions
# xyzw layout throughout.


def qmul(q, p):
    qx, qy, qz, qw = q
    px, py, pz, pw = p
    return np.array(
        [
            qw * px + qx * pw + qy * pz - qz * py,
            qw * py + qy * pw + qz * px - qx * pz,
            qw * pz + qz * pw + qx * py - qy * px,
            qw * pw - qx * px - qy * py - qz * pz,
        ]
    )


def qconj(q):
    return np.array([-q[0], -q[1], -q[2], q[3]])


def qnorm(q):
    return q / np.linalg.norm(q)


def qrot(q, v):
    vq = np.array([v[0], v[1], v[2], 0.0])
    return qmul(qmul(q, vq), qconj(q))[:3]


def qmat(q):
    x, y, z, w = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def qlog(q):
    """Rotation-vector log using atan2 (angle in [0, 2pi) for w<0)."""
    xyz = q[:3]
    n = np.linalg.norm(xyz)
    w = q[3]
    if n < 1e-12:
        lam = 2.0 / w - (2.0 / 3.0) * n * n / w**3
    else:
        lam = 2.0 * np.arctan2(n, w) / n
    return lam * xyz


def qexp(omega):
    theta = np.linalg.norm(omega)
    if theta < 1e-12:
        imag = 0.5 - theta**2 / 48.0
        real = 1.0 - theta**2 / 8.0
    else:
        imag = np.sin(0.5 * theta) / theta
        real = np.cos(0.5 * theta)
    return np.array([imag * omega[0], imag * omega[1], imag * omega[2], real])


def rand_quat(rng):
    q = rng.standard_normal(4)
    q = q / np.linalg.norm(q)
    return q


# ---------------------------------------------------------------- SE3 exp/log


def so3_hat(w):
    return np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])


def se3_exp(tangent):
    rho, omega = tangent[:3], tangent[3:]
    theta = np.linalg.norm(omega)
    O = so3_hat(omega)
    if theta < 1e-9:
        V = np.eye(3) + 0.5 * O + O @ O / 6.0
    else:
        V = (
            np.eye(3)
            + (1 - np.cos(theta)) / theta**2 * O
            + (theta - np.sin(theta)) / theta**3 * (O @ O)
        )
    return V @ rho, qexp(omega)


def se3_log(t, q):
    omega = qlog(q)
    theta = np.linalg.norm(omega)
    O = so3_hat(omega)
    if theta < 1e-9:
        Vinv = np.eye(3) - 0.5 * O + O @ O / 12.0
    else:
        half = 0.5 * theta
        Vinv = (
            np.eye(3)
            - 0.5 * O
            + (1 - half * np.cos(half) / np.sin(half)) / theta**2 * (O @ O)
        )
    return np.concatenate([Vinv @ t, omega])


# ---------------------------------------------------------------- B-splines


def spline_vec_basis(u, degree):
    if degree == 2:
        return np.array([1 - u, u])
    uu, uuu = u * u, u * u * u
    return np.array(
        [
            1 / 6 - u / 2 + uu / 2 - uuu / 6,
            4 / 6 - uu + uuu / 2,
            1 / 6 + u / 2 + uu / 2 - uuu / 2,
            uuu / 6,
        ]
    )


def spline_rot_cum_basis(u, degree):
    if degree == 2:
        return np.array([u])
    uu, uuu = u * u, u * u * u
    return np.array(
        [
            5 / 6 + u / 2 - uu / 2 + uuu / 6,
            1 / 6 + u / 2 + uu / 2 - uuu / 3,
            uuu / 6,
        ]
    )


def spline_pose(knots_t, knots_q, t0, dt, degree, time):
    """Interpolate the SE(3) spline at `time` (reference Spline.h:222-281)."""
    tn = (time - t0) / dt
    idx = int(np.floor(tn))
    idx = min(max(idx, 0), len(knots_t) - degree)
    u = tn - idx
    wt = np.asarray(knots_t[idx : idx + degree])
    wq = np.asarray(knots_q[idx : idx + degree])
    pos = spline_vec_basis(u, degree) @ wt
    coeffs = spline_rot_cum_basis(u, degree)
    q = wq[0]
    for j in range(degree - 1):
        rel = qmul(qconj(wq[j]), wq[j + 1])
        q = qmul(q, qexp(coeffs[j] * qlog(rel)))
    return pos, q


def make_test_spline(num_knots=7, dt=0.1, t0=0.0, seed=0, scale_t=0.5, scale_w=0.4):
    """Deterministic smooth spline fixture (analogue of the reference's
    7-knot prescribed-RPY fixture, test_blur_aware_tracker_modules.cpp:24-67)."""
    rng = np.random.default_rng(seed)
    knots_t = np.cumsum(rng.standard_normal((num_knots, 3)) * scale_t, axis=0)
    knots_q = []
    q = np.array([0.0, 0.0, 0.0, 1.0])
    for _ in range(num_knots):
        step = rng.standard_normal(3) * scale_w
        q = qnorm(qmul(q, qexp(step)))
        knots_q.append(q)
    return knots_t, np.array(knots_q), t0, dt
