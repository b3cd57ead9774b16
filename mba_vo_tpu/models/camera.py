"""Camera models as pure pytree dataclasses + functions.

TPU-first re-design of the reference camera hierarchy
(src/core/sensors/{CameraBase,CameraPinhole,CameraUnified,DistortionRadTan}):
no virtual dispatch — each model is a NamedTuple of parameters with
project/unproject as batched pure functions; per-pyramid-level variants
(reference CameraBase.h:24-30) become an intrinsics-scaling helper.

Invalid projections (behind camera) are reported through a validity mask
instead of bool returns, so everything vmaps and jits.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp


def scale_intrinsics(K: jnp.ndarray, pyramid_level: int) -> jnp.ndarray:
    """Scale [fx, fy, cx, cy] for a pyramid level (reference
    blur_aware_direct_tracker.cpp:766-776 divides all four by 2^lv)."""
    return K / (2.0 ** pyramid_level)


class RadTanDistortion(NamedTuple):
    """Radial-tangential distortion [k1, k2, p1, p2]
    (reference DistortionRadTan.cpp:27-57)."""

    k1: jnp.ndarray
    k2: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray

    def distort(self, p: jnp.ndarray) -> jnp.ndarray:
        x, y = p[..., 0], p[..., 1]
        x2, y2, xy = x * x, y * y, x * y
        r2 = x2 + y2
        rad = self.k1 * r2 + self.k2 * r2 * r2
        dx = x + x * rad + 2.0 * self.p1 * xy + self.p2 * (r2 + 2.0 * x2)
        dy = y + y * rad + 2.0 * self.p2 * xy + self.p1 * (r2 + 2.0 * y2)
        return jnp.stack([dx, dy], axis=-1)

    def distort_jacobian(self, p: jnp.ndarray) -> jnp.ndarray:
        """2x2 Jacobian of distort (reference DistortionRadTan.cpp:40-57)."""
        x, y = p[..., 0], p[..., 1]
        x2, y2, xy = x * x, y * y, x * y
        r2 = x2 + y2
        rad = self.k1 * r2 + self.k2 * r2 * r2
        j00 = 1.0 + rad + 2.0 * self.k1 * x2 + 4.0 * self.k2 * x2 * r2 \
            + 2.0 * self.p1 * y + 6.0 * self.p2 * x
        j01 = 2.0 * self.k1 * xy + 4.0 * self.k2 * r2 * xy \
            + 2.0 * self.p1 * x + 2.0 * self.p2 * y
        j11 = 1.0 + rad + 2.0 * self.k1 * y2 + 4.0 * self.k2 * y2 * r2 \
            + 2.0 * self.p2 * x + 6.0 * self.p1 * y
        row0 = jnp.stack([j00, j01], axis=-1)
        row1 = jnp.stack([j01, j11], axis=-1)
        return jnp.stack([row0, row1], axis=-2)

    def undistort(self, p: jnp.ndarray, num_iters: int = 5) -> jnp.ndarray:
        """Iterative Gauss-Newton inverse (reference DistortionRadTan.cpp:59-81;
        fixed iteration count instead of the early-exit for jit)."""
        u = p
        for _ in range(num_iters):
            d = self.distort(u)
            J = self.distort_jacobian(u)
            e = p - d
            # 2x2 normal equations solved in closed form
            JtJ = jnp.einsum("...ki,...kj->...ij", J, J)
            Jte = jnp.einsum("...ki,...k->...i", J, e)
            det = JtJ[..., 0, 0] * JtJ[..., 1, 1] - JtJ[..., 0, 1] * JtJ[..., 1, 0]
            det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
            du0 = (JtJ[..., 1, 1] * Jte[..., 0] - JtJ[..., 0, 1] * Jte[..., 1]) / det
            du1 = (-JtJ[..., 1, 0] * Jte[..., 0] + JtJ[..., 0, 0] * Jte[..., 1]) / det
            u = u + jnp.stack([du0, du1], axis=-1)
        return u


class PinholeCamera(NamedTuple):
    """Pinhole camera: K = [fx, fy, cx, cy], image size (H, W) static.

    Reference CameraPinhole.cpp:24-117.
    """

    K: jnp.ndarray          # [4] fx, fy, cx, cy (level 0)
    height: int
    width: int
    distortion: Optional[RadTanDistortion] = None

    def level(self, lv: int) -> "PinholeCamera":
        """Camera for pyramid level lv (intrinsics and size halved lv times)."""
        return self._replace(
            K=scale_intrinsics(self.K, lv),
            height=self.height // (2 ** lv),
            width=self.width // (2 ** lv),
        )

    def project(self, P3d: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[..., 3] points -> ([..., 2] pixels, [...] valid mask).

        Valid requires Z > 0 (reference CameraPinhole.cpp project returns
        false for negative depth).
        """
        z = P3d[..., 2]
        valid = z > 0
        iz = 1.0 / jnp.where(valid, z, 1.0)
        pn = P3d[..., :2] * iz[..., None]
        if self.distortion is not None:
            pn = self.distortion.distort(pn)
        fx, fy, cx, cy = self.K[0], self.K[1], self.K[2], self.K[3]
        xy = jnp.stack([fx * pn[..., 0] + cx, fy * pn[..., 1] + cy], axis=-1)
        return xy, valid

    def unproject(self, xy: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
        """Pixels + depth -> 3D points z * [(x-cx)/fx, (y-cy)/fy, 1]."""
        fx, fy, cx, cy = self.K[0], self.K[1], self.K[2], self.K[3]
        pn = jnp.stack(
            [(xy[..., 0] - cx) / fx, (xy[..., 1] - cy) / fy], axis=-1
        )
        if self.distortion is not None:
            pn = self.distortion.undistort(pn)
        ones = jnp.ones_like(pn[..., :1])
        return jnp.asarray(z)[..., None] * jnp.concatenate([pn, ones], axis=-1)

    def unit_ray(self, xy: jnp.ndarray) -> jnp.ndarray:
        """Unit-norm back-projected ray (the frontoparallel warp's uray,
        reference compute_pixel_intensity.h:117-121)."""
        ray = self.unproject(xy, jnp.ones(xy.shape[:-1], xy.dtype))
        return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)

    def projection_jacobian(self, P3d: jnp.ndarray) -> jnp.ndarray:
        """2x3 d(pixel)/d(P3d) (reference CameraPinhole.cpp projection_jacobian)."""
        fx, fy = self.K[0], self.K[1]
        x, y, z = P3d[..., 0], P3d[..., 1], P3d[..., 2]
        iz = 1.0 / z
        iz2 = iz * iz
        zero = jnp.zeros_like(x)
        row0 = jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1)
        row1 = jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1)
        return jnp.stack([row0, row1], axis=-2)


class UnifiedCamera(NamedTuple):
    """Unified (omnidirectional) camera model with mirror parameter xi
    (reference CameraUnified.cpp:23-143)."""

    K: jnp.ndarray          # [4] fx, fy, cx, cy
    xi: jnp.ndarray
    height: int
    width: int
    distortion: Optional[RadTanDistortion] = None

    def level(self, lv: int) -> "UnifiedCamera":
        return self._replace(
            K=scale_intrinsics(self.K, lv),
            height=self.height // (2 ** lv),
            width=self.width // (2 ** lv),
        )

    def project(self, P3d: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = P3d[..., 2]
        valid = z >= 0
        d = jnp.linalg.norm(P3d, axis=-1)
        denom = z + self.xi * d
        rz = 1.0 / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        pn = P3d[..., :2] * rz[..., None]
        if self.distortion is not None:
            pn = self.distortion.distort(pn)
        fx, fy, cx, cy = self.K[0], self.K[1], self.K[2], self.K[3]
        xy = jnp.stack([fx * pn[..., 0] + cx, fy * pn[..., 1] + cy], axis=-1)
        return xy, valid

    def unproject(self, xy: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
        """Reference CameraUnified.cpp:68-103: lift to the unit sphere, then
        scale to depth z along the ray."""
        fx, fy, cx, cy = self.K[0], self.K[1], self.K[2], self.K[3]
        pn = jnp.stack(
            [(xy[..., 0] - cx) / fx, (xy[..., 1] - cy) / fy], axis=-1
        )
        if self.distortion is not None:
            pn = self.distortion.undistort(pn)
        rho2 = jnp.sum(pn * pn, axis=-1)
        beta = 1.0 + (1.0 - self.xi ** 2) * rho2
        beta = jnp.maximum(beta, 0.0)
        lam = (self.xi + jnp.sqrt(beta)) / (1.0 + rho2)
        P = jnp.concatenate(
            [lam[..., None] * pn, (lam - self.xi)[..., None]], axis=-1
        )
        pz = P[..., 2:3]
        pz = jnp.where(jnp.abs(pz) < 1e-12, 1e-12, pz)
        return P / pz * jnp.asarray(z)[..., None]
