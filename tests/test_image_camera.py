"""Tests for pyramids, gradients, differentiable sampling, and camera models.

Oracles are straight NumPy re-implementations of the reference semantics
(ImagePyramid.h:59-99, Gradient.h:16-75, compute_pixel_intensity.h:26-72,
CameraPinhole.cpp, CameraUnified.cpp, DistortionRadTan.cpp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mba_vo_tpu.ops import image as im
from mba_vo_tpu.models.camera import (
    PinholeCamera,
    UnifiedCamera,
    RadTanDistortion,
)

RNG = np.random.default_rng(7)


def np_bilinear(img, x, y):
    """Oracle bilinear with reference weight layout."""
    H, W = img.shape
    if x < 0 or x > W - 1 or y < 0 or y > H - 1:
        return 0.0
    xi, yi = int(np.floor(x)), int(np.floor(y))
    dx, dy = x - xi, y - yi
    dxdy = dx * dy
    x1, y1 = min(xi + 1, W - 1), min(yi + 1, H - 1)
    return (
        (1 - dx - dy + dxdy) * img[yi, xi]
        + (dx - dxdy) * img[yi, x1]
        + (dy - dxdy) * img[y1, xi]
        + dxdy * img[y1, x1]
    )


class TestPyramid:
    def test_downsample_exact_box(self):
        img = RNG.random((8, 10))
        out = np.asarray(im.downsample2x(jnp.asarray(img)))
        want = 0.25 * (img[0::2, 0::2] + img[0::2, 1::2] + img[1::2, 0::2] + img[1::2, 1::2])
        np.testing.assert_allclose(out, want, atol=1e-12)

    def test_odd_sizes_floor(self):
        img = RNG.random((9, 11))
        out = im.downsample2x(jnp.asarray(img))
        assert out.shape == (4, 5)

    def test_pyramid_levels(self):
        img = RNG.random((64, 48))
        pyr = im.image_pyramid(jnp.asarray(img), 4)
        assert [p.shape for p in pyr] == [(64, 48), (32, 24), (16, 12), (8, 6)]


class TestGradients:
    def test_central_difference(self):
        img = RNG.random((12, 14))
        g = np.asarray(im.image_gradients(jnp.asarray(img)))
        # interior
        for (y, x) in [(1, 1), (5, 7), (10, 12)]:
            assert g[y, x, 0] == pytest.approx(0.5 * (img[y, x + 1] - img[y, x - 1]))
            assert g[y, x, 1] == pytest.approx(0.5 * (img[y + 1, x] - img[y - 1, x]))
        # borders zeroed
        assert np.all(g[0] == 0) and np.all(g[-1] == 0)
        assert np.all(g[:, 0] == 0) and np.all(g[:, -1] == 0)

    def test_gradient_magnitude(self):
        img = RNG.random((8, 8))
        g = im.image_gradients(jnp.asarray(img))
        mag = np.asarray(im.gradient_magnitude(g))
        want = np.sqrt(np.asarray(g)[..., 0] ** 2 + np.asarray(g)[..., 1] ** 2)
        np.testing.assert_allclose(mag, want, atol=1e-12)


class TestSampling:
    def test_matches_oracle(self):
        img = RNG.random((16, 20))
        pts = np.stack(
            [RNG.uniform(-2, 22, 64), RNG.uniform(-2, 18, 64)], axis=-1
        )
        got = np.asarray(im.bilinear_sample(jnp.asarray(img), jnp.asarray(pts)))
        want = np.array([np_bilinear(img, x, y) for x, y in pts])
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_procedural_gradient_image(self):
        """The reference's ((r+c) mod 255) fixture
        (test_blur_aware_tracker_modules.cpp:69-81): interior gradients are
        exactly (1, 1) away from wrap rows, so sample_lk's JVP must be too."""
        H, W = 32, 32
        img = ((np.arange(H)[:, None] + np.arange(W)[None, :]) % 255).astype(np.float64)
        g = im.image_gradients(jnp.asarray(img))
        xy = jnp.asarray([10.3, 7.6])
        val, tang = jax.jvp(
            lambda p: im.sample_lk(jnp.asarray(img), g, p), (xy,), (jnp.asarray([1.0, 0.0]),)
        )
        assert float(tang) == pytest.approx(1.0, abs=1e-9)
        _, tang = jax.jvp(
            lambda p: im.sample_lk(jnp.asarray(img), g, p), (xy,), (jnp.asarray([0.0, 1.0]),)
        )
        assert float(tang) == pytest.approx(1.0, abs=1e-9)

    def test_lk_gradient_matches_sampled_gradient_image(self):
        img = RNG.random((24, 24))
        gimg = im.image_gradients(jnp.asarray(img))
        xy = jnp.asarray([11.37, 5.21])
        grad = jax.grad(lambda p: im.sample_lk(jnp.asarray(img), gimg, p))(xy)
        want = np.array(
            [
                np_bilinear(np.asarray(gimg)[..., 0], 11.37, 5.21),
                np_bilinear(np.asarray(gimg)[..., 1], 11.37, 5.21),
            ]
        )
        np.testing.assert_allclose(np.asarray(grad), want, atol=1e-10)

    def test_out_of_bounds_zero_value_and_grad(self):
        img = jnp.asarray(RNG.random((8, 8)))
        gimg = im.image_gradients(img)
        xy = jnp.asarray([20.0, 3.0])
        val, grad = jax.value_and_grad(lambda p: im.sample_lk(img, gimg, p))(xy)
        assert float(val) == 0.0
        # gradient-image sample is also out of bounds -> 0
        np.testing.assert_allclose(np.asarray(grad), [0.0, 0.0], atol=1e-12)

    def test_vmap_batched(self):
        img = jnp.asarray(RNG.random((16, 16)))
        pts = jnp.asarray(RNG.uniform(0, 15, (4, 7, 2)))
        out = im.bilinear_sample(img, pts)
        assert out.shape == (4, 7)


class TestPinhole:
    CAM = PinholeCamera(K=jnp.asarray([320.0, 320.0, 319.5, 239.5]), height=480, width=640)

    def test_roundtrip(self):
        xy = jnp.asarray(RNG.uniform(10, 600, (32, 2)))
        z = jnp.asarray(RNG.uniform(0.5, 10.0, (32,)))
        P = self.CAM.unproject(xy, z)
        xy2, valid = self.CAM.project(P)
        assert bool(valid.all())
        np.testing.assert_allclose(np.asarray(xy2), np.asarray(xy), atol=1e-9)
        np.testing.assert_allclose(np.asarray(P[..., 2]), np.asarray(z), atol=1e-12)

    def test_negative_depth_invalid(self):
        _, valid = self.CAM.project(jnp.asarray([0.1, 0.1, -1.0]))
        assert not bool(valid)

    def test_level_scaling(self):
        lv2 = self.CAM.level(2)
        np.testing.assert_allclose(np.asarray(lv2.K), np.asarray(self.CAM.K) / 4)
        assert lv2.height == 120 and lv2.width == 160

    def test_projection_jacobian_vs_autodiff(self):
        P = jnp.asarray([0.3, -0.2, 2.5])
        J = self.CAM.projection_jacobian(P)
        J_auto = jax.jacfwd(lambda p: self.CAM.project(p)[0])(P)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto), atol=1e-10)

    def test_unit_ray(self):
        xy = jnp.asarray(RNG.uniform(0, 600, (8, 2)))
        r = self.CAM.unit_ray(xy)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(r), axis=-1), 1.0, atol=1e-12)


class TestRadTan:
    DIST = RadTanDistortion(
        k1=jnp.asarray(-0.28), k2=jnp.asarray(0.07),
        p1=jnp.asarray(2e-4), p2=jnp.asarray(2e-5),
    )

    def test_distort_jacobian_vs_autodiff(self):
        p = jnp.asarray([0.2, -0.3])
        J = self.DIST.distort_jacobian(p)
        J_auto = jax.jacfwd(self.DIST.distort)(p)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto), atol=1e-10)

    def test_undistort_roundtrip(self):
        pts = jnp.asarray(RNG.uniform(-0.5, 0.5, (16, 2)))
        d = self.DIST.distort(pts)
        u = self.DIST.undistort(d, num_iters=8)
        np.testing.assert_allclose(np.asarray(u), np.asarray(pts), atol=1e-8)

    def test_pinhole_with_distortion_roundtrip(self):
        cam = PinholeCamera(
            K=jnp.asarray([320.0, 320.0, 319.5, 239.5]),
            height=480, width=640, distortion=self.DIST,
        )
        xy = jnp.asarray(RNG.uniform(100, 500, (16, 2)))
        z = jnp.asarray(RNG.uniform(1.0, 5.0, (16,)))
        P = cam.unproject(xy, z)
        xy2, valid = cam.project(P)
        assert bool(valid.all())
        np.testing.assert_allclose(np.asarray(xy2), np.asarray(xy), atol=1e-6)


class TestUnified:
    CAM = UnifiedCamera(
        K=jnp.asarray([400.0, 400.0, 319.5, 239.5]), xi=jnp.asarray(0.8),
        height=480, width=640,
    )

    def test_roundtrip(self):
        xy = jnp.asarray(RNG.uniform(150, 480, (16, 2)))
        z = jnp.asarray(RNG.uniform(0.5, 8.0, (16,)))
        P = self.CAM.unproject(xy, z)
        xy2, valid = self.CAM.project(P)
        assert bool(valid.all())
        np.testing.assert_allclose(np.asarray(xy2), np.asarray(xy), atol=1e-6)
        np.testing.assert_allclose(np.asarray(P[..., 2]), np.asarray(z), atol=1e-9)
