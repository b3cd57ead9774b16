"""Tests for the sparse feature stack: Shi-Tomasi corners, oriented BRIEF,
and Hamming matching (reference FeatureDetectorSparse parity)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mba_vo_tpu.tracker.detector import DetectorOptions
from mba_vo_tpu.tracker.sparse_features import (
    SparseFeatures,
    brief_pattern,
    detect_sparse,
    match_descriptors,
    shi_tomasi_response,
)

RNG = np.random.default_rng(41)


def checkerboard(h=96, w=128, cell=16):
    ys, xs = np.mgrid[0:h, 0:w]
    return (((ys // cell) + (xs // cell)) % 2 * 255.0).astype(np.float64)


def textured(h=96, w=128, seed=3):
    from mba_vo_tpu.data.synthetic import _box_filter_1d

    img = np.random.default_rng(seed).uniform(0, 255, (h, w))
    img = _box_filter_1d(img, 1, 0)
    img = _box_filter_1d(img, 1, 1)
    return img


class TestShiTomasi:
    def test_corners_peak_at_checkerboard_junctions(self):
        img = jnp.asarray(checkerboard())
        resp = np.asarray(shi_tomasi_response(img))
        # corner junctions (multiples of 16) should dominate flat regions
        corner_vals = [resp[32, 32], resp[48, 64], resp[16, 48]]
        flat_vals = [resp[8, 8], resp[40, 40], resp[24, 56]]
        assert min(corner_vals) > 10 * max(flat_vals)

    def test_flat_image_zero_response(self):
        img = jnp.full((32, 32), 128.0)
        resp = np.asarray(shi_tomasi_response(img))
        assert np.abs(resp).max() < 1e-6


class TestDetectSparse:
    def test_detects_on_texture(self):
        img = jnp.asarray(textured())
        opts = DetectorOptions(score_threshold=1.0, cell_h=12, cell_w=12,
                               max_keypoints=128)
        feats = detect_sparse(img, opts, 0)
        n = int(feats.mask.sum())
        assert n > 20
        assert feats.descriptors.shape == (128, 256)
        live = np.asarray(feats.descriptors)[np.asarray(feats.mask) > 0]
        assert set(np.unique(live)) <= {-1.0, 1.0}

    def test_masked_slots_zero(self):
        img = jnp.asarray(checkerboard(48, 48, 24))  # few corners
        opts = DetectorOptions(score_threshold=50.0, cell_h=24, cell_w=24,
                               max_keypoints=64)
        feats = detect_sparse(img, opts, 0)
        dead = np.asarray(feats.descriptors)[np.asarray(feats.mask) == 0]
        assert np.all(dead == 0)


class TestMatching:
    def test_matches_translated_image(self):
        """Features must match to their translated counterparts."""
        img_np = textured(128, 160, seed=9)
        shift = 6
        img_a = jnp.asarray(img_np[:-shift, :-shift])
        img_b = jnp.asarray(img_np[shift:, shift:])  # content shifted by -6
        opts = DetectorOptions(score_threshold=1.0, cell_h=14, cell_w=14,
                               max_keypoints=128)
        fa = detect_sparse(img_a, opts, 0)
        fb = detect_sparse(img_b, opts, 0)
        midx, dist = match_descriptors(fa, fb, max_hamming=60.0, ratio=0.9)
        midx = np.asarray(midx)
        matched = midx >= 0
        assert matched.sum() >= 10, f"only {matched.sum()} matches"
        # verify geometric consistency: matched pairs differ by (+shift,+shift)
        # in image-a coords -> b = a - shift
        a_xy = np.asarray(fa.kp_xy)[matched]
        b_xy = np.asarray(fb.kp_xy)[midx[matched]]
        err = np.abs((a_xy - b_xy) - shift)
        good = (err.max(axis=1) <= 2.0).mean()
        assert good > 0.8, f"only {good:.0%} geometrically consistent"

    def test_self_match_identity(self):
        img = jnp.asarray(textured(96, 96, seed=5))
        opts = DetectorOptions(score_threshold=1.0, cell_h=12, cell_w=12,
                               max_keypoints=64)
        f = detect_sparse(img, opts, 0)
        midx, dist = match_descriptors(f, f, max_hamming=10.0, ratio=1.0)
        midx = np.asarray(midx)
        live = np.asarray(f.mask) > 0
        np.testing.assert_array_equal(midx[live], np.arange(64)[live])
        assert np.allclose(np.asarray(dist)[live], 0.0)

    def test_no_false_matches_on_unrelated_images(self):
        a = detect_sparse(
            jnp.asarray(textured(96, 96, seed=1)),
            DetectorOptions(score_threshold=1.0, cell_h=12, cell_w=12,
                            max_keypoints=64), 0,
        )
        b = detect_sparse(
            jnp.asarray(textured(96, 96, seed=2)),
            DetectorOptions(score_threshold=1.0, cell_h=12, cell_w=12,
                            max_keypoints=64), 0,
        )
        midx, _ = match_descriptors(a, b, max_hamming=25.0, ratio=0.7)
        assert (np.asarray(midx) >= 0).mean() < 0.25
