"""Differential tests of the Pallas fused window-sampling kernel against the
XLA einsum lowering (SURVEY.md §4: mechanized GPU-vs-CPU discipline — here
Mosaic-interpret vs XLA). Runs in interpreter mode on the CPU test mesh; the
same kernel is bit-checked compiled on the real chip by bench_kernels.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mba_vo_tpu.ops.pallas_sampling import TILE_N, pallas_window_bilinear
from mba_vo_tpu.ops.window_sampling import window_bilinear_xla


def _problem(n, s, win=32, c=3, seed=0):
    rng = np.random.default_rng(seed)
    windows = jnp.asarray(rng.normal(0, 1, (n, c, win, win)), jnp.float32)
    # coords deliberately spill past the window on both sides
    xy = jnp.asarray(rng.uniform(-3, win + 2, (n, s, 2)), jnp.float32)
    valid = jnp.asarray(rng.integers(0, 2, (n, s)), jnp.float32)
    return windows, xy, valid


class TestPallasWindowBilinear:
    @pytest.mark.parametrize("n,s", [(TILE_N, 40), (50, 40), (8, 17)])
    def test_matches_xla(self, n, s):
        windows, xy, valid = _problem(n, s)
        ref = window_bilinear_xla(windows, xy, valid)
        out = pallas_window_bilinear(windows, xy, valid, interpret=True)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-6, rtol=1e-6)

    def test_out_of_window_zero(self):
        windows, xy, valid = _problem(16, 8)
        far = xy.at[:, :, :].set(1e4)
        out = pallas_window_bilinear(windows, far, valid, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), 0.0)

    def test_mask_zeroes_samples(self):
        windows, xy, _ = _problem(16, 8)
        out = pallas_window_bilinear(windows, xy, jnp.zeros((16, 8)),
                                     interpret=True)
        np.testing.assert_array_equal(np.asarray(out), 0.0)

    def test_single_channel_primal_shape(self):
        # the sample_windows_lk primal path calls with C=1
        windows, xy, valid = _problem(16, 12, c=1)
        ref = window_bilinear_xla(windows, xy, valid)
        out = pallas_window_bilinear(windows, xy, valid, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-6, rtol=1e-6)
