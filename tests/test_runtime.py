"""Tests for the native C++ runtime (k-d tree, fast depth parsing,
prefetcher) against brute-force NumPy oracles."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "runtime"))
import bindings as rt  # noqa: E402

RNG = np.random.default_rng(31)


@pytest.fixture(scope="module")
def native():
    if not rt.native_available():
        pytest.skip("native runtime library not built")
    return True


class TestKDTree:
    def test_radius_query_matches_bruteforce(self, native):
        pts = RNG.uniform(0, 100, (500, 2)).astype(np.float32)
        tree = rt.KDTree2D(pts)
        for _ in range(20):
            x, y, r = RNG.uniform(0, 100), RNG.uniform(0, 100), RNG.uniform(1, 20)
            got = set(tree.radius_query(float(x), float(y), float(r), max_out=500))
            d2 = ((pts - [x, y]) ** 2).sum(axis=1)
            want = set(np.where(d2 <= r * r)[0].tolist())
            assert got == want

    def test_knn_matches_bruteforce(self, native):
        pts = RNG.uniform(0, 50, (300, 2)).astype(np.float32)
        tree = rt.KDTree2D(pts)
        for _ in range(20):
            x, y = RNG.uniform(0, 50, 2)
            k = int(RNG.integers(1, 10))
            idx, d2 = tree.knn(float(x), float(y), k)
            dist2 = ((pts - [x, y]) ** 2).sum(axis=1)
            want = np.sort(dist2)[:k]
            np.testing.assert_allclose(np.sort(d2), want, rtol=1e-5)

    def test_empty_radius(self, native):
        pts = np.asarray([[0.0, 0.0]], np.float32)
        tree = rt.KDTree2D(pts)
        assert len(tree.radius_query(100.0, 100.0, 1.0)) == 0

    def test_python_fallback_matches(self):
        """The pure-Python fallback path gives identical answers."""
        pts = RNG.uniform(0, 10, (100, 2)).astype(np.float32)
        tree = rt.KDTree2D(pts)
        # force the fallback branch
        handle, tree._handle = tree._handle, None
        got = set(tree.radius_query(5.0, 5.0, 2.0, max_out=100))
        tree._handle = handle
        want = set(tree.radius_query(5.0, 5.0, 2.0, max_out=100))
        assert got == want


class TestDepthParse:
    def test_matches_numpy_loader(self, native, tmp_path):
        depth = RNG.uniform(0.1, 120.0, (20, 30))
        p = tmp_path / "depth.txt"
        np.savetxt(p, depth)
        got = rt.parse_depth_file(str(p), 20, 30)
        want = depth.astype(np.float32)
        want[want > 100.0] = 0.0
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_wrong_count_raises(self, native, tmp_path):
        p = tmp_path / "short.txt"
        p.write_text("1.0 2.0 3.0\n")
        with pytest.raises(ValueError):
            rt.parse_depth_file(str(p), 10, 10)

    def test_missing_file_raises(self, native):
        with pytest.raises((FileNotFoundError, OSError)):
            rt.parse_depth_file("/nonexistent/depth.txt", 4, 4)


class TestPrefetcher:
    def test_prefetch_roundtrip(self, native, tmp_path):
        paths = []
        truths = []
        for i in range(6):
            d = RNG.uniform(0.1, 50.0, (12, 16))
            p = tmp_path / f"d{i}.txt"
            np.savetxt(p, d)
            paths.append(str(p))
            truths.append(d.astype(np.float32))
        pf = rt.DepthPrefetcher(num_threads=3)
        for p in paths:
            pf.submit(p)
        for p, want in zip(paths, truths):
            got = pf.fetch(p, 12, 16)
            np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_fetch_without_submit_falls_back(self, native, tmp_path):
        d = RNG.uniform(0.1, 50.0, (4, 5))
        p = tmp_path / "d.txt"
        np.savetxt(p, d)
        pf = rt.DepthPrefetcher()
        got = pf.fetch(str(p), 4, 5)
        np.testing.assert_allclose(got, d.astype(np.float32), rtol=1e-6)
