"""ctypes bindings for the native runtime library (kdtree.cpp, dataio.cpp).

Builds libmbavo_runtime.so on first import if it is missing (g++ via the
Makefile); every entry point has a pure-Python fallback so the package works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libmbavo_runtime.so")
_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _DIR], check=True, capture_output=True
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.mbavo_kdtree_build.restype = ctypes.c_void_p
    lib.mbavo_kdtree_build.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
    ]
    lib.mbavo_kdtree_free.argtypes = [ctypes.c_void_p]
    lib.mbavo_kdtree_radius.restype = ctypes.c_int32
    lib.mbavo_kdtree_radius.argtypes = [
        ctypes.c_void_p, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ]
    lib.mbavo_kdtree_knn.restype = ctypes.c_int32
    lib.mbavo_kdtree_knn.argtypes = [
        ctypes.c_void_p, ctypes.c_float, ctypes.c_float, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
    ]
    lib.mbavo_parse_depth_file.restype = ctypes.c_int64
    lib.mbavo_parse_depth_file.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.mbavo_prefetcher_create.restype = ctypes.c_void_p
    lib.mbavo_prefetcher_create.argtypes = [ctypes.c_int32]
    lib.mbavo_prefetcher_free.argtypes = [ctypes.c_void_p]
    lib.mbavo_prefetcher_submit_depth.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
    ]
    lib.mbavo_prefetcher_fetch_depth.restype = ctypes.c_int64
    lib.mbavo_prefetcher_fetch_depth.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


class KDTree2D:
    """2-D k-d tree (native if available; reference parity KDTree.{h,cpp})."""

    def __init__(self, points_xy: np.ndarray):
        self._points = np.ascontiguousarray(points_xy, dtype=np.float32)
        lib = _load()
        self._lib = lib
        self._handle = None
        if lib is not None:
            self._handle = lib.mbavo_kdtree_build(
                self._points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                len(self._points),
            )

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.mbavo_kdtree_free(self._handle)
            self._handle = None

    def radius_query(self, x: float, y: float, r: float,
                     max_out: int = 256) -> np.ndarray:
        """Indices of points within radius r of (x, y)
        (reference KDTree neighborhood_indices)."""
        if self._handle is not None:
            out = np.empty(max_out, dtype=np.int32)
            n = self._lib.mbavo_kdtree_radius(
                self._handle, ctypes.c_float(x), ctypes.c_float(y),
                ctypes.c_float(r),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_out,
            )
            return out[:n].copy()
        d2 = ((self._points - [x, y]) ** 2).sum(axis=1)
        return np.where(d2 <= r * r)[0].astype(np.int32)[:max_out]

    def knn(self, x: float, y: float, k: int):
        """(indices, squared distances) of the k nearest points."""
        if self._handle is not None:
            idx = np.empty(k, dtype=np.int32)
            d2 = np.empty(k, dtype=np.float32)
            n = self._lib.mbavo_kdtree_knn(
                self._handle, ctypes.c_float(x), ctypes.c_float(y), k,
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                d2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            return idx[:n].copy(), d2[:n].copy()
        dist2 = ((self._points - [x, y]) ** 2).sum(axis=1)
        order = np.argsort(dist2)[:k]
        return order.astype(np.int32), dist2[order].astype(np.float32)


def parse_depth_file(path: str, height: int, width: int) -> np.ndarray:
    """Fast ASCII depth parse (>100 m clamped to 0); native single-pass parser
    with numpy fallback (reference InputOutput.cpp:12-41)."""
    n = height * width
    lib = _load()
    if lib is not None:
        out = np.empty(n, dtype=np.float32)
        got = lib.mbavo_parse_depth_file(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n
        )
        if got == n:
            return out.reshape(height, width)
        if got >= 0:
            raise ValueError(f"{path}: expected {n} values, got {got}")
        raise FileNotFoundError(path)
    vals = np.loadtxt(path).reshape(-1)
    if vals.size != n:
        raise ValueError(f"{path}: expected {n} values, got {vals.size}")
    depth = vals.astype(np.float32)
    depth[depth > 100.0] = 0.0
    return depth.reshape(height, width)


class DepthPrefetcher:
    """Background-thread depth-map prefetcher (native thread pool; Python
    fallback reads synchronously)."""

    def __init__(self, num_threads: int = 2):
        self._lib = _load()
        self._handle = (
            self._lib.mbavo_prefetcher_create(num_threads)
            if self._lib is not None
            else None
        )

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.mbavo_prefetcher_free(self._handle)
            self._handle = None

    def submit(self, path: str) -> None:
        if self._handle is not None:
            self._lib.mbavo_prefetcher_submit_depth(self._handle, path.encode())

    def fetch(self, path: str, height: int, width: int) -> np.ndarray:
        n = height * width
        if self._handle is not None:
            out = np.empty(n, dtype=np.float32)
            got = self._lib.mbavo_prefetcher_fetch_depth(
                self._handle, path.encode(),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            )
            if got == n:
                return out.reshape(height, width)
            # not submitted or failed: fall through to direct parse
        return parse_depth_file(path, height, width)
