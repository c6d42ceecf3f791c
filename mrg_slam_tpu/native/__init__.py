"""ctypes bindings for the C++ host runtime (csrc/native.cpp).

Builds the shared library on first use (g++ via csrc/Makefile) and caches
it. Every entry point has a numpy-only signature; `available()` gates use so
environments without a toolchain degrade to the pure-JAX/numpy paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_CSRC = Path(__file__).resolve().parent.parent.parent / "csrc"
_LIB_PATH = _CSRC / "libmrg_slam_native.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_CSRC)], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.kdtree_build.restype = ctypes.c_void_p
    lib.kdtree_build.argtypes = [f32p, ctypes.c_int32]
    lib.kdtree_free.argtypes = [ctypes.c_void_p]
    lib.kdtree_knn.argtypes = [ctypes.c_void_p, f32p, ctypes.c_int32,
                               ctypes.c_int32, i32p, f32p]
    lib.radius_count.argtypes = [f32p, ctypes.c_int32, ctypes.c_float, i32p]
    lib.voxel_downsample.restype = ctypes.c_int32
    lib.voxel_downsample.argtypes = [f32p, ctypes.c_int32, ctypes.c_float,
                                     ctypes.c_int32, f32p, ctypes.c_int32]
    lib.distance_filter.restype = ctypes.c_int32
    lib.distance_filter.argtypes = [f32p, ctypes.c_int32, ctypes.c_float,
                                    ctypes.c_float, f32p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


class KdTree:
    """Exact kd-tree (golden reference for the MXU brute-force NN)."""

    def __init__(self, points: np.ndarray):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._pts = np.ascontiguousarray(points, np.float32)
        self._handle = lib.kdtree_build(self._pts, len(self._pts))

    def knn(self, queries: np.ndarray, k: int
            ) -> Tuple[np.ndarray, np.ndarray]:
        q = np.ascontiguousarray(queries, np.float32)
        idx = np.empty((len(q), k), np.int32)
        d2 = np.empty((len(q), k), np.float32)
        self._lib.kdtree_knn(self._handle, q, len(q), k, idx, d2)
        return d2, idx

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.kdtree_free(self._handle)
            self._handle = None


def radius_count(points: np.ndarray, radius: float) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty(len(pts), np.int32)
    lib.radius_count(pts, len(pts), radius, out)
    return out


def voxel_downsample(points: np.ndarray, resolution: float,
                     min_points: int = 1) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty_like(pts)
    n = lib.voxel_downsample(pts, len(pts), resolution, min_points, out,
                             len(pts))
    return out[:n].copy()


def distance_filter(points: np.ndarray, near: float, far: float) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty_like(pts)
    n = lib.distance_filter(pts, len(pts), near, far, out)
    return out[:n].copy()
