"""ctypes bindings for the native host builders (src/petal_native.cpp).

The shared library is built lazily on first use (``make`` in this
directory); everything degrades gracefully to the NumPy/Python builders
when no toolchain is available — ``available()`` reports which.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["available", "ball_build", "vp_build"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libpetal_native.so")
_lock = threading.Lock()
_lib = None
_tried = False

_METRIC_KIND = {"euclidean": 0, "cosine": 1, "minkowski": 2}

_I64P = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")


def _sig(lib, name, scalar, sp):
    fn = getattr(lib, name)
    fn.restype = ctypes.c_int
    fn.argtypes = (
        [sp, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, scalar]
        + ([ctypes.c_int64, _I64P, sp, sp] if "ball" in name
           else [_I64P, sp, _I64P, _I64P,
                 ctypes.POINTER(ctypes.c_int64),
                 ctypes.POINTER(ctypes.c_int64)])
    )
    return fn


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-s", "-C", _HERE], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib._ball_f32 = _sig(lib, "pn_ball_build_f32", ctypes.c_float, f32p)
        lib._ball_f64 = _sig(lib, "pn_ball_build_f64", ctypes.c_double, f64p)
        lib._vp_f32 = _sig(lib, "pn_vp_build_f32", ctypes.c_float, f32p)
        lib._vp_f64 = _sig(lib, "pn_vp_build_f64", ctypes.c_double, f64p)
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _metric_args(metric) -> tuple[int, float]:
    kind = _METRIC_KIND.get(getattr(metric, "name", "euclidean"))
    if kind is None:
        raise ValueError(f"native builder does not support metric {metric!r}")
    return kind, float(getattr(metric, "p", 2.0))


def ball_build(points: np.ndarray, n_nodes: int, metric):
    """Reference-exact ball-tree build (idx permutation incl. quickselect
    tie order). Returns (centroids, radii, idx) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    kind, p = _metric_args(metric)
    points = np.ascontiguousarray(points)
    n, d = points.shape
    idx = np.empty(n, dtype=np.int64)
    centroids = np.zeros((n_nodes, d), dtype=points.dtype)
    radii = np.zeros(n_nodes, dtype=points.dtype)
    fn = lib._ball_f64 if points.dtype == np.float64 else lib._ball_f32
    rc = fn(points, n, d, kind, p, n_nodes, idx,
            centroids.reshape(-1), radii)
    if rc != 0:
        raise RuntimeError(f"native ball build failed (rc={rc})")
    return centroids, radii, idx


def vp_build(points: np.ndarray, metric):
    """Reference-exact VP-tree build. Returns
    (vp, radius, near, far, root, depth) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    kind, p = _metric_args(metric)
    points = np.ascontiguousarray(points)
    n, d = points.shape
    vp = np.zeros(n, dtype=np.int64)
    radius = np.zeros(n, dtype=points.dtype)
    near = np.full(n, -1, dtype=np.int64)
    far = np.full(n, -1, dtype=np.int64)
    root = ctypes.c_int64(-1)
    depth = ctypes.c_int64(0)
    fn = lib._vp_f64 if points.dtype == np.float64 else lib._vp_f32
    rc = fn(points, n, d, kind, p, vp, radius, near, far,
            ctypes.byref(root), ctypes.byref(depth))
    if rc != 0:
        raise RuntimeError(f"native vp build failed (rc={rc})")
    return vp, radius, near, far, int(root.value), int(depth.value)
