"""ctypes bindings for the native C++ preprocessing core (native/pipeline.cpp).

The shared library is built on demand with the in-repo Makefile (g++ -O3);
when unavailable (no toolchain), callers fall back to the pure-numpy pipeline
— both produce identical outputs (tests/test_native.py asserts parity).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhypad_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


class _HypadResult(ctypes.Structure):
    _fields_ = [
        ("index", ctypes.POINTER(ctypes.c_double)),
        ("n_buckets", ctypes.c_int64),
        ("windows", ctypes.POINTER(ctypes.c_float)),
        ("targets", ctypes.POINTER(ctypes.c_float)),
        ("x_index", ctypes.POINTER(ctypes.c_double)),
        ("y_index", ctypes.POINTER(ctypes.c_double)),
        ("n_windows", ctypes.c_int64),
        ("window_size", ctypes.c_int64),
        ("target_size", ctypes.c_int64),
    ]


def _build():
    subprocess.run(["make", "-s"], cwd=_NATIVE_DIR, check=True,
                   capture_output=True)


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            # always invoke make: its mtime check rebuilds when pipeline.cpp
            # is newer than the .so (the binary is not in version control),
            # and is a no-op otherwise
            _build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.hypad_prepare_univariate.restype = ctypes.POINTER(_HypadResult)
            lib.hypad_prepare_univariate.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64, ctypes.c_double, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,
            ]
            lib.hypad_release.argtypes = [ctypes.POINTER(_HypadResult)]
            lib.hypad_release.restype = None
            lib.hypad_find_thresholds.restype = None
            lib.hypad_find_thresholds.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available():
    return get_lib() is not None


def prepare_univariate(timestamps, values, interval, window_size=100,
                       target_size=1, step_size=1):
    """Native full-pipeline pass. Returns
    (windows f32 (M, W), targets f32 (M, T), x_index, y_index, index)
    or None when the native library is unavailable / signal too short."""
    lib = get_lib()
    if lib is None:
        return None
    ts = np.ascontiguousarray(timestamps, dtype=np.float64)
    vs = np.ascontiguousarray(values, dtype=np.float64)
    res = lib.hypad_prepare_univariate(
        ts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        vs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(ts), float(interval), window_size, target_size, step_size)
    if not res:
        return None
    try:
        r = res.contents
        M, W, T = r.n_windows, r.window_size, r.target_size
        windows = np.ctypeslib.as_array(r.windows, shape=(M, W)).copy()
        targets = np.ctypeslib.as_array(r.targets, shape=(M, T)).copy()
        x_index = np.ctypeslib.as_array(r.x_index, shape=(M,)).copy()
        y_index = np.ctypeslib.as_array(r.y_index, shape=(M,)).copy()
        index = np.ctypeslib.as_array(r.index, shape=(r.n_buckets,)).copy()
        return windows, targets, x_index, y_index, index
    finally:
        lib.hypad_release(res)


def find_thresholds(windows, means, stds, min_z=0, max_z=10):
    """Native dynamic-threshold engine (native/thresholds.cpp): the
    reference find_threshold (fmin from every integer z start, last finite
    cost wins) for a (Wn, L) stack of threshold windows. ``means``/``stds``
    are the numpy-computed window statistics (numpy's pairwise reductions
    are not replicated natively). Returns (Wn,) thresholds, or None when
    the native library is unavailable — callers fall back to the pure-numpy
    batched Nelder-Mead (bitwise-identical results,
    tests/test_intervals_batch.py)."""
    lib = get_lib()
    if lib is None:
        return None
    W = np.ascontiguousarray(windows, dtype=np.float64)
    m = np.ascontiguousarray(means, dtype=np.float64)
    s = np.ascontiguousarray(stds, dtype=np.float64)
    out = np.empty(W.shape[0], np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.hypad_find_thresholds(
        W.ctypes.data_as(dp), m.ctypes.data_as(dp), s.ctypes.data_as(dp),
        W.shape[0], W.shape[1], int(min_z), int(max_z),
        out.ctypes.data_as(dp))
    return out
