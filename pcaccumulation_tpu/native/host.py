"""ctypes bindings for the native host library (libpcacc_host.so).

Auto-builds with `make` on first import if the toolchain is present; falls
back to None so pure-numpy paths keep working.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libpcacc_host.so")
_lib = None


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_DIR, "pcacc_host.cpp")
    # an install may ship only the .so; a missing source is "not stale"
    stale = (not os.path.exists(_LIB_PATH)
             or (os.path.exists(src)
                 and os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)))
    if stale:
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-B"], check=True, capture_output=True,
                timeout=120,
            )
        except Exception:
            if not os.path.exists(_LIB_PATH):
                return None  # no library at all; else use the stale build
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.voxelize.restype = ctypes.c_int
    lib.voxelize.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.transform_filter.restype = ctypes.c_int
    lib.transform_filter.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    if hasattr(lib, "sort_by_key"):
        lib.sort_by_key.restype = ctypes.c_int
        lib.sort_by_key.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
    _lib = lib
    return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def native_sort_by_key(keys: np.ndarray, n_buckets: int):
    """Stable counting-sort argsort over small-int keys (invalid/overflow
    keys >= n_buckets share one LAST bucket). Returns int32 order or None
    when the library (or symbol) is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "sort_by_key"):
        return None
    keys = np.ascontiguousarray(keys, np.int32)
    order = np.empty(keys.shape[0], np.int32)
    lib.sort_by_key(
        _ptr(keys, ctypes.c_int32), ctypes.c_int64(keys.shape[0]),
        ctypes.c_int32(n_buckets), _ptr(order, ctypes.c_int32),
    )
    return order


def native_voxelize(points, time_idx, voxel_size, pc_range, n_sweeps, max_pillars):
    """Native equivalent of data/voxelizer.voxelize; returns the same tuple
    or None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, np.float32)
    time_idx = np.ascontiguousarray(time_idx, np.int32)
    voxel = np.asarray(voxel_size, np.float32)
    rng = np.asarray(pc_range, np.float32)
    n = points.shape[0]

    coords = np.zeros((max_pillars, 3), np.int32)
    p2v = np.zeros(n, np.int32)
    count = np.zeros(1, np.int32)
    lib.voxelize(
        _ptr(points, ctypes.c_float), _ptr(time_idx, ctypes.c_int32),
        ctypes.c_int64(n), _ptr(voxel, ctypes.c_float), _ptr(rng, ctypes.c_float),
        ctypes.c_int32(n_sweeps), ctypes.c_int32(max_pillars),
        _ptr(coords, ctypes.c_int32), _ptr(p2v, ctypes.c_int32),
        _ptr(count, ctypes.c_int32),
    )
    m = int(count[0])
    pillar_valid = np.zeros(max_pillars, bool)
    pillar_valid[:m] = True
    in_range = p2v < max_pillars
    return coords, pillar_valid, p2v, in_range
