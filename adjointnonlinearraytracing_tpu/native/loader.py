"""Build-on-first-use loader for the native path-matrix kernel.

Compiles pathmatrix.cpp with g++ into a shared library next to this file on
first import (cached thereafter) and exposes it via ctypes.  Falls back to
None when no toolchain is available — callers keep the pure-numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "pathmatrix.cpp")
_LIB = os.path.join(_HERE, "libpathmatrix.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """The loaded ctypes library, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        lib = ctypes.CDLL(_LIB)
        fn = lib.accumulate_linear_paths
        fn.restype = ctypes.c_int64
        fn.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,   # spos, epos
            ctypes.c_int64, ctypes.c_int32,     # num_rays, dim_count
            ctypes.c_double, ctypes.c_int32,    # box_dim, res
            ctypes.c_int32,                     # int_res
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # out buffers
        ]
        gp = lib.accumulate_paths
        gp.restype = ctypes.c_int64
        gp.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,   # spos, sdir
            ctypes.c_void_p, ctypes.c_void_p,   # epos, edir
            ctypes.c_int64, ctypes.c_int32,     # num_rays, dim_count
            ctypes.c_double, ctypes.c_int32,    # box_dim, res
            ctypes.c_int32, ctypes.c_int32,     # int_res, mode
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # path buffers
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # out buffers
        ]
        _lib = lib
        return _lib


def accumulate_linear_paths(spos, epos, box_dim, res, int_res):
    """Native marching; returns (data, row, col) numpy arrays or None.

    Buffers are sized num_rays * (int_res + 1): one emit per substep at most.
    """
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    spos = np.ascontiguousarray(spos, dtype=np.float64)
    epos = np.ascontiguousarray(epos, dtype=np.float64)
    num_rays, dim = spos.shape
    cap = num_rays * (int_res + 1)
    data = np.empty(cap, dtype=np.float64)
    row = np.empty(cap, dtype=np.int64)
    col = np.empty(cap, dtype=np.int64)
    n = lib.accumulate_linear_paths(
        spos.ctypes.data, epos.ctypes.data,
        ctypes.c_int64(num_rays), ctypes.c_int32(dim),
        ctypes.c_double(box_dim), ctypes.c_int32(res),
        ctypes.c_int32(int_res),
        data.ctypes.data, row.ctypes.data, col.ctypes.data)
    return data[:n], row[:n], col[:n]


_MODES = {"linear": 0, "hermite": 1, "true": 2}


def accumulate_paths(spos, sdir, epos, edir, box_dim, res, int_res,
                     spline="linear", path=None, path_start=None,
                     path_end=None):
    """Native marching over linear/hermite/recorded paths.

    Returns (data, row, col) numpy arrays, or None when the native library is
    unavailable (callers keep the pure-numpy marcher).  For ``spline='true'``,
    ``path`` is the flattened (steps * num_rays, dim) trajectory buffer and
    ``path_start``/``path_end`` the per-ray fractional step bounds, exactly as
    in path_matrix.get_true_path.
    """
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    mode = _MODES[spline]
    spos = np.ascontiguousarray(spos, dtype=np.float64)
    epos = np.ascontiguousarray(epos, dtype=np.float64)
    num_rays, dim = spos.shape

    def _buf(a):
        if a is None:
            return None, 0
        a = np.ascontiguousarray(a, dtype=np.float64)
        return a, a.ctypes.data

    sdir, sdir_p = _buf(sdir if mode == 1 else None)
    edir, edir_p = _buf(edir if mode == 1 else None)
    path, path_p = _buf(path if mode == 2 else None)
    pstart, pstart_p = _buf(path_start if mode == 2 else None)
    pend, pend_p = _buf(path_end if mode == 2 else None)

    cap = num_rays * (int_res + 1)
    data = np.empty(cap, dtype=np.float64)
    row = np.empty(cap, dtype=np.int64)
    col = np.empty(cap, dtype=np.int64)
    n = lib.accumulate_paths(
        spos.ctypes.data, sdir_p, epos.ctypes.data, edir_p,
        ctypes.c_int64(num_rays), ctypes.c_int32(dim),
        ctypes.c_double(box_dim), ctypes.c_int32(res),
        ctypes.c_int32(int_res), ctypes.c_int32(mode),
        path_p, pstart_p, pend_p,
        data.ctypes.data, row.ctypes.data, col.ctypes.data)
    return data[:n], row[:n], col[:n]
