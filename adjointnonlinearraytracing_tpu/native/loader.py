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
