"""Loader for the native host-setup kernels (ctypes, lazy g++ build).

pybind11 is not available in this image, so the C++ kernels are plain
extern "C" functions bound through ctypes.  The shared library is built once
on demand into mgtpu/native/_build/ (or loaded if already present); every
entry point has a pure-numpy fallback in mgtpu/setup, so the framework works
without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_BUILD_DIR = os.path.join(_SRC_DIR, "_build")
_SO_PATH = os.path.join(_BUILD_DIR, "libmgtpu_setup.so")


def _build() -> str | None:
    src = os.path.join(_SRC_DIR, "setup_kernels.cpp")
    if not os.path.exists(src):
        return None
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if (os.path.exists(_SO_PATH)
            and os.path.getmtime(_SO_PATH) >= os.path.getmtime(src)):
        return _SO_PATH
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", src,
           "-o", _SO_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    return _SO_PATH


def get_lib():
    """The loaded library, or None when native kernels are unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        i8p = ctypes.POINTER(ctypes.c_int8)
        lib.mgtpu_aggregate.argtypes = [ctypes.c_int64, i64p, i64p, f64p,
                                        ctypes.c_double, i64p]
        lib.mgtpu_cf_color_first.argtypes = [ctypes.c_int64, i64p, i64p, i8p]
        lib.mgtpu_cf_color_second.argtypes = [ctypes.c_int64, i64p, i64p, i8p]
        _LIB = lib
        return _LIB


def available() -> bool:
    return get_lib() is not None


def _csr_arrays(S):
    indptr = np.ascontiguousarray(S.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(S.indices, dtype=np.int64)
    data = np.ascontiguousarray(S.data, dtype=np.float64)
    return indptr, indices, data


def aggregate(S, tau: float = 3.0) -> np.ndarray | None:
    """Native SA neighborhood aggregation; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    S = S.tocsr()
    S.sort_indices()
    indptr, indices, data = _csr_arrays(S)
    n = S.shape[0]
    aggr = np.empty(n, dtype=np.int64)
    lib.mgtpu_aggregate(
        n,
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        float(tau),
        aggr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return aggr


def cf_coloring(S) -> np.ndarray | None:
    """Native two-pass C/F coloring; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    S = S.tocsr()
    S.sort_indices()
    indptr, indices, _ = _csr_arrays(S)
    n = S.shape[0]
    col = np.zeros(n, dtype=np.int8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i8p = ctypes.POINTER(ctypes.c_int8)
    lib.mgtpu_cf_color_first(n, indptr.ctypes.data_as(i64p),
                             indices.ctypes.data_as(i64p),
                             col.ctypes.data_as(i8p))
    lib.mgtpu_cf_color_second(n, indptr.ctypes.data_as(i64p),
                              indices.ctypes.data_as(i64p),
                              col.ctypes.data_as(i8p))
    return col
