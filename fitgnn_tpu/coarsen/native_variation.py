"""ctypes binding for the C++ local-variation coarsening core
(native/variation.cpp).  Falls back to the Python implementation when the
library can't build; parity is asserted in tests/test_native_variation.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from fitgnn_tpu.coarsen.lapgraph import LapGraph

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "variation.cpp")
_SO_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO = os.path.join(_SO_DIR, "libvariation.so")

_lib_handle = None
_build_failed = False


def _lib() -> Optional[ctypes.CDLL]:
    global _lib_handle, _build_failed
    if _lib_handle is not None:
        return _lib_handle
    if _build_failed:
        return None
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            os.makedirs(_SO_DIR, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", _SRC, "-o", _SO],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.variation_neighborhoods.restype = ctypes.c_int64
        lib.variation_neighborhoods.argtypes = [
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_double, ctypes.POINTER(ctypes.c_int64)]
        _lib_handle = lib
        return lib
    except Exception:
        _build_failed = True
        return None


def native_available() -> bool:
    return _lib() is not None


def variation_neighborhoods_native(g: LapGraph, A: np.ndarray,
                                   r: float) -> Optional[np.ndarray]:
    """One level of neighborhood local-variation coarsening in C++.
    Returns the parent map (n,) or None if the native core is unavailable."""
    lib = _lib()
    if lib is None:
        return None
    W = g.W.tocsr()
    W.sort_indices()
    indptr = np.ascontiguousarray(W.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(W.indices, dtype=np.int64)
    wvals = np.ascontiguousarray(W.data, dtype=np.float64)
    deg = np.ascontiguousarray(g.dw, dtype=np.float64)
    A = np.ascontiguousarray(A, dtype=np.float64)
    out = np.empty(g.N, dtype=np.int64)

    def p64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    def pd(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    k = lib.variation_neighborhoods(
        g.N, p64(indptr), p64(indices), pd(wvals), pd(deg), pd(A),
        A.shape[1], float(r), p64(out))
    if k < 0:
        return None
    return out
