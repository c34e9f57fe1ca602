"""ctypes binding for the C++ blossom matching (native/blossom.cpp)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "blossom.cpp")
_SO_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO = os.path.join(_SO_DIR, "libblossom.so")

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
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
                 "-o", _SO],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.max_weight_matching.restype = ctypes.c_int64
        lib.max_weight_matching.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64)]
        _lib_handle = lib
        return lib
    except Exception:
        _build_failed = True
        return None


def native_available() -> bool:
    return _lib() is not None


def max_weight_matching_native(edges: np.ndarray, weights: np.ndarray,
                               num_nodes: int, max_cardinality: bool = False
                               ) -> Optional[np.ndarray]:
    """mate array (n,), -1 = unmatched; None if the native core is
    unavailable or the instance exceeds its dense-storage bound."""
    lib = _lib()
    if lib is None or num_nodes > 3000:
        return None
    eu = np.ascontiguousarray(edges[0], dtype=np.int64)
    ev = np.ascontiguousarray(edges[1], dtype=np.int64)
    ew = np.ascontiguousarray(weights, dtype=np.float64)
    mate = np.empty(num_nodes, dtype=np.int64)

    def p64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    pairs = lib.max_weight_matching(
        num_nodes, len(eu), p64(eu), p64(ev),
        ew.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        int(max_cardinality), p64(mate))
    if pairs < 0:
        return None
    return mate
