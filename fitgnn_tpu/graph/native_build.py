"""ctypes binding for the C++ graph ingest core (native/graphbuild.cpp).

``build_graph`` switches to this path automatically above
``NATIVE_EDGE_THRESHOLD`` edges; the numpy path stays as the oracle (parity
tested in tests/test_native_build.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "graphbuild.cpp")
_SO_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO = os.path.join(_SO_DIR, "libgraphbuild.so")

NATIVE_EDGE_THRESHOLD = 2_000_000

_lib_handle = None


def _lib() -> ctypes.CDLL:
    global _lib_handle
    if _lib_handle is not None:
        return _lib_handle
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        os.makedirs(_SO_DIR, exist_ok=True)
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True)
    lib = ctypes.CDLL(_SO)
    lib.build_graph_edges.restype = ctypes.c_int64
    lib.build_graph_edges.argtypes = [
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    _lib_handle = lib
    return lib


def _ptr_i64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def build_edges_native(
    senders: np.ndarray, receivers: np.ndarray, num_nodes: int,
    undirected: bool = True, self_loops: bool = True, normalize: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (senders, receivers, weights) sorted by receiver then sender,
    deduplicated, optionally symmetrized/self-looped/GCN-normalized."""
    s = np.ascontiguousarray(senders, dtype=np.int64)
    r = np.ascontiguousarray(receivers, dtype=np.int64)
    m = len(s)
    cap = (2 * m if undirected else m) + (num_nodes if self_loops else 0)
    cap = max(cap, 1)
    out_s = np.empty(cap, dtype=np.int64)
    out_r = np.empty(cap, dtype=np.int64)
    out_w = np.empty(cap, dtype=np.float32)
    n_out = _lib().build_graph_edges(
        num_nodes, m, _ptr_i64(s), _ptr_i64(r),
        int(undirected), int(self_loops), int(normalize),
        _ptr_i64(out_s), _ptr_i64(out_r),
        out_w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap)
    if n_out < 0:
        raise RuntimeError("build_graph_edges failed (bad input or cap)")
    return out_s[:n_out], out_r[:n_out], out_w[:n_out]
