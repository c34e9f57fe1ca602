"""ELL (padded-neighborhood) SpMM: scatter-free aggregation.

The COO path pays two irregular passes (gather ~106 GB/s + sorted scatter
~101 GB/s measured on v5e).  ELL keeps the gather but turns the scatter into
a dense reduction: each node's in-neighbors are padded to a fixed width K, so

    out[i] = Σ_k w[i,k] · x[nbr[i,k]]            (N, K, F) → (N, F)

is a gather followed by a streaming sum (≈365 GB/s).  Degree buckets bound
the padding waste: nodes are grouped by ceil-power-of-two degree and each
bucket gets its own (nb, K_b) table; all buckets write disjoint output rows.

Layout is built host-side once per graph; padding slots point at the padded
graph's sink node with weight 0.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp
import flax.struct


@flax.struct.dataclass
class EllBucket:
    rows: jnp.ndarray        # (nb,) output node ids
    cols: jnp.ndarray        # (nb, K) source node ids (padded → sink)
    weights: jnp.ndarray     # (nb, K) float32, 0 on padding


@flax.struct.dataclass
class EllMatrix:
    buckets: Tuple[EllBucket, ...]
    num_nodes: int = flax.struct.field(pytree_node=False)
    transpose: Optional["EllMatrix"] = None   # for the scatter-free VJP


def build_ell(senders: np.ndarray, receivers: np.ndarray, weight: np.ndarray,
              num_nodes_padded: int, min_k: int = 4,
              max_k: int = 4096, with_transpose: bool = True) -> EllMatrix:
    """Build degree-bucketed ELL tables (host-side). Receivers need not be
    sorted.  ``max_k`` is a soft cap on bucket growth: if any node's degree
    exceeds it, the final bucket widens to the true max degree so every edge
    is represented exactly (hub rows pay padding, never dropped edges)."""
    senders = np.asarray(senders, dtype=np.int64)
    receivers = np.asarray(receivers, dtype=np.int64)
    weight = np.asarray(weight, dtype=np.float32)
    n = num_nodes_padded
    sink = n - 1

    order = np.argsort(receivers, kind="stable")
    s, r, w = senders[order], receivers[order], weight[order]
    deg = np.bincount(r, minlength=n)
    starts = np.zeros(n + 1, dtype=np.int64)
    starts[1:] = np.cumsum(deg)

    # bucket nodes by ceil-pow2 degree
    buckets: List[EllBucket] = []
    t = None
    if with_transpose:
        t = build_ell(receivers, senders, weight, num_nodes_padded,
                      min_k=min_k, max_k=max_k, with_transpose=False)

    deg_nodes = np.where(deg > 0)[0]
    if len(deg_nodes) == 0:
        k = min_k
        rows = np.array([sink], dtype=np.int64)
        cols = np.full((1, k), sink, dtype=np.int64)
        ws = np.zeros((1, k), dtype=np.float32)
        return EllMatrix(buckets=(EllBucket(
            rows=jnp.asarray(rows, dtype=jnp.int32),
            cols=jnp.asarray(cols, dtype=jnp.int32),
            weights=jnp.asarray(ws)),), num_nodes=n, transpose=t)

    kmax = int(deg[deg_nodes].max())
    k = min_k
    while True:
        lo = 1 if k == min_k else k // 2 + 1
        hi = k
        if k >= max_k and kmax > k:
            # soft cap: the last bucket widens to the true max degree so
            # hub nodes above max_k keep ALL their edges (dropping them
            # would silently zero those output rows and their gradients)
            hi = k = kmax
        sel = deg_nodes[(deg[deg_nodes] >= lo) & (deg[deg_nodes] <= hi)]
        if len(sel):
            nb = len(sel)
            cols = np.full((nb, k), sink, dtype=np.int64)
            ws = np.zeros((nb, k), dtype=np.float32)
            # vectorized scatter of each node's edge segment into its row
            lens = deg[sel]
            total_e = int(lens.sum())
            offs = np.zeros(nb + 1, dtype=np.int64)
            offs[1:] = np.cumsum(lens)
            row_idx = np.repeat(np.arange(nb), lens)
            col_idx = np.arange(total_e) - np.repeat(offs[:-1], lens)
            flat = (np.arange(total_e) - np.repeat(offs[:-1], lens)
                    + np.repeat(starts[sel], lens))
            cols[row_idx, col_idx] = s[flat]
            ws[row_idx, col_idx] = w[flat]
            buckets.append(EllBucket(
                rows=jnp.asarray(sel, dtype=jnp.int32),
                cols=jnp.asarray(cols, dtype=jnp.int32),
                weights=jnp.asarray(ws)))
        if k >= kmax or k >= max_k:
            break
        k *= 2
    return EllMatrix(buckets=tuple(buckets), num_nodes=n, transpose=t)


def _ell_apply(m: EllMatrix, x: jnp.ndarray) -> jnp.ndarray:
    out = jnp.zeros((m.num_nodes, x.shape[1]), dtype=x.dtype)
    for b in m.buckets:
        gathered = x[b.cols]                       # (nb, K, F)
        agg = jnp.einsum("bk,bkf->bf", b.weights.astype(x.dtype), gathered)
        out = out.at[b.rows].set(agg)              # disjoint rows
    return out


@jax.custom_vjp
def ell_spmm(m: EllMatrix, x: jnp.ndarray) -> jnp.ndarray:
    """out = A·x via scatter-free bucketed gathers. (N_pad, F) → (N_pad, F).

    The VJP runs Aᵀ·g through the transpose ELL structure, so the backward
    pass is scatter-free too (autodiff of the gather would emit an unsorted
    scatter-add — the slowest memory pattern on TPU)."""
    return _ell_apply(m, x)


def _ell_fwd(m, x):
    return _ell_apply(m, x), m


def _ell_bwd(m, g):
    if m.transpose is None:
        raise ValueError("build_ell(with_transpose=True) required for grad")
    return None, _ell_apply(m.transpose, g)


ell_spmm.defvjp(_ell_fwd, _ell_bwd)
