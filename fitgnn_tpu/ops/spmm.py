"""SpMM: sparse adjacency × dense features, the GNN hot op.

Two execution paths, both differentiable:

* ``spmm_coo``  — gather + sorted ``segment_sum``; XLA fuses this into a
  single scatter loop and it is the robust default for arbitrary sparsity.
* BCSR Pallas kernel (``fitgnn_tpu.ops.pallas.bsr_spmm``) — community-reordered
  graphs give dense 128×128 adjacency tiles, which we multiply on the MXU.
  Selected by ``spmm`` when a precomputed ``BsrMatrix`` is supplied.

This is the first-party replacement for ``torch_sparse`` SpMM (reference hot
loop #1, SURVEY §3 — PyG conv → torch_scatter SpMM).
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from fitgnn_tpu.ops.segment import segment_sum

# Subgraphs this small aggregate through a DENSE per-graph adjacency: one
# E-element scatter builds (N, N), then the aggregation is a plain matmul
# the MXU eats (and under vmap, a batched matmul across the whole chunk).
# The per-edge path instead moves (E, F) gathered messages per LAYER per
# DIRECTION — at the flagship's bucket shapes (N=40/E=256 and N=400/
# E=7168, F=512) the A/B measured 11.2 → 2.3 s/epoch on the products
# Gs phase (PERFORMANCE.md round 4) with both buckets dense.  Memory is
# also smaller whenever N² < E·F (true for every flagship bucket).  The
# reference streams these same subgraphs through PyG's scatter path one
# at a time (run.py:184-197).
DENSE_SPMM_MAX_N = int(os.environ.get("FITGNN_DENSE_SPMM_N", "512"))


def use_dense(num_nodes: int) -> bool:
    """True when ``spmm_coo`` takes the dense-adjacency branch — read at
    call time so layers can key sibling aggregations off the same knob."""
    return num_nodes <= DENSE_SPMM_MAX_N


def spmm_coo(edge_weight: jnp.ndarray, senders: jnp.ndarray,
             receivers: jnp.ndarray, x: jnp.ndarray, num_nodes: int,
             indices_are_sorted: bool = True) -> jnp.ndarray:
    """out[r] = Σ_{e: recv[e]=r} w[e] · x[send[e]]  — (N, F) result.

    Padding edges must have weight 0 (they then contribute nothing even
    though they point at the padding node).
    """
    if use_dense(num_nodes) and x.ndim == 2:
        adj = jnp.zeros((num_nodes, num_nodes), dtype=x.dtype)
        # padding edges self-loop on the padding node with weight 0, so
        # they land in-bounds and contribute nothing
        adj = adj.at[receivers, senders].add(edge_weight.astype(x.dtype))
        return adj @ x
    from fitgnn_tpu.ops.segment import take_rows
    gathered = take_rows(x, senders) * edge_weight[:, None].astype(x.dtype)
    return segment_sum(gathered, receivers, num_nodes,
                       indices_are_sorted=indices_are_sorted)


def spmm(edge_weight, senders, receivers, x, num_nodes, *, operator=None):
    """Dispatch on a precomputed operator structure: ``HybridSpmm`` (BCSR
    tiles + straggler COO), ``BsrMatrix``, or ``EllMatrix``; plain COO
    otherwise."""
    if operator is not None:
        name = type(operator).__name__
        if name == "HybridSpmm":
            from fitgnn_tpu.ops.hybrid_spmm import hybrid_spmm
            return hybrid_spmm(operator, x)
        if name == "BsrMatrix":
            from fitgnn_tpu.ops.pallas.bsr_spmm import bsr_spmm
            return bsr_spmm(operator, x)
        if name == "EllMatrix":
            from fitgnn_tpu.ops.ell_spmm import ell_spmm
            return ell_spmm(operator, x)
        if name == "SegMM":
            from fitgnn_tpu.ops.pallas.coo_segmm import segmm_spmm
            return segmm_spmm(operator, x)
        raise TypeError(f"unknown SpMM operator {name}")
    return spmm_coo(edge_weight, senders, receivers, x, num_nodes)
