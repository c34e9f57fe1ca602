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

import jax.numpy as jnp

from fitgnn_tpu.ops.segment import segment_sum


def spmm_coo(edge_weight: jnp.ndarray, senders: jnp.ndarray,
             receivers: jnp.ndarray, x: jnp.ndarray, num_nodes: int,
             indices_are_sorted: bool = True) -> jnp.ndarray:
    """out[r] = Σ_{e: recv[e]=r} w[e] · x[send[e]]  — (N, F) result.

    Padding edges must have weight 0 (they then contribute nothing even
    though they point at the padding node).
    """
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
