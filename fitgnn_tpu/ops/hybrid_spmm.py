"""Hybrid BCSR + COO SpMM.

Community-reordered graphs put most edges inside dense 128×128 adjacency
tiles (MXU food, streamed at HBM bandwidth), but a power-law tail of cut
edges would fill millions of nearly-empty tiles.  The hybrid splits edges by
tile occupancy:

* tiles with ≥ ``min_block_edges`` edges → dense BCSR tiles (Pallas MXU
  kernel, ``ops/pallas/bsr_spmm.py``);
* the remainder → COO gather + sorted segment-sum.

Both halves are differentiable (BCSR via its transpose-structure VJP); the
adjacency is constant in every FIT-GNN mode so only dX flows.

Traffic model: a dense tile costs ~(64 + 2·F/256) KB; a COO edge costs
~F·4 B gathered + amortized output.  With F=512 the break-even is ≈150
edges/tile — the default threshold.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp
import flax.struct

from fitgnn_tpu.ops.pallas.bsr_spmm import BsrMatrix, build_bsr, bsr_spmm, BLOCK
from fitgnn_tpu.ops.ell_spmm import EllMatrix, build_ell, ell_spmm
from fitgnn_tpu.ops.spmm import spmm_coo


@flax.struct.dataclass
class HybridSpmm:
    bsr: Optional[BsrMatrix]           # None when no tile is dense enough
    ell: Optional[EllMatrix]           # straggler edges (scatter-free)
    num_coo: int = flax.struct.field(pytree_node=False)
    num_nodes: int = flax.struct.field(pytree_node=False)

    @property
    def num_coo_edges(self) -> int:
        return self.num_coo


def build_hybrid(senders: np.ndarray, receivers: np.ndarray,
                 weight: np.ndarray, num_nodes_padded: int,
                 min_block_edges: int = 150,
                 block: int = BLOCK) -> HybridSpmm:
    """Split edges by tile occupancy and build both structures (host-side)."""
    assert num_nodes_padded % block == 0
    senders = np.asarray(senders, dtype=np.int64)
    receivers = np.asarray(receivers, dtype=np.int64)
    weight = np.asarray(weight, dtype=np.float32)
    nb = num_nodes_padded // block
    tile = (receivers // block) * nb + (senders // block)
    uniq, inv, counts = np.unique(tile, return_inverse=True,
                                  return_counts=True)
    dense_edge = counts[inv] >= min_block_edges

    bsr = None
    if dense_edge.any():
        bsr = build_bsr(senders[dense_edge].astype(np.int64),
                        receivers[dense_edge].astype(np.int64),
                        weight[dense_edge], num_nodes_padded, block=block)

    cs, cr, cw = (senders[~dense_edge], receivers[~dense_edge],
                  weight[~dense_edge])
    ell = None
    if len(cs):
        ell = build_ell(cs, cr, cw, num_nodes_padded)
    return HybridSpmm(bsr=bsr, ell=ell, num_coo=int(len(cs)),
                      num_nodes=num_nodes_padded)


def hybrid_spmm(h: HybridSpmm, x: jnp.ndarray) -> jnp.ndarray:
    if h.ell is not None:
        out = ell_spmm(h.ell, x)
    else:
        out = jnp.zeros((h.num_nodes, x.shape[1]), dtype=x.dtype)
    if h.bsr is not None:
        out = out + bsr_spmm(h.bsr, x)
    return out
