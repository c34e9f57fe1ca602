"""Production ingest optimization: community reorder + hybrid operator.

The bench-proven fast path for full-graph training (PERFORMANCE.md):
two-level C++ Leiden ordering makes the adjacency block-dense, then the
hybrid BCSR(MXU)+COO operator replaces XLA's gather/scatter SpMM.  This
module packages that pipeline for the CLI so the reference's full-graph
workloads (``main.py:25-68`` scale datasets) get it, not just ``bench.py``.

Node reorder is exact for full-batch training: a permutation of nodes
permutes rows of every per-node tensor and both endpoints of every edge,
so losses/metrics/optimizer trajectories are unchanged (masks permute
with the nodes).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from fitgnn_tpu.graph.build import build_graph
from fitgnn_tpu.graph.container import Graph

# below this many nodes the plain COO path wins (tile building cost and
# padding overheads dominate small graphs; bench break-even is ~tens of
# thousands of nodes)
AUTO_MIN_NODES = 65_536


def build_optimized_graph(x: np.ndarray, senders: np.ndarray,
                          receivers: np.ndarray, *, y=None, train_mask=None,
                          val_mask=None, test_mask=None,
                          min_block_edges: int = 48,
                          tile_dtype=None, use_segmm: bool = True,
                          tile_group: int = 1,
                          seed: int = 0) -> tuple[Graph, np.ndarray]:
    """Reorder nodes by two-level Leiden communities, build the padded
    ``Graph`` and attach a ``HybridSpmm`` operator as ``g.aux``.

    Returns ``(graph, order)`` where ``order[i]`` is the original id of the
    node now at position ``i`` (use it to map predictions back).
    Defaults are the tuned production config from the round-2 sweep."""
    from fitgnn_tpu.ops.hybrid_spmm import build_hybrid
    from fitgnn_tpu.partition.community import hierarchical_community_order

    senders = np.asarray(senders, dtype=np.int64)
    receivers = np.asarray(receivers, dtype=np.int64)
    n = x.shape[0]
    order = hierarchical_community_order(senders, receivers, n, seed=seed)
    inv = np.empty(n, dtype=np.int64)
    inv[order] = np.arange(n)

    def perm(a):
        return None if a is None else np.asarray(a)[order]

    g = build_graph(np.asarray(x)[order], inv[senders].astype(np.int32),
                    inv[receivers].astype(np.int32), y=perm(y),
                    train_mask=perm(train_mask), val_mask=perm(val_mask),
                    test_mask=perm(test_mask), node_pad_to=128)
    hyb = build_hybrid(np.asarray(g.senders, dtype=np.int64),
                       np.asarray(g.receivers, dtype=np.int64),
                       np.asarray(g.edge_weight), g.num_nodes_padded,
                       min_block_edges=min_block_edges,
                       tile_dtype=tile_dtype, use_segmm=use_segmm,
                       tile_group=tile_group)
    return g._replace(aux=hyb), order


def should_use_hybrid(num_nodes: int, layer_name: str,
                      mode: str = "auto") -> bool:
    """Gate for the CLI: the hybrid operator is consumed by the GCNConv
    aggregation (models/layers.py); other layers use segment ops."""
    if mode == "off":
        return False
    if mode == "on":
        return layer_name == "GCNConv"
    return layer_name == "GCNConv" and num_nodes >= AUTO_MIN_NODES
