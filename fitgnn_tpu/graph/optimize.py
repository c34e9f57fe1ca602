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

import dataclasses

import numpy as np

from fitgnn_tpu.graph.build import build_graph
from fitgnn_tpu.graph.container import Graph

# below this many nodes the plain COO path wins (tile building cost and
# padding overheads dominate small graphs; bench break-even is ~tens of
# thousands of nodes)
AUTO_MIN_NODES = 65_536


_LAYER_SEMANTICS = {"GCNConv": "gcn_norm", "SAGEConv": "mean_nonself",
                    "GINConv": "sum_nonself", "GATConv": "att_unit"}


def _operator_weights(senders, receivers, gcn_weight, num_nodes,
                      semantics: str) -> np.ndarray:
    """Edge weights encoding a layer's aggregation as a static SpMM.
    Padding edges (weight-0 self-loops on the pad node) stay 0."""
    s = np.asarray(senders, dtype=np.int64)
    r = np.asarray(receivers, dtype=np.int64)
    if semantics == "gcn_norm":
        return np.asarray(gcn_weight)
    if semantics == "att_unit":             # GAT: presence incl self-loops
        return (np.asarray(gcn_weight) > 0).astype(np.float32)
    nonself = (s != r).astype(np.float32)
    if semantics == "sum_nonself":          # GIN Σ_neigh
        return nonself
    if semantics == "mean_nonself":         # SAGE mean_neigh (0 if none)
        indeg = np.bincount(r[nonself > 0], minlength=num_nodes)
        return (nonself / np.maximum(indeg[r], 1.0)).astype(np.float32)
    raise ValueError(f"unknown operator semantics {semantics!r}")


def build_optimized_graph(x: np.ndarray, senders: np.ndarray,
                          receivers: np.ndarray, *, y=None, train_mask=None,
                          val_mask=None, test_mask=None,
                          min_block_edges: int = 48,
                          tile_dtype=None, use_segmm: bool = True,
                          tile_group: int = 1, layer_name: str = "GCNConv",
                          use_diag: bool = False,
                          cluster_att: int = 0,
                          cluster_att_exact: int = 0,
                          cluster_agg: int = 0,
                          cluster_agg_exact: int = 0,
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

    for nm, K in (("cluster_att", cluster_att), ("cluster_agg",
                                                  cluster_agg)):
        if K and (K % 128 or K <= 0):
            raise ValueError(f"{nm}={K} must be a positive "
                             "multiple of the 128 tile block")
    g = build_graph(np.asarray(x)[order], inv[senders].astype(np.int32),
                    inv[receivers].astype(np.int32), y=perm(y),
                    train_mask=perm(train_mask), val_mask=perm(val_mask),
                    test_mask=perm(test_mask),
                    # cluster summaries reduce over contiguous equal-size
                    # node groups: pad the node space to a whole cluster
                    node_pad_to=cluster_att or cluster_agg or 128)
    semantics = _LAYER_SEMANTICS[layer_name]
    w_op = _operator_weights(g.senders, g.receivers, g.edge_weight,
                             g.num_nodes_padded, semantics)
    if min_block_edges == "auto":
        from fitgnn_tpu.graph.planner import plan_config
        real_e = np.asarray(w_op) > 0
        pc = plan_config(np.asarray(g.senders, np.int64)[real_e],
                         np.asarray(g.receivers, np.int64)[real_e],
                         g.num_nodes_padded, layer_name=layer_name,
                         cluster=cluster_att or cluster_agg)
        min_block_edges = pc.min_block_edges
        print(f"auto-config: tile threshold {min_block_edges} "
              f"(predicted {pc.predicted_ms:.1f} ms hybrid cost)")
    hyb = build_hybrid(np.asarray(g.senders, dtype=np.int64),
                       np.asarray(g.receivers, dtype=np.int64),
                       w_op, g.num_nodes_padded,
                       min_block_edges=min_block_edges,
                       tile_dtype=tile_dtype,
                       use_segmm=use_segmm, use_diag=use_diag,
                       tile_group=tile_group, semantics=semantics,
                       cluster_att=cluster_att,
                       cluster_att_exact=cluster_att_exact,
                       cluster_agg=cluster_agg,
                       cluster_agg_exact=cluster_agg_exact, real_nodes=n)
    return g._replace(aux=hyb), order


def optimize_coarse(coarse, *, min_block_edges: int = 48, tile_dtype=None,
                    use_segmm: bool = True, tile_group: int = 1,
                    layer_name: str = "GCNConv", cluster_att: int = 0,
                    cluster_att_exact: int = 0, cluster_agg: int = 0,
                    cluster_agg_exact: int = 0, seed: int = 0):
    """Leiden-reorder a ``CoarseData``'s graph and attach the hybrid
    operator — the Gc phase at products scale (~165k metanodes,
    reference ``main.py:247-267``) is a full-graph training problem and
    gets the same fast path as ``--baseline``.

    Only the coarse graph's own node order changes (plus its label/mask
    views); nothing else indexes Gc rows — the Gs phase consumes the
    transferred parameters, not Gc node ids."""
    import jax.numpy as jnp

    from fitgnn_tpu.ops.hybrid_spmm import build_hybrid
    from fitgnn_tpu.partition.community import hierarchical_community_order

    g = coarse.graph
    n_real = int(g.n_node)
    n_pad = g.num_nodes_padded
    s = np.asarray(g.senders, dtype=np.int64)
    r = np.asarray(g.receivers, dtype=np.int64)
    w = np.asarray(g.edge_weight)
    e_real = int(g.n_edge)
    order = hierarchical_community_order(s[:e_real], r[:e_real], n_real,
                                         seed=seed)
    perm = np.concatenate([order, np.arange(n_real, n_pad)])  # pads stay
    inv = np.empty(n_pad, dtype=np.int64)
    inv[perm] = np.arange(n_pad)
    s2, r2 = inv[s], inv[r]
    # Graph invariant: receivers sorted ascending (padding tail self-loops
    # on the pad node keep weight 0, so they sort to the end naturally)
    esort = np.argsort(r2, kind="stable")
    s2, r2, w2 = s2[esort], r2[esort], w[esort]

    # the BCSR tiles need a 128-multiple node count (cluster summaries a
    # whole-cluster multiple): extend node arrays with inert padding (zero
    # features, False masks; existing padding edges keep their weight-0
    # self-loops on the old pad node)
    extra = (-n_pad) % (cluster_att or cluster_agg or 128)
    n_pad += extra

    def pnode(a):
        if a is None:
            return None
        a = np.asarray(a)[perm]
        if extra:
            widths = [(0, extra)] + [(0, 0)] * (a.ndim - 1)
            a = np.pad(a, widths)
        return jnp.asarray(a)

    semantics = _LAYER_SEMANTICS[layer_name]
    w_op = _operator_weights(s2, r2, w2, n_pad, semantics)
    if min_block_edges == "auto":
        # cost-model threshold from the REORDERED tile histogram (the
        # planner's test set is the measured round-2..4 champions)
        from fitgnn_tpu.graph.planner import plan_config
        real_e = w_op > 0
        pc = plan_config(s2[real_e], r2[real_e], n_pad,
                         layer_name=layer_name,
                         cluster=cluster_att or cluster_agg)
        min_block_edges = pc.min_block_edges
        print(f"auto-config: tile threshold {min_block_edges} "
              f"(predicted {pc.predicted_ms:.1f} ms hybrid cost)")
    hyb = build_hybrid(s2, r2, w_op, n_pad,
                       min_block_edges=min_block_edges,
                       tile_dtype=tile_dtype,
                       use_segmm=use_segmm,
                       tile_group=tile_group, semantics=semantics,
                       cluster_att=cluster_att,
                       cluster_att_exact=cluster_att_exact,
                       cluster_agg=cluster_agg,
                       cluster_agg_exact=cluster_agg_exact,
                       real_nodes=n_real)
    g2 = g._replace(x=pnode(g.x), senders=jnp.asarray(s2, dtype=jnp.int32),
                    receivers=jnp.asarray(r2, dtype=jnp.int32),
                    edge_weight=jnp.asarray(w2), y=pnode(g.y),
                    train_mask=pnode(g.train_mask),
                    val_mask=pnode(g.val_mask),
                    test_mask=pnode(g.test_mask), aux=hyb)
    return dataclasses.replace(
        coarse, graph=g2, y_train=pnode(coarse.y_train),
        train_mask=pnode(coarse.train_mask), y_val=pnode(coarse.y_val),
        val_mask=pnode(coarse.val_mask))


def should_use_hybrid(num_nodes: int, layer_name: str,
                      mode: str = "auto") -> bool:
    """Gate for the CLI: GCN/SAGE/GIN aggregations are static-weight SpMMs;
    GAT consumes the presence tiles through the flash-attention-style
    dense-tile path (ops/tile_gat.py)."""
    if mode == "off":
        return False
    if mode == "on":
        return layer_name in _LAYER_SEMANTICS
    return layer_name in _LAYER_SEMANTICS and num_nodes >= AUTO_MIN_NODES
