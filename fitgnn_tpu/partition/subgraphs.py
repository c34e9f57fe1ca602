"""Metanode→subgraph extraction with the three node modes.

Array-native reimplementation of the reference's per-metanode subgraph
builder (``utils.py:143-374``), with the same capability surface:

* **plain**        — induced subgraph on each metanode's member nodes.
* **extra_node**   — members + 1-hop halo; halo nodes excluded from loss
  (``utils.py:235-239``).  Unlike the reference — whose positional mask
  misaligns with its re-sorted node list — the consume mask here marks
  exactly the member nodes.
* **cluster_node** — members + one summary node per adjacent coarse cluster,
  summary features = that cluster's coarse feature row (``C·X``), boundary
  edges node↔summary, plus summary↔summary edges where the coarse adjacency
  connects the clusters (``utils.py:191-232``).

Output is a single padded ``SubgraphBatch`` (uniform static shapes) ready for
vmapped device execution — replacing the reference's Python list streaming.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp

from fitgnn_tpu.graph.build import gcn_normalize, _round_up
from fitgnn_tpu.graph.container import SubgraphBatch

MODES = ("plain", "extra_node", "cluster_node")


@dataclasses.dataclass
class SubgraphSpec:
    """Host-side (numpy) subgraph before padding."""

    orig_idx: np.ndarray       # (n,) global node ids; -1 for summary nodes
    consume: np.ndarray        # (n,) bool — nodes whose outputs this owns
    x: np.ndarray              # (n, F) features (summary rows appended)
    senders: np.ndarray        # (e,) local edge list (undirected, both dirs)
    receivers: np.ndarray      # (e,)

    @property
    def num_nodes(self) -> int:
        return self.orig_idx.shape[0]


def extract_subgraphs(
    W: sp.spmatrix,
    x: np.ndarray,
    parent: np.ndarray,
    mode: str = "plain",
    coarse_x: Optional[np.ndarray] = None,
    coarse_W: Optional[sp.spmatrix] = None,
) -> List[SubgraphSpec]:
    """Build one SubgraphSpec per metanode.

    ``W``: full-graph symmetric adjacency (csr).  ``parent``: (N,) global
    node→metanode map.  ``coarse_x``/``coarse_W`` required for cluster_node.
    """
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
    W = sp.csr_matrix(W)
    N = W.shape[0]
    num_meta = int(parent.max()) + 1 if parent.size else 0
    if mode == "cluster_node":
        assert coarse_x is not None and coarse_W is not None, \
            "cluster_node needs coarse features and coarse adjacency"
        coarse_W = sp.csr_matrix(coarse_W)

    # members per metanode (vectorized group-by)
    order = np.argsort(parent, kind="stable")
    bounds = np.searchsorted(parent[order], np.arange(num_meta + 1))
    specs: List[SubgraphSpec] = []
    indptr, indices = W.indptr, W.indices

    for m in range(num_meta):
        core = np.sort(order[bounds[m]:bounds[m + 1]])
        in_core = np.zeros(N, dtype=bool)
        in_core[core] = True
        # neighbors of the core (concatenated CSR rows)
        neigh = np.unique(np.concatenate(
            [indices[indptr[i]:indptr[i + 1]] for i in core])) \
            if len(core) else np.empty(0, dtype=indices.dtype)
        outside = neigh[~in_core[neigh]]

        if mode == "extra_node":
            nodes = np.sort(np.concatenate([core, outside]))
            consume = in_core[nodes]
            s_loc, r_loc = _induced_edges(W, nodes, N)
            feats = x[nodes]
            orig = nodes
        elif mode == "cluster_node":
            nodes = core
            consume_core = np.ones(len(core), dtype=bool)
            s_loc, r_loc = _induced_edges(W, nodes, N)
            # which clusters touch which core nodes: boundary edges (u∈core →
            # v∉core) mapped to parent[v]
            lookup = np.full(N, -1, dtype=np.int64)
            lookup[nodes] = np.arange(len(nodes))
            bs, bt = _boundary_edges(W, core, in_core)
            bclusters = parent[bt]
            clusters, cl_inv = np.unique(bclusters, return_inverse=True)
            n_sum = len(clusters)
            # summary nodes appended after core
            sum_ids = len(core) + np.arange(n_sum)
            e1 = lookup[bs]
            e2 = sum_ids[cl_inv]
            # dedupe node↔summary edges
            key = e1.astype(np.int64) * (len(core) + n_sum) + e2
            _, keep = np.unique(key, return_index=True)
            e1, e2 = e1[keep], e2[keep]
            # summary↔summary edges from coarse adjacency
            ss_s, ss_r = [], []
            if n_sum > 1:
                sub_cw = coarse_W[clusters][:, clusters].tocoo()
                upper = sub_cw.row < sub_cw.col
                ss_s = sum_ids[sub_cw.row[upper]]
                ss_r = sum_ids[sub_cw.col[upper]]
            s_loc = np.concatenate([s_loc, e1, e2, np.asarray(ss_s, dtype=np.int64),
                                    np.asarray(ss_r, dtype=np.int64)])
            r_loc = np.concatenate([r_loc, e2, e1, np.asarray(ss_r, dtype=np.int64),
                                    np.asarray(ss_s, dtype=np.int64)])
            feats = np.concatenate([x[core], coarse_x[clusters]], axis=0) \
                if n_sum else x[core]
            consume = np.concatenate([consume_core, np.zeros(n_sum, dtype=bool)])
            orig = np.concatenate([core, np.full(n_sum, -1, dtype=np.int64)])
        else:  # plain
            nodes = core
            consume = np.ones(len(core), dtype=bool)
            s_loc, r_loc = _induced_edges(W, nodes, N)
            feats = x[nodes]
            orig = nodes

        specs.append(SubgraphSpec(
            orig_idx=np.asarray(orig, dtype=np.int64),
            consume=consume,
            x=np.asarray(feats, dtype=np.float32),
            senders=np.asarray(s_loc, dtype=np.int64),
            receivers=np.asarray(r_loc, dtype=np.int64)))
    return specs


def _induced_edges(W: sp.csr_matrix, nodes: np.ndarray, N: int):
    """Local edge list (both directions) of the induced subgraph."""
    if len(nodes) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    sub = W[nodes][:, nodes].tocoo()
    return sub.row.astype(np.int64), sub.col.astype(np.int64)


def _boundary_edges(W: sp.csr_matrix, core: np.ndarray, in_core: np.ndarray):
    """Directed boundary edges u∈core → v∉core (global ids)."""
    indptr, indices = W.indptr, W.indices
    srcs, dsts = [], []
    for u in core:
        nb = indices[indptr[u]:indptr[u + 1]]
        ext = nb[~in_core[nb]]
        if len(ext):
            srcs.append(np.full(len(ext), u, dtype=np.int64))
            dsts.append(ext.astype(np.int64))
    if not srcs:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(srcs), np.concatenate(dsts)


def pad_subgraphs(
    specs: Sequence[SubgraphSpec],
    y: Optional[np.ndarray] = None,
    train_mask: Optional[np.ndarray] = None,
    val_mask: Optional[np.ndarray] = None,
    test_mask: Optional[np.ndarray] = None,
    node_pad_to: int = 8,
    edge_pad_to: int = 128,
    self_loops: bool = True,
    normalize: bool = True,
) -> SubgraphBatch:
    """Pad all specs to uniform static shapes and stack into a SubgraphBatch.

    Global ``y``/split masks are gathered through ``orig_idx``; halo and
    summary slots are forced out of every split (the semantic fix of the
    reference's remapping, ``utils.py:683-703``).
    """
    S = len(specs)
    assert S > 0
    feat = specs[0].x.shape[1]
    max_n = max(s.num_nodes for s in specs)
    n_pad = max(_round_up(max_n + 1, node_pad_to), node_pad_to)

    # per-spec edge preprocessing first, so e_pad covers self loops
    processed = []
    for s in specs:
        snd, rcv = s.senders, s.receivers
        if self_loops:
            loop = np.arange(s.num_nodes, dtype=np.int64)
            snd = np.concatenate([snd, loop])
            rcv = np.concatenate([rcv, loop])
        w = np.ones(len(snd), dtype=np.float32)
        if normalize:
            w = gcn_normalize(snd, rcv, w, s.num_nodes)
        order_ = np.argsort(rcv, kind="stable")
        processed.append((snd[order_], rcv[order_], w[order_]))
    max_e = max(len(p[0]) for p in processed)
    e_pad = max(_round_up(max(max_e, 1), edge_pad_to), edge_pad_to)

    xs = np.zeros((S, n_pad, feat), dtype=np.float32)
    snds = np.full((S, e_pad), n_pad - 1, dtype=np.int32)
    rcvs = np.full((S, e_pad), n_pad - 1, dtype=np.int32)
    ws = np.zeros((S, e_pad), dtype=np.float32)
    n_node = np.zeros(S, dtype=np.int32)
    n_edge = np.zeros(S, dtype=np.int32)
    consume = np.zeros((S, n_pad), dtype=bool)
    orig = np.full((S, n_pad), -1, dtype=np.int32)

    y_shape = () if y is None else np.asarray(y).shape[1:]
    ys = None if y is None else np.zeros((S, n_pad) + y_shape,
                                         dtype=np.asarray(y).dtype)
    tr = None if train_mask is None else np.zeros((S, n_pad), dtype=bool)
    va = None if val_mask is None else np.zeros((S, n_pad), dtype=bool)
    te = None if test_mask is None else np.zeros((S, n_pad), dtype=bool)

    for k, (s, (snd, rcv, w)) in enumerate(zip(specs, processed)):
        n, e = s.num_nodes, len(snd)
        xs[k, :n] = s.x
        snds[k, :e], rcvs[k, :e], ws[k, :e] = snd, rcv, w
        n_node[k], n_edge[k] = n, e
        consume[k, :n] = s.consume
        orig[k, :n] = s.orig_idx
        real = s.orig_idx >= 0
        gidx = s.orig_idx[real]
        if ys is not None:
            ys[k, :n][real] = np.asarray(y)[gidx]
        for dst, src in ((tr, train_mask), (va, val_mask), (te, test_mask)):
            if dst is not None:
                loc = np.zeros(n, dtype=bool)
                loc[real] = np.asarray(src, dtype=bool)[gidx]
                dst[k, :n] = loc & s.consume

    return SubgraphBatch(
        x=jnp.asarray(xs), senders=jnp.asarray(snds), receivers=jnp.asarray(rcvs),
        edge_weight=jnp.asarray(ws), n_node=jnp.asarray(n_node),
        n_edge=jnp.asarray(n_edge), consume_mask=jnp.asarray(consume),
        orig_idx=jnp.asarray(orig),
        y=None if ys is None else jnp.asarray(ys),
        train_mask=None if tr is None else jnp.asarray(tr),
        val_mask=None if va is None else jnp.asarray(va),
        test_mask=None if te is None else jnp.asarray(te))
