"""Host-side graph sharding for graph data parallelism.

The distributed analog of the reference's sequential subgraph streaming
(``run.py:184-197``): nodes are partitioned into contiguous per-device
blocks (callers should pre-order nodes by community/metanode so cut edges
are few — the same Leiden/coarsening structure the reference computes for
memory reasons becomes our placement), and each device owns the edges whose
*receiver* is local.  Sender indices stay global: the compute step
all-gathers the (hidden-dim) activations and aggregates locally, which keeps
every matmul sharded and turns the boundary problem into one collective.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from fitgnn_tpu.graph.build import gcn_normalize, _round_up
from fitgnn_tpu.graph.optimize import _LAYER_SEMANTICS, _operator_weights


#: aggregation-weight semantics per conv layer (mirrors the ``g.aux``
#: semantics strings in ``models.layers`` / ``graph.optimize``): the dist
#: layers are static-weight segment-sums, so the per-layer aggregation —
#: GCN's symmetric normalization, SAGE's neighbor mean, GIN's neighbor sum,
#: GAT's unit mask (softmax weights are computed on device) — is baked into
#: the sharded edge weights at build time.
LAYER_SEMANTICS = dict(_LAYER_SEMANTICS)


class ShardedGraph(NamedTuple):
    """Leading axis = device shard. Senders are GLOBAL ids; receivers LOCAL."""

    x: jnp.ndarray              # (P, N_loc, F)
    senders: jnp.ndarray        # (P, E_loc) global node ids
    receivers: jnp.ndarray      # (P, E_loc) local row ids
    edge_weight: jnp.ndarray    # (P, E_loc)
    y: jnp.ndarray              # (P, N_loc, ...)
    train_mask: jnp.ndarray     # (P, N_loc)
    val_mask: jnp.ndarray
    test_mask: jnp.ndarray

    @property
    def num_shards(self) -> int:
        return self.x.shape[0]

    @property
    def nodes_per_shard(self) -> int:
        return self.x.shape[1]

    @property
    def num_nodes_global(self) -> int:
        return self.x.shape[0] * self.x.shape[1]


def shard_graph(
    x: np.ndarray,
    senders: np.ndarray,
    receivers: np.ndarray,
    y: np.ndarray,
    num_shards: int,
    *,
    train_mask: Optional[np.ndarray] = None,
    val_mask: Optional[np.ndarray] = None,
    test_mask: Optional[np.ndarray] = None,
    order: Optional[np.ndarray] = None,
    self_loops: bool = True,
    normalize: bool = True,
    edge_pad_to: int = 128,
    semantics: Optional[str] = None,
) -> ShardedGraph:
    """Partition a node-labelled graph into ``num_shards`` contiguous blocks.

    ``order``: optional node permutation applied first (community placement).
    Edge weights are computed on the *global* graph before sharding, so
    sharded aggregation is bit-equivalent to single-device aggregation.
    ``semantics``: one of ``LAYER_SEMANTICS.values()`` — overrides
    ``self_loops``/``normalize`` with the layer's aggregation weights
    (default: ``"gcn_norm"``, the original behavior).
    """
    if semantics is not None:
        if semantics == "gcn_norm":
            self_loops, normalize = True, True
        elif semantics in ("mean_nonself", "sum_nonself"):
            self_loops, normalize = False, False
        elif semantics == "att_unit":
            self_loops, normalize = True, False
        else:
            raise ValueError(f"unknown shard semantics {semantics!r}")
    n = x.shape[0]
    senders = np.asarray(senders, dtype=np.int64)
    receivers = np.asarray(receivers, dtype=np.int64)
    if order is not None:
        inv = np.empty(n, dtype=np.int64)
        inv[order] = np.arange(n)
        x = x[order]
        y = np.asarray(y)[order]
        senders, receivers = inv[senders], inv[receivers]
        train_mask = None if train_mask is None else np.asarray(train_mask)[order]
        val_mask = None if val_mask is None else np.asarray(val_mask)[order]
        test_mask = None if test_mask is None else np.asarray(test_mask)[order]

    # symmetrize
    s = np.concatenate([senders, receivers])
    r = np.concatenate([receivers, senders])
    keep = s != r
    s, r = s[keep], r[keep]
    key = s * n + r
    _, idx = np.unique(key, return_index=True)
    s, r = s[idx], r[idx]
    w = np.ones(len(s), dtype=np.float32)
    if self_loops:
        loop = np.arange(n, dtype=np.int64)
        s = np.concatenate([s, loop])
        r = np.concatenate([r, loop])
        w = np.concatenate([w, np.ones(n, dtype=np.float32)])
    if normalize:
        w = gcn_normalize(s, r, w, n)
    if semantics == "mean_nonself":
        # neighbor mean = segment-sum with 1/indeg weights (non-self edges
        # only; isolated nodes aggregate to 0, matching segment_mean's
        # masked fallback in models.layers.SAGEConv) — one rule, one home
        w = _operator_weights(s, r, w, n, "mean_nonself")

    return _partition_blocks(x, s, r, w, y, num_shards, train_mask, val_mask,
                             test_mask, edge_pad_to)


def shard_prebuilt_graph(
    x: np.ndarray,
    senders: np.ndarray,
    receivers: np.ndarray,
    weight: np.ndarray,
    y: np.ndarray,
    num_shards: int,
    *,
    train_mask: Optional[np.ndarray] = None,
    val_mask: Optional[np.ndarray] = None,
    test_mask: Optional[np.ndarray] = None,
    order: Optional[np.ndarray] = None,
    edge_pad_to: int = 128,
) -> ShardedGraph:
    """Shard an ALREADY-PROCESSED edge list verbatim (no symmetrization, no
    self-loop insertion, no renormalization) — for graphs whose aggregation
    weights were built elsewhere, e.g. the coarse Gc graph (its GCN weights
    normalize the WEIGHTED coarse adjacency ``PᵀWP``, which a raw re-shard
    could not reproduce).  Zero-weight (padding) edges are dropped."""
    n = x.shape[0]
    senders = np.asarray(senders, dtype=np.int64)
    receivers = np.asarray(receivers, dtype=np.int64)
    weight = np.asarray(weight, dtype=np.float32)
    keep = weight != 0
    s, r, w = senders[keep], receivers[keep], weight[keep]
    y = np.asarray(y)
    if order is not None:
        inv = np.empty(n, dtype=np.int64)
        inv[order] = np.arange(n)
        x, y = x[order], y[order]
        s, r = inv[s], inv[r]
        train_mask = (None if train_mask is None
                      else np.asarray(train_mask)[order])
        val_mask = None if val_mask is None else np.asarray(val_mask)[order]
        test_mask = (None if test_mask is None
                     else np.asarray(test_mask)[order])
    return _partition_blocks(x, s, r, w, y, num_shards, train_mask, val_mask,
                             test_mask, edge_pad_to)


def shard_node_array(a: np.ndarray, num_shards: int, nodes_per_shard: int,
                     *, order: Optional[np.ndarray] = None,
                     fill=0) -> jnp.ndarray:
    """Pad + reshape a per-node array to ``(num_shards, nodes_per_shard, …)``
    — the same node placement ``_partition_blocks`` applies, for arrays that
    travel alongside an existing :class:`ShardedGraph` (e.g. val labels)
    without re-sharding the whole graph."""
    a = np.asarray(a)
    if order is not None:
        a = a[order]
    n_pad = num_shards * nodes_per_shard
    out = np.full((n_pad,) + a.shape[1:], fill, dtype=a.dtype)
    out[:len(a)] = a
    return jnp.asarray(out.reshape((num_shards, nodes_per_shard)
                                   + a.shape[1:]))


def _partition_blocks(x, s, r, w, y, num_shards, train_mask, val_mask,
                      test_mask, edge_pad_to) -> ShardedGraph:
    """Common tail: contiguous node blocks, per-receiver edge placement,
    padding to uniform shapes."""
    n = x.shape[0]
    n_loc = _round_up(-(-n // num_shards), 8)
    n_pad = n_loc * num_shards

    def pad_nodes(a, fill=0):
        a = np.asarray(a)
        out = np.full((n_pad,) + a.shape[1:], fill, dtype=a.dtype)
        out[:n] = a
        return out.reshape((num_shards, n_loc) + a.shape[1:])

    shard_of = r // n_loc
    e_per = np.bincount(shard_of, minlength=num_shards)
    e_loc = max(_round_up(max(int(e_per.max()), 1), edge_pad_to), edge_pad_to)

    # padding edges: point at the shard's last local slot with weight 0
    ss = np.zeros((num_shards, e_loc), dtype=np.int32)
    rr = np.full((num_shards, e_loc), n_loc - 1, dtype=np.int32)
    ww = np.zeros((num_shards, e_loc), dtype=np.float32)
    for p in range(num_shards):
        sel = shard_of == p
        cnt = int(sel.sum())
        order_ = np.argsort(r[sel] - p * n_loc, kind="stable")
        ss[p, :cnt] = s[sel][order_]
        rr[p, :cnt] = (r[sel] - p * n_loc)[order_]
        ww[p, :cnt] = w[sel][order_]
        ss[p, cnt:] = p * n_loc  # arbitrary valid global id, weight 0

    zeros = np.zeros(n, dtype=bool)
    return ShardedGraph(
        x=jnp.asarray(pad_nodes(x.astype(np.float32))),
        senders=jnp.asarray(ss),
        receivers=jnp.asarray(rr),
        edge_weight=jnp.asarray(ww),
        y=jnp.asarray(pad_nodes(y)),
        train_mask=jnp.asarray(pad_nodes(
            zeros if train_mask is None else train_mask, fill=False)),
        val_mask=jnp.asarray(pad_nodes(
            zeros if val_mask is None else val_mask, fill=False)),
        test_mask=jnp.asarray(pad_nodes(
            zeros if test_mask is None else test_mask, fill=False)),
    )
