"""Host-side (numpy) graph construction and padding.

These run once at ingest; everything they produce is a static-shaped device
array.  The normalization semantics mirror what the reference gets from PyG's
``GCNConv`` preprocessing (add self loops + symmetric D^-1/2 A D^-1/2), so
downstream layers only ever do weighted aggregation.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from fitgnn_tpu.graph.container import Graph

# ---------------------------------------------------------------------------
# host-side edge preprocessing (numpy)
# ---------------------------------------------------------------------------


def to_undirected(senders: np.ndarray, receivers: np.ndarray,
                  weight: Optional[np.ndarray] = None):
    """Symmetrize + dedupe an edge list (numpy)."""
    if weight is None:
        weight = np.ones(senders.shape[0], dtype=np.float32)
    s = np.concatenate([senders, receivers])
    r = np.concatenate([receivers, senders])
    w = np.concatenate([weight, weight])
    key = s.astype(np.int64) * (max(int(r.max(initial=0)), int(s.max(initial=0))) + 1) + r
    _, idx = np.unique(key, return_index=True)
    return s[idx], r[idx], w[idx]


def add_self_loops(senders: np.ndarray, receivers: np.ndarray,
                   weight: np.ndarray, num_nodes: int, fill: float = 1.0):
    """Append one self loop per node (numpy). Existing self loops are kept."""
    loop = np.arange(num_nodes, dtype=senders.dtype)
    s = np.concatenate([senders, loop])
    r = np.concatenate([receivers, loop])
    w = np.concatenate([weight, np.full(num_nodes, fill, dtype=weight.dtype)])
    return s, r, w


def gcn_normalize(senders: np.ndarray, receivers: np.ndarray,
                  weight: np.ndarray, num_nodes: int) -> np.ndarray:
    """Symmetric normalization ``w_e / sqrt(deg[s] * deg[r])`` (numpy)."""
    deg = np.zeros(num_nodes, dtype=np.float64)
    np.add.at(deg, receivers, weight.astype(np.float64))
    dinv = np.where(deg > 0, 1.0 / np.sqrt(deg), 0.0)
    return (weight * dinv[senders] * dinv[receivers]).astype(np.float32)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def sort_by_receiver(senders, receivers, weight):
    order = np.argsort(receivers, kind="stable")
    return senders[order], receivers[order], weight[order]


def build_graph(
    x: np.ndarray,
    senders: np.ndarray,
    receivers: np.ndarray,
    *,
    edge_weight: Optional[np.ndarray] = None,
    y: Optional[np.ndarray] = None,
    train_mask: Optional[np.ndarray] = None,
    val_mask: Optional[np.ndarray] = None,
    test_mask: Optional[np.ndarray] = None,
    undirected: bool = True,
    self_loops: bool = True,
    normalize: bool = True,
    node_pad_to: int = 8,
    edge_pad_to: int = 128,
    dtype=np.float32,
) -> Graph:
    """Build a padded device ``Graph`` from numpy arrays.

    Padding reserves at least one extra node (the sink of padding edges).
    """
    num_nodes = int(x.shape[0])
    senders = np.asarray(senders, dtype=np.int32)
    receivers = np.asarray(receivers, dtype=np.int32)
    if edge_weight is None:
        edge_weight = np.ones(senders.shape[0], dtype=np.float32)
    edge_weight = np.asarray(edge_weight, dtype=np.float32)

    uniform = bool(np.all(edge_weight == 1.0)) if edge_weight.size else True
    if uniform and senders.size > 2_000_000:
        # large unweighted graphs: one-pass C++ ingest core
        from fitgnn_tpu.graph.native_build import build_edges_native
        senders, receivers, edge_weight = build_edges_native(
            senders, receivers, num_nodes, undirected=undirected,
            self_loops=self_loops, normalize=normalize)
        senders = senders.astype(np.int32)
        receivers = receivers.astype(np.int32)
    else:
        if undirected and senders.size:
            senders, receivers, edge_weight = to_undirected(
                senders, receivers, edge_weight)
        if self_loops:
            senders, receivers, edge_weight = add_self_loops(
                senders, receivers, edge_weight, num_nodes)
        if normalize:
            edge_weight = gcn_normalize(senders, receivers, edge_weight,
                                        num_nodes)
        senders, receivers, edge_weight = sort_by_receiver(
            senders, receivers, edge_weight)

    num_edges = int(senders.shape[0])
    n_pad = max(_round_up(num_nodes + 1, node_pad_to), node_pad_to)
    e_pad = max(_round_up(max(num_edges, 1), edge_pad_to), edge_pad_to)

    def pad_nodes(a, fill=0):
        if a is None:
            return None
        pad_shape = (n_pad - num_nodes,) + a.shape[1:]
        return np.concatenate([a, np.full(pad_shape, fill, dtype=a.dtype)], axis=0)

    xs = pad_nodes(np.asarray(x, dtype=dtype))
    s = np.full(e_pad, n_pad - 1, dtype=np.int32)
    r = np.full(e_pad, n_pad - 1, dtype=np.int32)
    w = np.zeros(e_pad, dtype=np.float32)
    s[:num_edges], r[:num_edges], w[:num_edges] = senders, receivers, edge_weight

    def as_dev(a):
        return None if a is None else jnp.asarray(a)

    return Graph(
        x=jnp.asarray(xs),
        senders=jnp.asarray(s),
        receivers=jnp.asarray(r),
        edge_weight=jnp.asarray(w),
        n_node=jnp.asarray(num_nodes, dtype=jnp.int32),
        n_edge=jnp.asarray(num_edges, dtype=jnp.int32),
        y=as_dev(pad_nodes(None if y is None else np.asarray(y))),
        train_mask=as_dev(pad_nodes(None if train_mask is None else np.asarray(train_mask, dtype=bool), fill=False)),
        val_mask=as_dev(pad_nodes(None if val_mask is None else np.asarray(val_mask, dtype=bool), fill=False)),
        test_mask=as_dev(pad_nodes(None if test_mask is None else np.asarray(test_mask, dtype=bool), fill=False)),
    )


def pad_graph(g: Graph, n_pad: int, e_pad: int) -> Graph:
    """Re-pad an already-built graph to larger static shapes (device-side)."""
    cur_n, cur_e = g.num_nodes_padded, g.num_edges_padded
    assert n_pad >= cur_n and e_pad >= cur_e, "pad_graph only grows"

    def pad_n(a, fill=0):
        if a is None:
            return None
        widths = [(0, n_pad - cur_n)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths, constant_values=fill)

    # Padding edges must keep pointing at the (new) last node.
    s = jnp.pad(g.senders, (0, e_pad - cur_e), constant_values=n_pad - 1)
    r = jnp.pad(g.receivers, (0, e_pad - cur_e), constant_values=n_pad - 1)
    # Old padding edges pointed at cur_n - 1; re-target them.
    old_pad_edges = jnp.arange(e_pad, dtype=jnp.int32) >= g.n_edge
    s = jnp.where(old_pad_edges, n_pad - 1, s)
    r = jnp.where(old_pad_edges, n_pad - 1, r)
    return Graph(
        x=pad_n(g.x),
        senders=s,
        receivers=r,
        edge_weight=jnp.pad(g.edge_weight, (0, e_pad - cur_e)),
        n_node=g.n_node,
        n_edge=g.n_edge,
        y=pad_n(g.y),
        train_mask=pad_n(g.train_mask, fill=False),
        val_mask=pad_n(g.val_mask, fill=False),
        test_mask=pad_n(g.test_mask, fill=False),
    )
