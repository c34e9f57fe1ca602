"""Graph-level task pipeline: per-graph coarsening + batched Gc/Gs views.

The array-native analog of the reference's per-graph loop
(``main.py:319-351``: coarsen each graph, build its coarse view via
``load_graph_data`` ``utils.py:811-852`` and its subgraph set) plus the
custom ``colater`` (``utils.py:893-908``) that keeps the Gc and Gs views of
each sample together.  Instead of ragged Python lists, a whole split is
collated once into:

* a block-diagonal padded coarse ``Graph`` + per-node sample ids (the PyG
  ``Batch``/``global_*_pool`` pattern), and
* one ``SubgraphBatch`` holding every sample's subgraphs + per-subgraph
  sample ids,

so each training epoch is a single jitted step on static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp
import flax.struct

from fitgnn_tpu.coarsen import coarsen, coarsen_features, connected_components
from fitgnn_tpu.graph.build import (
    gcn_normalize, _round_up, sort_by_receiver, add_self_loops,
)
from fitgnn_tpu.graph.container import Graph, SubgraphBatch
from fitgnn_tpu.partition.subgraphs import (
    SubgraphSpec, extract_subgraphs, pad_subgraphs,
)


@dataclasses.dataclass
class GraphSample:
    """One graph's Gc + Gs views (host-side numpy)."""

    coarse_x: np.ndarray                  # (nc, F)
    coarse_senders: np.ndarray            # undirected both-dir local edges
    coarse_receivers: np.ndarray
    subgraphs: List[SubgraphSpec]
    y: np.ndarray                         # () int label or (T,) targets


def prepare_graph_sample(x: np.ndarray, senders: np.ndarray,
                         receivers: np.ndarray, y,
                         reduction: float = 0.5,
                         method: str = "variation_neighborhoods",
                         mode: str = "plain", K: int = 10,
                         seed: int = 0) -> GraphSample:
    """Coarsen one graph (per-component, like the node pipeline) and build
    its metanode subgraphs."""
    n = x.shape[0]
    w = np.ones(len(senders), dtype=np.float64)
    W = sp.csr_matrix((w, (senders, receivers)), shape=(n, n))
    W = W + W.T
    W.data[:] = np.minimum(W.data, 1.0)
    W.setdiag(0)
    W.eliminate_zeros()

    comps = connected_components(W)
    parent = np.full(n, -1, dtype=np.int64)
    offset = 0
    cxs, ces, cer = [], [], []
    for comp in comps:
        if len(comp) > 1:
            res = coarsen(W[comp][:, comp], r=reduction, method=method, K=K,
                          seed=seed)
            parent[comp] = res.parent + offset
            cxs.append(coarsen_features(x[comp], res.parent))
            coo = res.Wc.tocoo()
            ces.append(coo.row + offset)
            cer.append(coo.col + offset)
            offset += res.num_coarse
        else:
            parent[comp] = offset
            cxs.append(x[comp])
            offset += 1
    coarse_x = np.concatenate(cxs, axis=0).astype(np.float32) if cxs \
        else np.zeros((0, x.shape[1]), dtype=np.float32)
    cs = np.concatenate(ces).astype(np.int64) if ces else np.empty(0, np.int64)
    cr = np.concatenate(cer).astype(np.int64) if cer else np.empty(0, np.int64)

    num_meta = offset
    coarse_W = sp.csr_matrix(
        (np.ones(len(cs)), (cs, cr)), shape=(num_meta, num_meta))
    specs = extract_subgraphs(W, x, parent, mode=mode, coarse_x=coarse_x,
                              coarse_W=coarse_W)
    return GraphSample(coarse_x=coarse_x, coarse_senders=cs,
                       coarse_receivers=cr, subgraphs=specs,
                       y=np.asarray(y))


@flax.struct.dataclass
class GraphLevelBatch:
    """A collated split: everything a jitted graph-level step needs.
    A pytree — passes straight through jit (num_graphs is static)."""

    gc: Graph                      # block-diagonal coarse graphs, padded
    gc_graph_ids: jnp.ndarray      # (N_pad,) sample id per coarse node
    gs: SubgraphBatch              # all samples' subgraphs stacked
    gs_graph_ids: jnp.ndarray      # (S, N_sub_pad) sample id per node slot
    y: jnp.ndarray                 # (B,) or (B, T)
    num_graphs: int = flax.struct.field(pytree_node=False)
    graph_mask: jnp.ndarray = None  # (B,) bool; False on padding samples
                                    # (None = every slot is a real sample)


@dataclasses.dataclass
class _PadTargets:
    """Shared static shapes so every chunk compiles to one executable."""

    num_graphs: int
    gc_nodes: int
    gc_edges: int
    num_subgraphs: int
    sub_nodes: int
    sub_edges: int


def collate_graph_level(samples: Sequence[GraphSample],
                        node_pad_to: int = 8,
                        edge_pad_to: int = 128,
                        pad: "_PadTargets | None" = None) -> GraphLevelBatch:
    b = len(samples)
    assert b > 0
    feat = samples[0].coarse_x.shape[1]

    # ---- Gc block-diagonal assembly --------------------------------------
    total = sum(s.coarse_x.shape[0] for s in samples)
    xs = np.zeros((total, feat), dtype=np.float32)
    gids = np.zeros(total, dtype=np.int32)
    e_s, e_r = [], []
    off = 0
    for i, smp in enumerate(samples):
        nc = smp.coarse_x.shape[0]
        xs[off:off + nc] = smp.coarse_x
        gids[off:off + nc] = i
        e_s.append(smp.coarse_senders + off)
        e_r.append(smp.coarse_receivers + off)
        off += nc
    senders = np.concatenate(e_s) if e_s else np.empty(0, np.int64)
    receivers = np.concatenate(e_r) if e_r else np.empty(0, np.int64)

    # edges are already undirected both-direction; add self loops + normalize
    senders, receivers, w = add_self_loops(
        senders.astype(np.int64), receivers.astype(np.int64),
        np.ones(len(senders), dtype=np.float32), total)
    w = gcn_normalize(senders, receivers, w, total)
    senders, receivers, w = sort_by_receiver(senders, receivers, w)

    n_pad = max(_round_up(total + 1, node_pad_to), node_pad_to)
    e_pad = max(_round_up(max(len(senders), 1), edge_pad_to), edge_pad_to)
    if pad is not None:
        assert pad.gc_nodes >= n_pad and pad.gc_edges >= e_pad, (pad, n_pad,
                                                                 e_pad)
        n_pad, e_pad = pad.gc_nodes, pad.gc_edges
    xp = np.zeros((n_pad, feat), dtype=np.float32)
    xp[:total] = xs
    sp_ = np.full(e_pad, n_pad - 1, dtype=np.int32)
    rp = np.full(e_pad, n_pad - 1, dtype=np.int32)
    wp = np.zeros(e_pad, dtype=np.float32)
    sp_[:len(senders)] = senders
    rp[:len(senders)] = receivers
    wp[:len(w)] = w
    gp = np.zeros(n_pad, dtype=np.int32)
    gp[:total] = gids

    gc = Graph(x=jnp.asarray(xp), senders=jnp.asarray(sp_),
               receivers=jnp.asarray(rp), edge_weight=jnp.asarray(wp),
               n_node=jnp.asarray(total, dtype=jnp.int32),
               n_edge=jnp.asarray(len(senders), dtype=jnp.int32))

    # ---- Gs stacked subgraphs --------------------------------------------
    all_specs: List[SubgraphSpec] = []
    spec_gid: List[int] = []
    for i, smp in enumerate(samples):
        for spec in smp.subgraphs:
            all_specs.append(spec)
            spec_gid.append(i)
    gs = pad_subgraphs(
        all_specs, node_pad_to=node_pad_to, edge_pad_to=edge_pad_to,
        pad_nodes_to=None if pad is None else pad.sub_nodes,
        pad_edges_to=None if pad is None else pad.sub_edges,
        pad_count_to=None if pad is None else pad.num_subgraphs)
    gid_col = np.zeros(gs.num_subgraphs, dtype=np.int32)
    gid_col[:len(spec_gid)] = spec_gid
    gs_gids = gid_col[:, None] * np.ones((1, gs.num_nodes_padded),
                                         dtype=np.int32)

    b_pad = b if pad is None else max(pad.num_graphs, b)
    y = np.stack([s.y for s in samples])
    if b_pad > b:
        y = np.concatenate(
            [y, np.zeros((b_pad - b,) + y.shape[1:], dtype=y.dtype)])
    gmask = np.arange(b_pad) < b
    return GraphLevelBatch(
        gc=gc, gc_graph_ids=jnp.asarray(gp), gs=gs,
        gs_graph_ids=jnp.asarray(gs_gids), y=jnp.asarray(y),
        num_graphs=b_pad, graph_mask=jnp.asarray(gmask))


def compute_pad_targets(chunks: Sequence[Sequence[GraphSample]],
                        node_pad_to: int = 8,
                        edge_pad_to: int = 128) -> _PadTargets:
    """Static shape envelope over a list of chunks (max per dimension) so one
    compiled step serves every chunk."""
    def gc_dims(chunk):
        total = sum(s.coarse_x.shape[0] for s in chunk)
        edges = sum(len(s.coarse_senders) for s in chunk) + total  # + loops
        return total, edges

    gc_n = gc_e = sub_n = sub_e = n_sub = n_g = 0
    for chunk in chunks:
        total, edges = gc_dims(chunk)
        gc_n = max(gc_n, _round_up(total + 1, node_pad_to))
        gc_e = max(gc_e, _round_up(max(edges, 1), edge_pad_to))
        n_g = max(n_g, len(chunk))
        specs = [sp for s in chunk for sp in s.subgraphs]
        n_sub = max(n_sub, len(specs))
        mx_n = max(sp.num_nodes for sp in specs)
        sub_n = max(sub_n, _round_up(mx_n + 1, node_pad_to))
        # worst case edges after symmetrization happened upstream; + loops
        mx_e = max(len(sp.senders) + sp.num_nodes for sp in specs)
        sub_e = max(sub_e, _round_up(max(mx_e, 1), edge_pad_to))
    return _PadTargets(num_graphs=n_g, gc_nodes=gc_n, gc_edges=gc_e,
                       num_subgraphs=n_sub, sub_nodes=sub_n, sub_edges=sub_e)


def collate_graph_level_batches(samples: Sequence[GraphSample],
                                batch_size: int,
                                node_pad_to: int = 8,
                                edge_pad_to: int = 128
                                ) -> List[GraphLevelBatch]:
    """Chunk ``samples`` into minibatches of ``batch_size`` graphs, collated
    to ONE shared static shape (the analog of the reference's
    ``T_DataLoader(..., batch_size, collate_fn=colater())``,
    ``run.py:577-580`` — but with shape-stable chunks so jit compiles once).
    """
    if batch_size <= 0 or batch_size >= len(samples):
        return [collate_graph_level(samples, node_pad_to, edge_pad_to)]
    chunks = [samples[i:i + batch_size]
              for i in range(0, len(samples), batch_size)]
    pad = compute_pad_targets(chunks, node_pad_to, edge_pad_to)
    return [collate_graph_level(c, node_pad_to, edge_pad_to, pad=pad)
            for c in chunks]
