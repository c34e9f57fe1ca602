"""Immutable, padded, JIT-stable graph containers.

Design notes (TPU-first):

* All arrays are padded to static shapes so a single compiled executable
  serves every subgraph in a bucket.  Actual sizes travel as scalar arrays
  (``n_node``/``n_edge``) so they can be traced.
* Edges are COO sorted by ``receivers`` (ascending) — the array analog of CSR —
  so segment reductions can use ``indices_are_sorted=True``.
* Padding edges carry ``edge_weight == 0`` and point at the last (padding)
  node, so weighted aggregations are exact without masking; unweighted
  reductions (softmax, mean, max) use the implicit edge mask
  ``arange(E_pad) < n_edge``.

Capability parity: this is the array-native analog of the reference's
per-subgraph PyG ``Data`` objects with ``mask`` / ``orig_idx`` / ``map_dict``
attachments (reference ``utils.py:249-266``); ``SubgraphBatch`` replaces its
Python list-of-subgraphs streaming (reference ``run.py:177-253``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class Graph(NamedTuple):
    """A single (padded) graph.

    Shapes: ``x: (N_pad, F)``, ``senders/receivers/edge_weight: (E_pad,)``.
    ``receivers`` is sorted ascending; padding edges live at the tail and
    point to node ``N_pad - 1`` with weight 0.
    """

    x: jnp.ndarray                     # (N_pad, F) node features
    senders: jnp.ndarray               # (E_pad,) int32 source node per edge
    receivers: jnp.ndarray             # (E_pad,) int32 dest node per edge (sorted)
    edge_weight: jnp.ndarray           # (E_pad,) float; 0 on padding edges
    n_node: jnp.ndarray                # () int32 true node count
    n_edge: jnp.ndarray                # () int32 true edge count
    y: Optional[jnp.ndarray] = None    # (N_pad,) labels / (N_pad, T) targets
    train_mask: Optional[jnp.ndarray] = None  # (N_pad,) bool
    val_mask: Optional[jnp.ndarray] = None    # (N_pad,) bool
    test_mask: Optional[jnp.ndarray] = None   # (N_pad,) bool
    aux: Optional[object] = None       # precomputed operator structure
                                       # (e.g. ops.hybrid_spmm.HybridSpmm)

    # --- derived (cheap, traced) -------------------------------------------
    @property
    def num_nodes_padded(self) -> int:
        return self.x.shape[0]

    @property
    def num_edges_padded(self) -> int:
        return self.senders.shape[0]

    @property
    def node_mask(self) -> jnp.ndarray:
        return jnp.arange(self.num_nodes_padded, dtype=jnp.int32) < self.n_node

    @property
    def edge_mask(self) -> jnp.ndarray:
        return jnp.arange(self.num_edges_padded, dtype=jnp.int32) < self.n_edge


class SubgraphBatch(NamedTuple):
    """A stacked bucket of same-padded subgraphs, vmappable as one unit.

    The leading axis is the subgraph axis.  ``consume_mask`` marks nodes whose
    outputs this subgraph *owns* (halo / cluster-summary nodes are False) —
    the analog of the reference's per-subgraph ``mask`` (``utils.py:343-348``).
    ``orig_idx`` maps padded-local node slots back to global node ids
    (-1 on padding slots) — the analog of ``orig_idx`` (``utils.py:249``).
    """

    x: jnp.ndarray                     # (S, N_pad, F)
    senders: jnp.ndarray               # (S, E_pad)
    receivers: jnp.ndarray             # (S, E_pad)
    edge_weight: jnp.ndarray           # (S, E_pad)
    n_node: jnp.ndarray                # (S,)
    n_edge: jnp.ndarray                # (S,)
    consume_mask: jnp.ndarray          # (S, N_pad) bool
    orig_idx: jnp.ndarray              # (S, N_pad) int32, -1 = padding
    y: Optional[jnp.ndarray] = None            # (S, N_pad) or (S, N_pad, T)
    train_mask: Optional[jnp.ndarray] = None   # (S, N_pad)
    val_mask: Optional[jnp.ndarray] = None     # (S, N_pad)
    test_mask: Optional[jnp.ndarray] = None    # (S, N_pad)

    @property
    def num_subgraphs(self) -> int:
        return self.x.shape[0]

    @property
    def num_nodes_padded(self) -> int:
        return self.x.shape[1]

    def subgraph(self, i: int) -> Graph:
        """Materialize subgraph ``i`` as a standalone ``Graph``."""
        return Graph(
            x=self.x[i],
            senders=self.senders[i],
            receivers=self.receivers[i],
            edge_weight=self.edge_weight[i],
            n_node=self.n_node[i],
            n_edge=self.n_edge[i],
            y=None if self.y is None else self.y[i],
            train_mask=None if self.train_mask is None else self.train_mask[i],
            val_mask=None if self.val_mask is None else self.val_mask[i],
            test_mask=None if self.test_mask is None else self.test_mask[i],
        )
