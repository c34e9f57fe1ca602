"""Task models: conv stack + node/graph heads.

The reference's six model classes (``network.py:8-204``) collapse to two
parametrized models sharing one ``ConvStack``:

* ``NodeModel``  — convs → Dense head; log_softmax (cls) or raw scalar (reg).
  (= ``Classify_node`` / ``Regress_node``, ``network.py:8,37``)
* ``GraphModel`` — convs → masked segment pool (max for cls, mean for reg)
  over per-graph segments → Dense head; softmax for cls.
  (= ``Classify_graph_gc/gs`` / ``Regress_graph_gc/gs``, ``network.py:66-204``)

The Gc and Gs variants use the *same* parameters (identical shapes), which is
what makes the reference's Gc→Gs weight transfer (``run.py:360,601``) a no-op
pytree copy here.  The Gs forward (reference's nested Python loop,
``network.py:118-135``) becomes a vmap of the conv stack over a padded
``SubgraphBatch`` + one masked segment pool.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from fitgnn_tpu.graph.container import Graph, SubgraphBatch
from fitgnn_tpu.models.layers import make_layer
from fitgnn_tpu.ops.segment import segment_max, segment_mean


class ConvStack(nn.Module):
    """num_layers convs, each followed by ELU + dropout(0.5) (network.py:29-33).

    ``first_layer_preaggregated``: the caller passes x̃ = Â·X (precomputed at
    ingest — input features are constant, so Â(X·W) = (Â·X)·W exactly) and
    layer 0 becomes a pure matmul: its SpMM disappears from every training
    step, forward AND backward (X carries no gradient).  GCN only.
    """

    layer_name: str
    hidden: int
    num_layers: int
    dropout_rate: float = 0.5
    dtype: Optional[jnp.dtype] = None   # compute dtype (e.g. bf16)
    first_layer_preaggregated: bool = False
    fused_dropout: bool = False         # Pallas in-VMEM mask generation
                                        # (ops/pallas/dropout.py); same
                                        # Bernoulli semantics, different
                                        # random stream
    bit_dropout: bool = True            # p=0.5 only: one random BYTE per
                                        # element (exact Bernoulli(½)) —
                                        # 4x less PRNG traffic than a u32
                                        # mask; the mask GENERATION cost,
                                        # not the apply, dominates dropout
                                        # on TPU (A/B: 22.1→20.8 ms/step)

    @nn.compact
    def __call__(self, x: jnp.ndarray, g: Graph, *, train: bool = False):
        for i in range(self.num_layers):
            if i == 0 and self.first_layer_preaggregated:
                # param trees mirror the regular layer exactly, so weights
                # transfer between the two variants as a pytree copy
                if self.layer_name == "GCNConv":
                    x = _PreAggGCN(self.hidden, dtype=self.dtype,
                                   name="GCNConv_0")(x)
                elif self.layer_name == "SAGEConv":
                    x = _PreAggSAGE(self.hidden, dtype=self.dtype,
                                    name="SAGEConv_0")(x)
                elif self.layer_name == "GINConv":
                    x = _PreAggGIN(self.hidden, dtype=self.dtype,
                                   name="GINConv_0")(x)
                else:
                    raise ValueError(
                        "pre-aggregation is exact for GCN/SAGE/GIN only")
            else:
                x = make_layer(self.layer_name, self.hidden, self.dtype,
                               name=f"{self.layer_name}_{i}")(x, g)
            x = nn.elu(x)
            if (self.bit_dropout and train and self.dropout_rate == 0.5
                    and x.ndim == 2):
                x = _bit_dropout_half(
                    x, jax.random.fold_in(self.make_rng("dropout"), i))
            elif (self.fused_dropout and train and self.dropout_rate > 0.0
                    and x.ndim == 2):
                from fitgnn_tpu.ops.pallas.dropout import (fused_dropout,
                                                           seed_from_rng)
                seed = seed_from_rng(
                    jax.random.fold_in(self.make_rng("dropout"), i))
                x = fused_dropout(x, seed, self.dropout_rate)
            else:
                x = nn.Dropout(self.dropout_rate,
                               deterministic=not train)(x)
        return x


def _bit_dropout_half(x: jnp.ndarray, rng) -> jnp.ndarray:
    """Dropout(p=0.5) from one random BYTE per element — exact
    Bernoulli(½) off the low bit, scale 2.  4× less PRNG traffic than a
    uint32-per-element mask, with no unpack broadcast (a (N, F/32)-word
    32×-unpack variant was measured SLOWER: the bit expansion
    materialized instead of fusing).  The u8 compare fuses into the
    consumer."""
    n, f = x.shape
    bytes_ = jax.random.bits(rng, (n, f), jnp.uint8)
    keep = (bytes_ & jnp.uint8(1)).astype(jnp.bool_)
    return jnp.where(keep, x * jnp.asarray(2.0, x.dtype),
                     jnp.zeros((), x.dtype))


class _PreAggGCN(nn.Module):
    """Layer 0 of a pre-aggregated GCN stack: the input is already Â·X, so
    only the dense transform + bias remain."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.features, use_bias=False, name="lin",
                     dtype=self.dtype)(x)
        return h + self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32).astype(h.dtype)


class _PreAggSAGE(nn.Module):
    """Layer 0 of a pre-aggregated SAGE stack: the input is
    ``concat([X, mean_neigh(X)])`` (raw features are constant, so the
    neighbor mean is too); out = lin_l(mean) + lin_r(X) — no SpMM."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = x.shape[-1] // 2
        x_raw, x_mean = x[:, :f], x[:, f:]
        out = nn.Dense(self.features, use_bias=True, name="lin_l",
                       dtype=self.dtype)(x_mean)
        return out + nn.Dense(self.features, use_bias=False, name="lin_r",
                              dtype=self.dtype)(x_raw)


class _PreAggGIN(nn.Module):
    """Layer 0 of a pre-aggregated GIN stack: the input is
    ``concat([X, sum_neigh(X)])``; MLP((1+ε)·X + ΣX) with trainable ε —
    ε multiplies only the raw half, so the sum stays a constant."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = x.shape[-1] // 2
        x_raw, x_sum = x[:, :f], x[:, f:]
        eps = self.param("eps", nn.initializers.zeros, ())
        h = (1.0 + eps).astype(x_raw.dtype) * x_raw + x_sum
        h = nn.relu(nn.Dense(self.features, name="mlp_0",
                             dtype=self.dtype)(h))
        return nn.relu(nn.Dense(self.features, name="mlp_1",
                                dtype=self.dtype)(h))


class NodeModel(nn.Module):
    layer_name: str
    hidden: int
    num_layers: int
    out_dim: int          # num_classes, or 1 for regression
    classify: bool = True
    dtype: Optional[jnp.dtype] = None   # conv-stack compute dtype; the head
                                        # and softmax stay float32
    first_layer_preaggregated: bool = False  # pass x̃ = Â·X (see ConvStack)
    dropout_rate: float = 0.5
    fused_dropout: bool = False
    bit_dropout: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, g: Graph, *, train: bool = False):
        x = ConvStack(self.layer_name, self.hidden, self.num_layers,
                      dtype=self.dtype, dropout_rate=self.dropout_rate,
                      first_layer_preaggregated=self.first_layer_preaggregated,
                      fused_dropout=self.fused_dropout,
                      bit_dropout=self.bit_dropout,
                      name="convs")(x, g, train=train)
        # head runs in the stack's compute dtype (casting the wide features
        # up would move 2·N·H f32 bytes); only the narrow logits are promoted
        # for a numerically safe log_softmax
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="head")(x)
        if self.classify:
            return nn.log_softmax(x.astype(jnp.float32), axis=-1)
        return x.astype(jnp.float32)


def preaggregate_features(g: Graph) -> jnp.ndarray:
    """x̃ = Â·X, computed once at ingest for first_layer_preaggregated
    models (uses the graph's hybrid operator when present)."""
    from fitgnn_tpu.ops.hybrid_spmm import HybridSpmm, hybrid_spmm
    from fitgnn_tpu.ops.spmm import spmm_coo
    if isinstance(g.aux, HybridSpmm):
        return hybrid_spmm(g.aux, g.x)
    return spmm_coo(g.edge_weight, g.senders, g.receivers, g.x,
                    g.num_nodes_padded)


def preaggregate_input(g: Graph, layer_name: str) -> jnp.ndarray:
    """The layer-0 input for a first_layer_preaggregated stack.

    GCN consumes only the aggregate (layer 0 is ``lin(Â·X)+b``); SAGE/GIN
    need the raw features too (``lin_r``/the ε-term), so they get
    ``concat([X, agg(X)])`` with agg = their own neighbor mean/sum.  When
    ``g.aux`` carries the layer's semantics (``graph.optimize`` builds it
    per layer) the hybrid operator computes the aggregate; otherwise the
    same segment-op fallbacks as ``models.layers``."""
    from fitgnn_tpu.ops.hybrid_spmm import HybridSpmm, hybrid_spmm
    if layer_name == "GCNConv":
        return preaggregate_features(g)
    if layer_name not in ("SAGEConv", "GINConv"):
        raise ValueError(f"pre-aggregation unsupported for {layer_name!r}")
    want = "mean_nonself" if layer_name == "SAGEConv" else "sum_nonself"
    if isinstance(g.aux, HybridSpmm) and g.aux.semantics == want:
        agg = hybrid_spmm(g.aux, g.x)
    else:
        from fitgnn_tpu.ops.segment import segment_mean
        from fitgnn_tpu.ops.spmm import spmm_coo
        w = jnp.where(g.senders != g.receivers, 1.0, 0.0).astype(g.x.dtype)
        if layer_name == "SAGEConv":
            agg = segment_mean(g.x[g.senders], g.receivers,
                               g.num_nodes_padded, mask=w > 0)
        else:
            agg = spmm_coo(w, g.senders, g.receivers, g.x,
                           g.num_nodes_padded)
    return jnp.concatenate([g.x, agg.astype(g.x.dtype)], axis=-1)


class GraphModel(nn.Module):
    """Graph-level model; call with either a batched coarse graph (`gc` path,
    node→graph segment ids) or a SubgraphBatch (`gs` path)."""

    layer_name: str
    hidden: int
    num_layers: int
    out_dim: int
    classify: bool = True   # True: max-pool + softmax; False: mean-pool, raw

    def setup(self):
        self.convs = ConvStack(self.layer_name, self.hidden, self.num_layers)
        self.head = nn.Dense(self.out_dim)

    def _pool_and_head(self, h, segment_ids, num_graphs, mask):
        if self.classify:
            pooled = segment_max(h, segment_ids, num_graphs, mask=mask,
                                 indices_are_sorted=False)
        else:
            pooled = segment_mean(h, segment_ids, num_graphs, mask=mask,
                                  indices_are_sorted=False)
        out = self.head(pooled)
        if self.classify:
            return nn.softmax(out, axis=-1)
        return out

    def __call__(self, x, g: Graph, graph_ids: jnp.ndarray, num_graphs: int,
                 *, train: bool = False):
        """Gc path: ``g`` is a batched (block-diagonal) graph; ``graph_ids``
        assigns each node to its sample (PyG ``batch``)."""
        h = self.convs(x, g, train=train)
        return self._pool_and_head(h, graph_ids, num_graphs, g.node_mask)

    def forward_subgraphs(self, batch: SubgraphBatch, graph_ids: jnp.ndarray,
                          num_graphs: int, *, train: bool = False):
        """Gs path: run the conv stack per subgraph (vmapped), then pool the
        consuming-node rows across all subgraphs of each sample.

        ``graph_ids``: (S, N_pad) graph id per node slot (same for all slots
        of one subgraph); non-consuming slots are excluded via consume_mask.
        """
        gb = Graph(x=batch.x, senders=batch.senders, receivers=batch.receivers,
                   edge_weight=batch.edge_weight, n_node=batch.n_node,
                   n_edge=batch.n_edge)
        h = nn.vmap(
            lambda mdl, x, g: mdl(x, g, train=train),
            variable_axes={"params": None},
            split_rngs={"params": False, "dropout": True},
            in_axes=(0, 0),
        )(self.convs, batch.x, gb)

        flat_h = h.reshape(-1, h.shape[-1])
        flat_ids = graph_ids.reshape(-1)
        flat_mask = batch.consume_mask.reshape(-1)
        return self._pool_and_head(flat_h, flat_ids, num_graphs, flat_mask)
