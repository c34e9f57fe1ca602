"""Distributed (sharded) GNN layers and node model.

Row-parallel message passing: node features and all dense matmuls are sharded
over the ``data`` mesh axis; before each aggregation the (hidden-dim)
activations are all-gathered over ICI and each device reduces its *local*
incoming edges.  Parameter trees mirror the single-device ``NodeModel``
exactly (same module names/shapes), so weights move between the two with a
plain pytree copy — the distributed analog of the reference's Gc→Gs
state-dict transfer (``run.py:360``).

This is the all-gather ("halo = everything") v1.  The planned refinement
exchanges only boundary rows via ``ppermute`` rounds overlapped with local
aggregation (SURVEY §2.4) — the collective pattern changes, the layer API
does not.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from fitgnn_tpu.ops.segment import segment_softmax, segment_sum


def _sender_table(h_local: jnp.ndarray, axis_name: str,
                  send_idx, send_mask) -> jnp.ndarray:
    """The table sender indices point into: the full all-gather when no halo
    plan is given, else ``concat([local rows, received halo rows])``."""
    if send_idx is None:
        return jax.lax.all_gather(h_local, axis_name, tiled=True)
    from fitgnn_tpu.parallel.halo import halo_exchange
    halo = halo_exchange(h_local, send_idx, send_mask, axis_name)
    return jnp.concatenate([h_local, halo], axis=0)


class DistGCNConv(nn.Module):
    """GCN layer over a node-sharded graph (senders global, receivers local)."""

    features: int
    axis_name: str = "data"

    @nn.compact
    def __call__(self, x_local, senders_global, receivers_local, edge_weight):
        h = nn.Dense(self.features, use_bias=False, name="lin")(x_local)
        h_global = jax.lax.all_gather(h, self.axis_name, tiled=True)
        gathered = h_global[senders_global] * edge_weight[:, None]
        out = segment_sum(gathered, receivers_local, x_local.shape[0])
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), x_local.dtype)
        return out + bias


class DistGCNConvHalo(nn.Module):
    """GCN layer exchanging only boundary rows (ppermute-class traffic)
    instead of all-gathering every shard's activations.  Param tree matches
    ``DistGCNConv`` exactly, so the two are interchangeable per layer."""

    features: int
    axis_name: str = "data"

    @nn.compact
    def __call__(self, x_local, senders_ext, receivers_local, edge_weight,
                 send_idx, send_mask):
        from fitgnn_tpu.parallel.halo import halo_exchange
        h = nn.Dense(self.features, use_bias=False, name="lin")(x_local)
        halo = halo_exchange(h, send_idx, send_mask, self.axis_name)
        table = jnp.concatenate([h, halo], axis=0)
        gathered = table[senders_ext] * edge_weight[:, None]
        out = segment_sum(gathered, receivers_local, x_local.shape[0])
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), x_local.dtype)
        return out + bias


class DistSAGEConv(nn.Module):
    """SAGE layer over a sharded graph: param tree matches
    ``models.layers.SAGEConv`` (lin_l with bias, lin_r without), aggregation
    weights are the precomputed neighbor-mean weights
    (``shard.LAYER_SEMANTICS['SAGEConv']``).  ``send_idx=None`` → all-gather
    table; else halo table (``DistGCNConvHalo``-style traffic)."""

    features: int
    axis_name: str = "data"

    @nn.compact
    def __call__(self, x_local, senders, receivers_local, edge_weight,
                 send_idx=None, send_mask=None):
        lin_l = nn.Dense(self.features, use_bias=True, name="lin_l")
        # transform-first (exchange at `features` width) with the bias
        # pulled out of the mean: mean(lin(x)) = lin(mean(x)) only when the
        # bias is excluded — isolated nodes still get b_l, matching the
        # single-device layer (models/layers.py SAGEConv narrow path)
        b_l = lin_l(jnp.zeros((1, x_local.shape[-1]), x_local.dtype))
        h = lin_l(x_local) - b_l
        table = _sender_table(h, self.axis_name, send_idx, send_mask)
        mean = segment_sum(
            table[senders] * edge_weight[:, None].astype(h.dtype),
            receivers_local, x_local.shape[0])
        out = mean + b_l
        return out + nn.Dense(self.features, use_bias=False,
                              name="lin_r")(x_local)


class DistGINConv(nn.Module):
    """GIN layer over a sharded graph: param tree matches
    ``models.layers.GINConv`` (eps, mlp_0, mlp_1); weights are the unit
    non-self-edge weights (``sum_nonself``)."""

    features: int
    axis_name: str = "data"

    @nn.compact
    def __call__(self, x_local, senders, receivers_local, edge_weight,
                 send_idx=None, send_mask=None):
        eps = self.param("eps", nn.initializers.zeros, ())
        mlp_0 = nn.Dense(self.features, name="mlp_0")
        # exact reorder: W₀((1+ε)x + Σx) + b₀ = (1+ε)(xW₀) + Σ(xW₀) + b₀ —
        # exchange the transformed activations, not the raw features
        b0 = mlp_0(jnp.zeros((1, x_local.shape[-1]), x_local.dtype))
        h0 = mlp_0(x_local) - b0
        table = _sender_table(h0, self.axis_name, send_idx, send_mask)
        s = segment_sum(
            table[senders] * edge_weight[:, None].astype(h0.dtype),
            receivers_local, x_local.shape[0])
        h = nn.relu((1.0 + eps).astype(h0.dtype) * h0 + s + b0)
        return nn.relu(nn.Dense(self.features, name="mlp_1")(h))


class DistGATConv(nn.Module):
    """Single-head GAT layer over a sharded graph: param tree matches
    ``models.layers.GATConv`` at heads=1/concat=True (lin kernel, att_src,
    att_dst, bias).  Receiver-partitioned edges mean every node's full
    incoming neighborhood is shard-local, so the per-receiver softmax is
    EXACT — the only exchanged tensor is the transformed activations (the
    boundary sender scores are recomputed from the received rows, no extra
    score collective).  ``edge_weight > 0`` is the real-edge mask
    (``att_unit`` semantics: unit weights incl. self loops)."""

    features: int
    axis_name: str = "data"
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x_local, senders, receivers_local, edge_weight,
                 send_idx=None, send_mask=None):
        from fitgnn_tpu.models.layers import _Kernel
        n_loc = x_local.shape[0]
        kernel = _Kernel((x_local.shape[-1], self.features), name="lin")()
        a_src = self.param("att_src", nn.initializers.glorot_uniform(),
                           (1, self.features))
        a_dst = self.param("att_dst", nn.initializers.glorot_uniform(),
                           (1, self.features))
        h = x_local @ kernel
        table = _sender_table(h, self.axis_name, send_idx, send_mask)
        y = table[senders]                                   # (E, C)
        ssrc = (y.astype(jnp.float32)
                @ a_src[0].astype(jnp.float32))              # (E,)
        sdst_e = (h.astype(jnp.float32)
                  @ a_dst[0].astype(jnp.float32))[receivers_local]
        pre = nn.leaky_relu(ssrc + sdst_e,
                            negative_slope=self.negative_slope)
        alpha = segment_softmax(pre, receivers_local, n_loc,
                                mask=edge_weight > 0)
        out = segment_sum(y * alpha[:, None].astype(y.dtype),
                          receivers_local, n_loc)
        return out + self.param("bias", nn.initializers.zeros,
                                (self.features,),
                                jnp.float32).astype(out.dtype)


#: dist layer registry — layer classes whose call signature is
#: (x, senders, receivers, edge_weight, send_idx=None, send_mask=None)
DIST_LAYER_REGISTRY = {
    "SAGEConv": DistSAGEConv,
    "GINConv": DistGINConv,
    "GATConv": DistGATConv,
}


def make_dist_conv(layer_name: str, features: int, axis_name: str,
                   name: str, halo: bool) -> nn.Module:
    """Layer factory for the dist stacks (reference layer selection,
    ``network.py:13``).  GCN keeps its dedicated classes (param-tree and
    signature compatibility with round-1/2 checkpoints)."""
    if layer_name == "GCNConv":
        cls = DistGCNConvHalo if halo else DistGCNConv
        return cls(features, axis_name=axis_name, name=name)
    if layer_name not in DIST_LAYER_REGISTRY:
        raise ValueError(f"unknown dist layer {layer_name!r}; choose from "
                         f"{['GCNConv'] + sorted(DIST_LAYER_REGISTRY)}")
    return DIST_LAYER_REGISTRY[layer_name](features, axis_name=axis_name,
                                           name=name)


class DistNodeModelHalo(nn.Module):
    """GCN node model over the halo-exchange plan; param tree mirrors
    ``DistNodeModel`` ({"convs": {"GCNConv_i": ...}, "head"})."""

    hidden: int
    num_layers: int
    out_dim: int
    classify: bool = True
    dropout_rate: float = 0.5
    axis_name: str = "data"
    layer_name: str = "GCNConv"

    @nn.compact
    def __call__(self, x_local, senders_ext, receivers_local, edge_weight,
                 send_idx, send_mask, *, train: bool = False):
        layer_name = self.layer_name

        class _Stack(nn.Module):
            hidden: int
            num_layers: int
            dropout_rate: float
            axis_name: str

            @nn.compact
            def __call__(self, x, *, train=False):
                for i in range(self.num_layers):
                    conv = make_dist_conv(layer_name, self.hidden,
                                          self.axis_name,
                                          f"{layer_name}_{i}", halo=True)
                    x = conv(x, senders_ext, receivers_local, edge_weight,
                             send_idx, send_mask)
                    x = nn.elu(x)
                    x = nn.Dropout(self.dropout_rate,
                                   deterministic=not train)(x)
                return x

        x = _Stack(self.hidden, self.num_layers, self.dropout_rate,
                   self.axis_name, name="convs")(x_local, train=train)
        x = nn.Dense(self.out_dim, name="head")(x)
        if self.classify:
            return nn.log_softmax(x, axis=-1)
        return x


class DistConvStack(nn.Module):
    hidden: int
    num_layers: int
    dropout_rate: float = 0.5
    axis_name: str = "data"
    layer_name: str = "GCNConv"

    @nn.compact
    def __call__(self, x_local, senders_global, receivers_local, edge_weight,
                 *, train: bool = False):
        for i in range(self.num_layers):
            conv = make_dist_conv(self.layer_name, self.hidden,
                                  self.axis_name,
                                  f"{self.layer_name}_{i}", halo=False)
            x_local = conv(x_local, senders_global, receivers_local,
                           edge_weight)
            x_local = nn.elu(x_local)
            x_local = nn.Dropout(self.dropout_rate,
                                 deterministic=not train)(x_local)
        return x_local


class DistNodeModel(nn.Module):
    """Mirror of ``models.NodeModel`` over the sharded graph — identical
    param-tree structure ({"convs": {"<layer>_i": ...}, "head"}); the layer
    is selected by name like the reference (``network.py:13``)."""

    hidden: int
    num_layers: int
    out_dim: int
    classify: bool = True
    dropout_rate: float = 0.5
    axis_name: str = "data"
    layer_name: str = "GCNConv"

    @nn.compact
    def __call__(self, x_local, senders_global, receivers_local, edge_weight,
                 *, train: bool = False):
        x_local = DistConvStack(self.hidden, self.num_layers,
                                self.dropout_rate, self.axis_name,
                                self.layer_name,
                                name="convs")(
            x_local, senders_global, receivers_local, edge_weight, train=train)
        x_local = nn.Dense(self.out_dim, name="head")(x_local)
        if self.classify:
            return nn.log_softmax(x_local, axis=-1)
        return x_local
