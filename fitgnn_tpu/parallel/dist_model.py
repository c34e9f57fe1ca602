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

from fitgnn_tpu.ops.segment import segment_sum


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


class DistNodeModelHalo(nn.Module):
    """GCN node model over the halo-exchange plan; param tree mirrors
    ``DistNodeModel`` ({"convs": {"GCNConv_i": ...}, "head"})."""

    hidden: int
    num_layers: int
    out_dim: int
    classify: bool = True
    dropout_rate: float = 0.5
    axis_name: str = "data"

    @nn.compact
    def __call__(self, x_local, senders_ext, receivers_local, edge_weight,
                 send_idx, send_mask, *, train: bool = False):
        class _Stack(nn.Module):
            hidden: int
            num_layers: int
            dropout_rate: float
            axis_name: str

            @nn.compact
            def __call__(self, x, *, train=False):
                for i in range(self.num_layers):
                    x = DistGCNConvHalo(self.hidden,
                                        axis_name=self.axis_name,
                                        name=f"GCNConv_{i}")(
                        x, senders_ext, receivers_local, edge_weight,
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

    @nn.compact
    def __call__(self, x_local, senders_global, receivers_local, edge_weight,
                 *, train: bool = False):
        for i in range(self.num_layers):
            x_local = DistGCNConv(self.hidden, axis_name=self.axis_name,
                                  name=f"GCNConv_{i}")(
                x_local, senders_global, receivers_local, edge_weight)
            x_local = nn.elu(x_local)
            x_local = nn.Dropout(self.dropout_rate,
                                 deterministic=not train)(x_local)
        return x_local


class DistNodeModel(nn.Module):
    """Mirror of ``models.NodeModel`` (GCN stack) over the sharded graph —
    identical param-tree structure ({"convs": {"GCNConv_i": ...}, "head"})."""

    hidden: int
    num_layers: int
    out_dim: int
    classify: bool = True
    dropout_rate: float = 0.5
    axis_name: str = "data"

    @nn.compact
    def __call__(self, x_local, senders_global, receivers_local, edge_weight,
                 *, train: bool = False):
        x_local = DistConvStack(self.hidden, self.num_layers,
                                self.dropout_rate, self.axis_name,
                                name="convs")(
            x_local, senders_global, receivers_local, edge_weight, train=train)
        x_local = nn.Dense(self.out_dim, name="head")(x_local)
        if self.classify:
            return nn.log_softmax(x_local, axis=-1)
        return x_local
