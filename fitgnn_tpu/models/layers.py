"""Message-passing layers on the fitgnn_tpu segment/SpMM ops.

First-party replacements for the PyG conv layers the reference selects by
name (``network.py:13-21``, ``getattr(pyg_nn, args.layer_name)``): GCNConv,
GATConv, SAGEConv, GINConv.  Semantics follow the PyG defaults the reference
relies on:

* GCNConv  — symmetric D^-1/2 (A+I) D^-1/2 aggregation of W·x (+bias).
  The normalized weights are precomputed in ``graph.build`` so the layer is
  one dense matmul (MXU) + one weighted SpMM.
* GATConv  — per-head additive attention, segment-softmax over incoming
  edges (self loops included), LeakyReLU(0.2).
* SAGEConv — W_l·mean_neigh(x) + W_r·x; self loops excluded from the mean.
* GINConv  — MLP((1+eps)·x + Σ_neigh x) with trainable eps and the
  reference's 2-layer ReLU MLP (``network.py:19-21``).

All layers take the padded ``Graph`` container; padding edges are excluded
via the weight vector (GCN) or the edge mask (others).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import flax.linen as nn

from fitgnn_tpu.graph.container import Graph
from fitgnn_tpu.ops.segment import segment_mean, segment_softmax, segment_sum
from fitgnn_tpu.ops.spmm import spmm_coo


def _nonself_weight(g: Graph) -> jnp.ndarray:
    """1.0 on real non-self-loop edges, else 0 (padding edges are self loops
    on the padding node, so they drop out automatically)."""
    return jnp.where(g.senders != g.receivers, 1.0, 0.0).astype(g.x.dtype)


class GCNConv(nn.Module):
    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None   # compute dtype (bf16 halves the
                                        # gather/scatter HBM traffic)

    @nn.compact
    def __call__(self, x: jnp.ndarray, g: Graph) -> jnp.ndarray:
        from fitgnn_tpu.ops.hybrid_spmm import HybridSpmm, hybrid_spmm
        if isinstance(g.aux, HybridSpmm) and g.aux.semantics == "gcn_norm":
            agg = lambda h: hybrid_spmm(g.aux, h)          # noqa: E731
        else:
            agg = lambda h: spmm_coo(g.edge_weight, g.senders,  # noqa: E731
                                     g.receivers, h, g.num_nodes_padded)
        lin = nn.Dense(self.features, use_bias=False, name="lin",
                       dtype=self.dtype)
        # Â(X·W) = (Â·X)·W — aggregate on the NARROW side of the layer.
        # The SpMM's gather/scatter/tile traffic scales with the aggregated
        # width, so a contracting layer (e.g. hidden→classes) aggregates
        # the transformed features and an expanding one the raw input.
        if self.features <= x.shape[-1]:
            out = agg(lin(x))
        else:
            out = lin(agg(x))
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.features,), jnp.float32
                                   ).astype(out.dtype)
        return out


class _Kernel(nn.Module):
    """Bare kernel parameter with ``nn.Dense``'s param path + init
    (``params/<name>/kernel``, lecun_normal) — lets GATConv read the weight
    matrix without running the dense transform."""
    shape: tuple

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class GATConv(nn.Module):
    features: int            # per-head output channels
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    dtype: Optional[jnp.dtype] = None   # compute dtype for the transform +
                                        # message traffic; attention scores
                                        # and softmax stay float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, g: Graph) -> jnp.ndarray:
        n, h_, c = g.num_nodes_padded, self.heads, self.features
        f_in = x.shape[-1]
        kernel = _Kernel((f_in, h_ * c), name="lin")()       # (F_in, H·C)
        a_src = self.param("att_src", nn.initializers.glorot_uniform(), (h_, c))
        a_dst = self.param("att_dst", nn.initializers.glorot_uniform(), (h_, c))
        dt = self.dtype or jnp.promote_types(x.dtype, kernel.dtype)
        # Aggregate on the NARROW side of an expanding layer (exact, since
        # α is a per-edge scalar): Σ_e α·(X·W)[s] = (Σ_e α·X[s])·W, and the
        # scores are x·(W·a) — a matvec with the (F_in,) projected attention
        # vector.  The gather/segment/tile message traffic then runs at
        # F_in instead of H·C (4× narrower for the 128→512 bench layer).
        narrow = h_ == 1 and f_in < c
        if narrow:
            v_src = (kernel.astype(jnp.float32)
                     @ a_src.astype(jnp.float32)[0])          # (F_in,)
            v_dst = kernel.astype(jnp.float32) @ a_dst.astype(jnp.float32)[0]
            xf = x.astype(jnp.float32)
            score_src = (xf @ v_src)[:, None]                 # (N, 1)
            score_dst = (xf @ v_dst)[:, None]
            h = x.astype(dt)[:, None, :]                      # messages = x
        else:
            h = (x.astype(dt) @ kernel.astype(dt)).reshape(n, h_, c)
            score_src = jnp.sum(h.astype(jnp.float32) * a_src, axis=-1)
            score_dst = jnp.sum(h.astype(jnp.float32) * a_dst, axis=-1)
        from fitgnn_tpu.ops.hybrid_spmm import HybridSpmm
        if (h_ == 1 and isinstance(g.aux, HybridSpmm)
                and g.aux.semantics == "att_unit"):
            # flash-attention-style dense-tile path: intra-tile scores by
            # outer broadcast, per-edge work only for stragglers
            from fitgnn_tpu.ops.tile_gat import tile_gat_attention
            out = tile_gat_attention(g.aux, score_src[:, 0],
                                     score_dst[:, 0], h[:, 0, :],
                                     self.negative_slope,
                                     att_src=(v_src if narrow
                                              else a_src[0]))[:, None, :]
        else:
            from fitgnn_tpu.ops.spmm import use_dense
            if use_dense(n):
                # dense masked attention for small (bucketed Gs) subgraphs:
                # one E-element scatter builds the (N, N) edge-count mask,
                # then scores/softmax/aggregation are (N, N, H) broadcasts
                # + an MXU matmul — same math as the per-edge segment path
                # (duplicate edges weight the exp by their count, empty
                # receivers hit the same 1e-16 denominator clamp)
                cnt = jnp.zeros((n, n), jnp.float32)
                cnt = cnt.at[g.receivers, g.senders].add(
                    jnp.where(g.edge_mask, 1.0, 0.0))
                s = score_dst[:, None, :] + score_src[None, :, :]
                s = nn.leaky_relu(s, negative_slope=self.negative_slope)
                has = (cnt > 0.0)[..., None]                 # (N, N, 1)
                m = jnp.max(jnp.where(has, s, -1e30), axis=1, keepdims=True)
                m = jnp.where(m <= -1e29, 0.0, m)
                p = jnp.where(has, jnp.exp(s - m), 0.0) * cnt[..., None]
                denom = jnp.maximum(p.sum(axis=1, keepdims=True), 1e-16)
                alpha = p / denom                            # (N, N, H)
                out = jnp.einsum("ijh,jhc->ihc", alpha.astype(h.dtype), h)
            else:
                from fitgnn_tpu.ops.sddmm import gather_concat_score
                e = gather_concat_score(g.senders, g.receivers,
                                        score_src, score_dst)    # (E, H)
                e = nn.leaky_relu(e, negative_slope=self.negative_slope)
                alpha = segment_softmax(e, g.receivers, n,
                                        mask=g.edge_mask)        # (E, H)
                from fitgnn_tpu.ops.segment import take_rows
                msg = (take_rows(h, g.senders)
                       * alpha[..., None].astype(h.dtype))
                out = segment_sum(msg, g.receivers, n)       # (N, H, C|F_in)
        if narrow:
            # transform AFTER aggregation: (Σ α·x)·W
            out = (out[:, 0, :] @ kernel.astype(dt))[:, None, :]
        if self.concat:
            out = out.reshape(n, h_ * c)
            bias_dim = h_ * c
        else:
            out = out.mean(axis=1)
            bias_dim = c
        return out + self.param("bias", nn.initializers.zeros,
                                (bias_dim,), jnp.float32).astype(out.dtype)


class SAGEConv(nn.Module):
    features: int
    dtype: Optional[jnp.dtype] = None   # compute dtype (bf16 halves the
                                        # dense-stack + SpMM HBM traffic)

    @nn.compact
    def __call__(self, x: jnp.ndarray, g: Graph) -> jnp.ndarray:
        from fitgnn_tpu.ops.hybrid_spmm import HybridSpmm, hybrid_spmm
        if (isinstance(g.aux, HybridSpmm)
                and g.aux.semantics == "mean_nonself"):
            # neighbor mean as a static-weight SpMM (w = 1/indeg on
            # non-self edges) through the BCSR/COO fast path
            agg = lambda h: hybrid_spmm(g.aux, h)          # noqa: E731
        else:
            w = _nonself_weight(g)
            from fitgnn_tpu.ops.spmm import use_dense
            if use_dense(g.num_nodes_padded):
                # neighbor mean as a (w/deg)-weighted SpMM: rides the
                # dense-adjacency branch (batched MXU matmul under the
                # vmapped Gs forward) instead of gather + segment_mean
                deg = segment_sum(w, g.receivers, g.num_nodes_padded)
                wn = w * (1.0 / jnp.maximum(deg, 1.0))[g.receivers]
                agg = lambda h: spmm_coo(wn, g.senders,  # noqa: E731
                                         g.receivers, h,
                                         g.num_nodes_padded)
            else:
                from fitgnn_tpu.ops.segment import take_rows
                agg = lambda h: segment_mean(  # noqa: E731
                    take_rows(h, g.senders), g.receivers,
                    g.num_nodes_padded, mask=w > 0)
        lin_l = nn.Dense(self.features, use_bias=True, name="lin_l",
                         dtype=self.dtype)
        if self.features <= x.shape[-1]:
            # aggregate on the narrow side: mean(x)·W + b = mean(x·W) + b
            # (the bias is added unconditionally either way, matching
            # lin_l(mean(x)) which gives isolated nodes the bias too)
            b_l = lin_l(jnp.zeros((1, x.shape[-1]), x.dtype))
            out = agg(lin_l(x) - b_l) + b_l
        else:
            out = lin_l(agg(x))
        out = out + nn.Dense(self.features, use_bias=False, name="lin_r",
                             dtype=self.dtype)(x)
        return out


class GINConv(nn.Module):
    features: int
    mlp_hidden: int | None = None  # defaults to ``features``
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, g: Graph) -> jnp.ndarray:
        from fitgnn_tpu.ops.hybrid_spmm import HybridSpmm, hybrid_spmm
        if (isinstance(g.aux, HybridSpmm)
                and g.aux.semantics == "sum_nonself"):
            agg = lambda h: hybrid_spmm(g.aux, h)          # noqa: E731
        else:
            w = _nonself_weight(g)
            agg = lambda h: spmm_coo(w, g.senders, g.receivers,  # noqa: E731
                                     h, g.num_nodes_padded)
        eps = self.param("eps", nn.initializers.zeros, ())
        hidden = self.mlp_hidden or self.features
        mlp_0 = nn.Dense(hidden, name="mlp_0", dtype=self.dtype)
        if hidden <= x.shape[-1]:
            # aggregate on the narrow side:  W₀((1+ε)x + Σx) + b₀
            # = (1+ε)(xW₀) + Σ(xW₀) + b₀  — push x through the first MLP
            # matmul before the sum-aggregation
            b0 = mlp_0(jnp.zeros((1, x.shape[-1]), x.dtype))
            h0 = mlp_0(x) - b0
            h = nn.relu((1.0 + eps).astype(h0.dtype) * h0 + agg(h0) + b0)
        else:
            h = (1.0 + eps).astype(x.dtype) * x + agg(x)
            h = nn.relu(mlp_0(h))
        h = nn.relu(nn.Dense(self.features, name="mlp_1",
                             dtype=self.dtype)(h))
        return h


LAYER_REGISTRY: dict[str, Callable[..., nn.Module]] = {
    "GCNConv": GCNConv,
    "GATConv": GATConv,
    "SAGEConv": SAGEConv,
    "GINConv": GINConv,
}


def make_layer(layer_name: str, features: int,
               dtype: Optional[jnp.dtype] = None,
               name: Optional[str] = None) -> nn.Module:
    if layer_name not in LAYER_REGISTRY:
        raise ValueError(
            f"unknown layer {layer_name!r}; choose from {sorted(LAYER_REGISTRY)}")
    kwargs = {} if name is None else {"name": name}
    if dtype is not None:
        return LAYER_REGISTRY[layer_name](features=features, dtype=dtype,
                                          **kwargs)
    return LAYER_REGISTRY[layer_name](features=features, **kwargs)
