"""Tile-dense GAT attention must match the per-edge segment-softmax path
exactly (outputs and gradients), including straggler-only and tile-heavy
graphs."""

import numpy as np
import jax
import jax.numpy as jnp

from fitgnn_tpu.data.synthetic import sbm_graph
from fitgnn_tpu.graph import build_graph
from fitgnn_tpu.graph.optimize import build_optimized_graph
from fitgnn_tpu.models import NodeModel
from fitgnn_tpu.models.layers import GATConv


def _graphs(seed=7, n=640):
    x, s, r, y = sbm_graph(num_nodes=n, num_classes=4, num_features=16,
                           p_in=0.1, p_out=0.01, seed=seed)
    g_plain = build_graph(x, s, r, y=y, node_pad_to=128)
    g_opt, order = build_optimized_graph(x, s, r, y=y, min_block_edges=8,
                                         layer_name="GATConv", seed=0)
    return g_plain, g_opt, order


def test_gatconv_tile_path_matches_per_edge():
    g_plain, g_opt, order = _graphs()
    assert g_opt.aux.semantics == "att_unit"
    assert g_opt.aux.bsr is not None
    layer = GATConv(features=16)
    params = layer.init(jax.random.PRNGKey(0), g_plain.x, g_plain)
    out_plain = np.asarray(layer.apply(params, g_plain.x, g_plain))
    out_opt = np.asarray(layer.apply(params, g_opt.x, g_opt))
    np.testing.assert_allclose(out_opt[: len(order)], out_plain[order],
                               rtol=2e-4, atol=2e-5)

    def loss(p, gg):
        out = layer.apply(p, gg.x, gg)
        return jnp.sum(out[: gg.n_node] ** 2)

    g1 = jax.grad(loss)(params, g_plain)
    g2 = jax.grad(loss)(params, g_opt)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_gat_model_end_to_end_tile_path():
    g_plain, g_opt, order = _graphs(seed=9)
    model = NodeModel(layer_name="GATConv", hidden=16, num_layers=2,
                      out_dim=4)
    params = model.init(jax.random.PRNGKey(1), g_plain.x, g_plain)
    out_plain = np.asarray(model.apply(params, g_plain.x, g_plain))
    out_opt = np.asarray(model.apply(params, g_opt.x, g_opt))
    np.testing.assert_allclose(out_opt[: len(order)], out_plain[order],
                               rtol=2e-3, atol=2e-4)


def test_multihead_falls_back_to_per_edge():
    g_plain, g_opt, _ = _graphs(seed=3, n=384)
    layer = GATConv(features=8, heads=2)
    params = layer.init(jax.random.PRNGKey(0), g_opt.x, g_opt)
    out = layer.apply(params, g_opt.x, g_opt)   # must not crash
    assert out.shape == (g_opt.num_nodes_padded, 16)


def test_weighted_spmm_sorted_grads():
    """The F>128 straggler branch (sorted-backward custom VJP) must match
    the plain segment-sum reference in forward and both gradients."""
    import jax.numpy as jnp
    from fitgnn_tpu.ops.hybrid_spmm import build_hybrid
    from fitgnn_tpu.ops.tile_gat import _weighted_spmm_sorted

    rng = np.random.default_rng(11)
    n, e, f = 512, 800, 160           # f > 128: the sorted branch's regime
    s = rng.integers(0, n, e, dtype=np.int64)
    r = np.sort(rng.integers(0, n, e, dtype=np.int64))
    hyb = build_hybrid(s, r, np.ones(e, np.float32), n,
                       min_block_edges=10 ** 9, use_segmm=False,
                       semantics="att_unit")
    assert hyb.t_edge_perm is not None
    w = jnp.asarray(rng.random(len(hyb.senders)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))

    def loss_k(ww, xx):
        return jnp.sum(_weighted_spmm_sorted(hyb, ww, xx) ** 2)

    def loss_r(ww, xx):
        out = jax.ops.segment_sum(xx[hyb.senders] * ww[:, None],
                                  hyb.receivers, num_segments=n,
                                  indices_are_sorted=True)
        return jnp.sum(out ** 2)

    np.testing.assert_allclose(float(loss_k(w, x)), float(loss_r(w, x)),
                               rtol=1e-5)
    dw_k, dx_k = jax.grad(loss_k, argnums=(0, 1))(w, x)
    dw_r, dx_r = jax.grad(loss_r, argnums=(0, 1))(w, x)
    np.testing.assert_allclose(np.asarray(dw_k), np.asarray(dw_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dx_k), np.asarray(dx_r),
                               rtol=1e-4, atol=1e-4)


def test_gatconv_wide_features_sorted_branch():
    """End-to-end GAT grad parity when features > 128 (sorted-backward
    straggler branch instead of the segmm selector)."""
    g_plain, g_opt, order = _graphs(seed=5, n=512)
    layer = GATConv(features=144)
    params = layer.init(jax.random.PRNGKey(2), g_plain.x, g_plain)

    def loss(p, gg):
        out = layer.apply(p, gg.x, gg)
        return jnp.sum(out[: gg.n_node] ** 2)

    np.testing.assert_allclose(float(loss(params, g_opt)),
                               float(loss(params, g_plain)), rtol=2e-4)
    g1 = jax.grad(loss)(params, g_plain)
    g2 = jax.grad(loss)(params, g_opt)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_gat_diag_split_matches_per_edge():
    """use_diag: block-diagonal attention tiles ride a pure-XLA batched
    einsum (no gather/scatter/segment op) — outputs and grads must match
    the per-edge path (round-3 GAT attack)."""
    x, s, r, y = sbm_graph(num_nodes=640, num_classes=4, num_features=16,
                           p_in=0.1, p_out=0.01, seed=7)
    g_plain = build_graph(x, s, r, y=y, node_pad_to=128)
    g_opt, order = build_optimized_graph(x, s, r, y=y, min_block_edges=8,
                                         layer_name="GATConv",
                                         use_diag=True, seed=0)
    assert g_opt.aux.diag_blocks is not None
    layer = GATConv(features=16)
    params = layer.init(jax.random.PRNGKey(0), g_plain.x, g_plain)
    out_plain = np.asarray(layer.apply(params, g_plain.x, g_plain))
    out_opt = np.asarray(layer.apply(params, g_opt.x, g_opt))
    np.testing.assert_allclose(out_opt[: len(order)], out_plain[order],
                               rtol=2e-4, atol=2e-5)

    def loss(p, gg):
        out = layer.apply(p, gg.x, gg)
        return jnp.sum(out[: gg.n_node] ** 2)

    g1 = jax.grad(loss)(params, g_plain)
    g2 = jax.grad(loss)(params, g_opt)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_gat_diag_split_exact_max_all_diag_edges(monkeypatch):
    """FITGNN_GAT_GLOBAL_MAX=0 (exact segment-max stabilizer) with use_diag:
    a node whose in-edges ALL sit in its diagonal tile has no straggler and
    no BSR row, so m must fold in the diag-tile row maxima — pre-fix m was
    -1e30 and exp(e_d - m) = inf poisoned the output (review round-3)."""
    from fitgnn_tpu.ops import tile_gat
    monkeypatch.setattr(tile_gat, "_GLOBAL_MAX", False)

    # two disjoint 128-node communities → after community ordering every
    # edge is intra-block: zero stragglers, zero off-diagonal tiles
    rng = np.random.default_rng(2)
    n = 256
    parts = []
    for lo in (0, 128):
        e = 600
        s = rng.integers(lo, lo + 128, e, dtype=np.int64)
        r = rng.integers(lo, lo + 128, e, dtype=np.int64)
        keep = s != r
        parts.append((s[keep], r[keep]))
    s = np.concatenate([p[0] for p in parts])
    r = np.concatenate([p[1] for p in parts])
    x = rng.standard_normal((n, 16)).astype(np.float32)
    y = (np.arange(n) // 128).astype(np.int32)

    g_plain = build_graph(x, s, r, y=y, node_pad_to=128)
    g_opt, order = build_optimized_graph(x, s, r, y=y, min_block_edges=8,
                                         layer_name="GATConv",
                                         use_diag=True, seed=0)
    assert g_opt.aux.diag_blocks is not None
    layer = GATConv(features=16)
    params = layer.init(jax.random.PRNGKey(0), g_plain.x, g_plain)
    out_plain = np.asarray(layer.apply(params, g_plain.x, g_plain))
    out_opt = np.asarray(layer.apply(params, g_opt.x, g_opt))
    assert np.isfinite(out_opt).all()
    np.testing.assert_allclose(out_opt[: len(order)], out_plain[order],
                               rtol=2e-4, atol=2e-5)

    def loss(p, gg):
        out = layer.apply(p, gg.x, gg)
        return jnp.sum(out[: gg.n_node] ** 2)

    g1 = jax.grad(loss)(params, g_plain)
    g2 = jax.grad(loss)(params, g_opt)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        assert np.isfinite(np.asarray(b)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
