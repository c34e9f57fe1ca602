"""Fused tile-attention kernels (ops/pallas/att_bsr.py) must match the
two-stage XLA path (score materialization + dynamic-BSR apply) exactly —
outputs AND gradients — since both implement the same masked softmax."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fitgnn_tpu.data.synthetic import sbm_graph
from fitgnn_tpu.graph import build_graph
from fitgnn_tpu.graph.optimize import build_optimized_graph
from fitgnn_tpu.models.layers import GATConv
from fitgnn_tpu.ops import tile_gat


@pytest.fixture
def graphs():
    x, s, r, y = sbm_graph(num_nodes=640, num_classes=4, num_features=16,
                           p_in=0.1, p_out=0.01, seed=11)
    g_plain = build_graph(x, s, r, y=y, node_pad_to=128)
    g_opt, order = build_optimized_graph(x, s, r, y=y, min_block_edges=8,
                                         layer_name="GATConv", seed=0)
    assert g_opt.aux.bsr is not None and g_opt.aux.dyn_plan is not None
    return g_plain, g_opt, order


def _with_fused(flag, fn, *args):
    old = tile_gat._FUSED_TILES
    tile_gat._FUSED_TILES = flag
    try:
        return fn(*args)
    finally:
        tile_gat._FUSED_TILES = old


def test_fused_tiles_match_two_stage(graphs):
    g_plain, g_opt, order = graphs
    layer = GATConv(features=16)
    params = layer.init(jax.random.PRNGKey(0), g_plain.x, g_plain)

    out_fused = _with_fused(True, lambda: np.asarray(
        layer.apply(params, g_opt.x, g_opt)))
    out_two = _with_fused(False, lambda: np.asarray(
        layer.apply(params, g_opt.x, g_opt)))
    np.testing.assert_allclose(out_fused, out_two, rtol=2e-4, atol=2e-5)

    out_plain = np.asarray(layer.apply(params, g_plain.x, g_plain))
    np.testing.assert_allclose(out_fused[: len(order)], out_plain[order],
                               rtol=2e-4, atol=2e-5)


def test_fused_tiles_gradients_match(graphs):
    g_plain, g_opt, _ = graphs
    layer = GATConv(features=24)    # expanding: narrow-side path too
    params = layer.init(jax.random.PRNGKey(1), g_plain.x, g_plain)

    def loss(p, gg):
        out = layer.apply(p, gg.x, gg)
        return jnp.sum(out[: gg.n_node] ** 2)

    gf = _with_fused(True, lambda: jax.grad(loss)(params, g_opt))
    gt = _with_fused(False, lambda: jax.grad(loss)(params, g_opt))
    gp = jax.grad(loss)(params, g_plain)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
