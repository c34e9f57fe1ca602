"""build_optimized_graph (Leiden reorder + hybrid operator) must be an
exact node permutation of the plain path: same forward outputs and
gradients, rows mapped back through ``order``."""

import numpy as np
import jax
import jax.numpy as jnp

from fitgnn_tpu.data.synthetic import sbm_graph
from fitgnn_tpu.graph import build_graph
from fitgnn_tpu.graph.optimize import (build_optimized_graph,
                                       should_use_hybrid)
from fitgnn_tpu.models import NodeModel
from fitgnn_tpu.train.losses import masked_nll


def test_forward_and_grad_match_plain():
    x, s, r, y = sbm_graph(num_nodes=640, num_classes=4, num_features=16,
                           p_in=0.1, p_out=0.01, seed=3)
    train = np.zeros(640, dtype=bool)
    train[::3] = True
    g_plain = build_graph(x, s, r, y=y, train_mask=train, node_pad_to=128)
    g_opt, order = build_optimized_graph(
        x, s, r, y=y, train_mask=train, min_block_edges=8, seed=0)
    assert g_opt.aux is not None and g_opt.aux.bsr is not None

    model = NodeModel(layer_name="GCNConv", hidden=16, num_layers=2,
                      out_dim=4)
    params = model.init(jax.random.PRNGKey(0), g_plain.x, g_plain)

    out_plain = np.asarray(model.apply(params, g_plain.x, g_plain))
    out_opt = np.asarray(model.apply(params, g_opt.x, g_opt))
    # row i of the optimized graph is original node order[i]
    np.testing.assert_allclose(out_opt[: len(order)], out_plain[order],
                               rtol=2e-3, atol=2e-4)

    def loss(p, gg):
        out = model.apply(p, gg.x, gg)
        return masked_nll(out, gg.y, gg.train_mask)

    l1, gr1 = jax.value_and_grad(loss)(params, g_plain)
    l2, gr2 = jax.value_and_grad(loss)(params, g_opt)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(gr1),
                    jax.tree_util.tree_leaves(gr2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_should_use_hybrid_gate():
    assert should_use_hybrid(100_000, "GCNConv", "auto")
    assert not should_use_hybrid(1_000, "GCNConv", "auto")
    # GAT consumes presence tiles through the dense-tile attention path
    assert should_use_hybrid(100_000, "GATConv", "auto")
    assert should_use_hybrid(1_000, "GCNConv", "on")
    assert not should_use_hybrid(100_000, "GCNConv", "off")


def test_optimize_coarse_matches_plain():
    from fitgnn_tpu.graph.optimize import optimize_coarse
    from fitgnn_tpu.train import steps
    from test_train import make_dataset

    ds = make_dataset()
    co = ds.coarse
    co2 = optimize_coarse(co, min_block_edges=4)
    assert co2.graph.aux is not None

    # dropout off: the node permutation reassigns per-node dropout masks
    # (statistically identical, not bitwise) — exactness is tested without it
    model = NodeModel(layer_name="GCNConv", hidden=16, num_layers=2,
                      out_dim=4, dropout_rate=0.0)
    st1 = steps.create_state(model, jax.random.PRNGKey(0), co.graph.x,
                             co.graph)
    st2 = steps.create_state(model, jax.random.PRNGKey(0), co2.graph.x,
                             co2.graph)
    for i in range(3):
        r = jax.random.PRNGKey(i + 1)
        st1, l1 = steps.gc_train_step(st1, co.graph, co.y_train,
                                      co.train_mask, r, "classification")
        st2, l2 = steps.gc_train_step(st2, co2.graph, co2.y_train,
                                      co2.train_mask, r, "classification")
        np.testing.assert_allclose(float(l1), float(l2), rtol=2e-4)
    v1, a1 = steps.gc_eval_step(st1, co.graph, co.y_val, co.val_mask,
                                "classification")
    v2, a2 = steps.gc_eval_step(st2, co2.graph, co2.y_val, co2.val_mask,
                                "classification")
    np.testing.assert_allclose(float(v1), float(v2), rtol=2e-4)
    np.testing.assert_allclose(float(a1), float(a2), rtol=1e-5)


def test_sage_gin_hybrid_matches_plain():
    from fitgnn_tpu.graph.optimize import build_optimized_graph

    x, s, r, y = sbm_graph(num_nodes=640, num_classes=4, num_features=16,
                           p_in=0.1, p_out=0.01, seed=5)
    g_plain = build_graph(x, s, r, y=y, node_pad_to=128)
    for layer in ("SAGEConv", "GINConv"):
        g_opt, order = build_optimized_graph(
            x, s, r, y=y, min_block_edges=8, layer_name=layer, seed=0)
        assert g_opt.aux.semantics != "gcn_norm"
        assert g_opt.aux.bsr is not None
        model = NodeModel(layer_name=layer, hidden=16, num_layers=2,
                          out_dim=4)
        params = model.init(jax.random.PRNGKey(0), g_plain.x, g_plain)
        out_plain = np.asarray(model.apply(params, g_plain.x, g_plain))
        out_opt = np.asarray(model.apply(params, g_opt.x, g_opt))
        np.testing.assert_allclose(out_opt[: len(order)], out_plain[order],
                                   rtol=2e-3, atol=2e-4, err_msg=layer)
        # gradients flow through the operator
        def loss(p, gg):
            out = model.apply(p, gg.x, gg)
            return jnp.sum(out[: gg.n_node] ** 2)
        g1 = jax.grad(loss)(params, g_plain)
        g2 = jax.grad(loss)(params, g_opt)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-3, atol=3e-4, err_msg=layer)
