"""First-layer pre-aggregation: exact equality with the regular GCN stack."""

import numpy as np
import jax
import jax.numpy as jnp

from fitgnn_tpu.data.synthetic import sbm_graph
from fitgnn_tpu.graph import build_graph
from fitgnn_tpu.models import NodeModel
from fitgnn_tpu.models.models import preaggregate_features


def setup():
    x, s, r, y = sbm_graph(num_nodes=200, num_classes=3, num_features=24,
                           seed=0)
    g = build_graph(x, s, r, y=y)
    return g


class TestPreAggregation:
    def test_exact_forward_parity(self):
        g = setup()
        reg = NodeModel(layer_name="GCNConv", hidden=16, num_layers=2,
                        out_dim=3)
        pre = NodeModel(layer_name="GCNConv", hidden=16, num_layers=2,
                        out_dim=3, first_layer_preaggregated=True)
        params = reg.init(jax.random.PRNGKey(0), g.x, g)
        x_pre = preaggregate_features(g)
        # identical param trees → direct reuse
        out_reg = reg.apply(params, g.x, g)
        out_pre = pre.apply(params, x_pre, g)
        np.testing.assert_allclose(np.asarray(out_pre), np.asarray(out_reg),
                                   rtol=1e-5, atol=1e-6)

    def test_param_trees_identical(self):
        g = setup()
        reg = NodeModel(layer_name="GCNConv", hidden=8, num_layers=2,
                        out_dim=3)
        pre = NodeModel(layer_name="GCNConv", hidden=8, num_layers=2,
                        out_dim=3, first_layer_preaggregated=True)
        p1 = reg.init(jax.random.PRNGKey(0), g.x, g)
        p2 = pre.init(jax.random.PRNGKey(0), preaggregate_features(g), g)
        s1 = jax.tree_util.tree_structure(p1)
        s2 = jax.tree_util.tree_structure(p2)
        assert s1 == s2

    def test_gradients_match(self):
        g = setup()
        reg = NodeModel(layer_name="GCNConv", hidden=8, num_layers=2,
                        out_dim=3)
        pre = NodeModel(layer_name="GCNConv", hidden=8, num_layers=2,
                        out_dim=3, first_layer_preaggregated=True)
        params = reg.init(jax.random.PRNGKey(0), g.x, g)
        x_pre = preaggregate_features(g)
        y = jnp.asarray(np.zeros(g.num_nodes_padded, dtype=np.int32))

        def loss_reg(p):
            out = reg.apply(p, g.x, g)
            return -jnp.mean(out[:, 0])

        def loss_pre(p):
            out = pre.apply(p, x_pre, g)
            return -jnp.mean(out[:, 0])

        g1 = jax.grad(loss_reg)(params)
        g2 = jax.grad(loss_pre)(params)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


class TestPreAggregationSageGin:
    """SAGE/GIN layer-0 pre-aggregation: exact parity with the regular
    stack, including the ε gradient (GIN) and identical param trees."""

    def _pair(self, layer_name, seed=0):
        from fitgnn_tpu.models.models import preaggregate_input
        g = setup()
        reg = NodeModel(layer_name=layer_name, hidden=16, num_layers=2,
                        out_dim=3)
        pre = NodeModel(layer_name=layer_name, hidden=16, num_layers=2,
                        out_dim=3, first_layer_preaggregated=True)
        params = reg.init(jax.random.PRNGKey(seed), g.x, g)
        x_pre = preaggregate_input(g, layer_name)
        assert x_pre.shape[-1] == 2 * g.x.shape[-1]
        return g, reg, pre, params, x_pre

    def test_sage_forward_and_grads(self):
        g, reg, pre, params, x_pre = self._pair("SAGEConv")
        out_reg = reg.apply(params, g.x, g)
        out_pre = pre.apply(params, x_pre, g)
        np.testing.assert_allclose(np.asarray(out_pre), np.asarray(out_reg),
                                   rtol=1e-5, atol=1e-5)
        g1 = jax.grad(lambda p: -jnp.mean(reg.apply(p, g.x, g)[:, 0]))(params)
        g2 = jax.grad(lambda p: -jnp.mean(pre.apply(p, x_pre, g)[:, 0]))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_gin_forward_and_grads(self):
        g, reg, pre, params, x_pre = self._pair("GINConv")
        out_reg = reg.apply(params, g.x, g)
        out_pre = pre.apply(params, x_pre, g)
        np.testing.assert_allclose(np.asarray(out_pre), np.asarray(out_reg),
                                   rtol=1e-5, atol=1e-5)
        g1 = jax.grad(lambda p: -jnp.mean(reg.apply(p, g.x, g)[:, 0]))(params)
        g2 = jax.grad(lambda p: -jnp.mean(pre.apply(p, x_pre, g)[:, 0]))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_param_trees_identical(self):
        from fitgnn_tpu.models.models import preaggregate_input
        g = setup()
        for layer in ("SAGEConv", "GINConv"):
            reg = NodeModel(layer_name=layer, hidden=8, num_layers=2,
                            out_dim=3)
            pre = NodeModel(layer_name=layer, hidden=8, num_layers=2,
                            out_dim=3, first_layer_preaggregated=True)
            p1 = reg.init(jax.random.PRNGKey(0), g.x, g)
            p2 = pre.init(jax.random.PRNGKey(0),
                          preaggregate_input(g, layer), g)
            assert (jax.tree_util.tree_structure(p1)
                    == jax.tree_util.tree_structure(p2)), layer
