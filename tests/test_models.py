"""Layer/model correctness vs explicit dense-formula oracles (SURVEY §4b)."""

import numpy as np
import jax
import jax.numpy as jnp

from fitgnn_tpu.graph import build_graph
from fitgnn_tpu.graph.container import SubgraphBatch
from fitgnn_tpu.models import (
    GCNConv, GATConv, SAGEConv, GINConv, NodeModel, GraphModel,
)


def make_graph(rng, n=12, f=6, normalize=True):
    senders, receivers = [], []
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < 0.3:
                senders.append(i)
                receivers.append(j)
    x = rng.normal(size=(n, f)).astype(np.float32)
    g = build_graph(x, np.array(senders, dtype=np.int32),
                    np.array(receivers, dtype=np.int32), normalize=normalize)
    adj = np.zeros((n, n), dtype=np.float32)
    adj[senders, receivers] = 1
    adj = adj + adj.T
    return g, x, adj


class TestGCNConv:
    def test_matches_dense_formula(self, rng):
        g, x, adj = make_graph(rng)
        n = x.shape[0]
        layer = GCNConv(features=5)
        params = layer.init(jax.random.PRNGKey(0), g.x, g)
        out = np.asarray(layer.apply(params, g.x, g))[:n]

        a_hat = adj + np.eye(n)
        dinv = 1.0 / np.sqrt(a_hat.sum(1))
        a_norm = a_hat * dinv[:, None] * dinv[None, :]
        w = np.asarray(params["params"]["lin"]["kernel"])
        b = np.asarray(params["params"]["bias"])
        expect = a_norm @ (x @ w) + b
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


class TestGATConv:
    def test_attention_rows_sum_and_shape(self, rng):
        g, x, adj = make_graph(rng, normalize=False)
        layer = GATConv(features=4, heads=2)
        params = layer.init(jax.random.PRNGKey(0), g.x, g)
        out = layer.apply(params, g.x, g)
        assert out.shape == (g.num_nodes_padded, 8)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_matches_dense_attention(self, rng):
        g, x, adj = make_graph(rng, normalize=False)
        n = x.shape[0]
        layer = GATConv(features=5, heads=1)
        params = layer.init(jax.random.PRNGKey(1), g.x, g)
        out = np.asarray(layer.apply(params, g.x, g))[:n]

        w = np.asarray(params["params"]["lin"]["kernel"])
        a_src = np.asarray(params["params"]["att_src"])[0]
        a_dst = np.asarray(params["params"]["att_dst"])[0]
        b = np.asarray(params["params"]["bias"])
        h = x @ w
        s_src, s_dst = h @ a_src, h @ a_dst
        a_loop = adj + np.eye(n)  # self loops in the edge list
        scores = s_src[None, :] + s_dst[:, None]  # [dst, src]
        scores = np.where(scores > 0, scores, 0.2 * scores)
        scores = np.where(a_loop > 0, scores, -np.inf)
        scores -= scores.max(1, keepdims=True)
        alpha = np.exp(scores)
        alpha /= alpha.sum(1, keepdims=True)
        expect = alpha @ h + b
        np.testing.assert_allclose(out, expect, rtol=1e-3, atol=1e-4)


class TestSAGEConv:
    def test_matches_dense_mean(self, rng):
        g, x, adj = make_graph(rng, normalize=False)
        n = x.shape[0]
        layer = SAGEConv(features=5)
        params = layer.init(jax.random.PRNGKey(0), g.x, g)
        out = np.asarray(layer.apply(params, g.x, g))[:n]

        deg = np.maximum(adj.sum(1), 1.0)
        mean_neigh = (adj @ x) / deg[:, None]
        p = params["params"]
        expect = (mean_neigh @ np.asarray(p["lin_l"]["kernel"])
                  + np.asarray(p["lin_l"]["bias"])
                  + x @ np.asarray(p["lin_r"]["kernel"]))
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


class TestGINConv:
    def test_matches_dense_sum(self, rng):
        g, x, adj = make_graph(rng, normalize=False)
        n = x.shape[0]
        layer = GINConv(features=5)
        params = layer.init(jax.random.PRNGKey(0), g.x, g)
        out = np.asarray(layer.apply(params, g.x, g))[:n]

        p = params["params"]
        eps = float(p["eps"])
        h = (1 + eps) * x + adj @ x
        h = np.maximum(h @ np.asarray(p["mlp_0"]["kernel"])
                       + np.asarray(p["mlp_0"]["bias"]), 0)
        h = np.maximum(h @ np.asarray(p["mlp_1"]["kernel"])
                       + np.asarray(p["mlp_1"]["bias"]), 0)
        np.testing.assert_allclose(out, h, rtol=1e-4, atol=1e-4)


class TestNodeModel:
    def test_log_softmax_output(self, rng):
        g, x, _ = make_graph(rng)
        model = NodeModel(layer_name="GCNConv", hidden=16, num_layers=2,
                          out_dim=3)
        params = model.init(jax.random.PRNGKey(0), g.x, g)
        out = np.asarray(model.apply(params, g.x, g))
        np.testing.assert_allclose(np.exp(out).sum(-1), 1.0, rtol=1e-4)

    def test_all_layer_types_run_and_grad(self, rng):
        g, _, _ = make_graph(rng)
        for name in ["GCNConv", "GATConv", "SAGEConv", "GINConv"]:
            model = NodeModel(layer_name=name, hidden=8, num_layers=2,
                              out_dim=3)
            params = model.init(jax.random.PRNGKey(0), g.x, g)

            def loss(p):
                out = model.apply(p, g.x, g, train=True,
                                  rngs={"dropout": jax.random.PRNGKey(1)})
                return -jnp.mean(out)

            grads = jax.grad(loss)(params)
            flat = jax.tree_util.tree_leaves(grads)
            assert all(np.all(np.isfinite(np.asarray(l))) for l in flat), name


class TestGraphModel:
    def test_gc_path_softmax(self, rng):
        g, x, _ = make_graph(rng, n=12)
        model = GraphModel(layer_name="GCNConv", hidden=8, num_layers=2,
                           out_dim=2)
        ids = jnp.asarray(np.repeat(np.arange(2), g.num_nodes_padded // 2))
        params = model.init(jax.random.PRNGKey(0), g.x, g, ids, 2)
        out = np.asarray(model.apply(params, g.x, g, ids, 2))
        assert out.shape == (2, 2)
        np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-4)

    def test_gs_path_matches_manual(self, rng):
        # Two identical subgraphs belonging to one sample: Gs forward should
        # equal pooling the per-subgraph conv-stack outputs over consume rows.
        g, x, _ = make_graph(rng, n=10)
        model = GraphModel(layer_name="GCNConv", hidden=8, num_layers=1,
                           out_dim=2)
        np_pad, e_pad = g.num_nodes_padded, g.num_edges_padded
        consume = np.zeros((2, np_pad), dtype=bool)
        consume[:, :5] = True
        batch = SubgraphBatch(
            x=jnp.stack([g.x, g.x]),
            senders=jnp.stack([g.senders, g.senders]),
            receivers=jnp.stack([g.receivers, g.receivers]),
            edge_weight=jnp.stack([g.edge_weight, g.edge_weight]),
            n_node=jnp.stack([g.n_node, g.n_node]),
            n_edge=jnp.stack([g.n_edge, g.n_edge]),
            consume_mask=jnp.asarray(consume),
            orig_idx=jnp.zeros((2, np_pad), dtype=jnp.int32),
        )
        graph_ids = jnp.zeros((2, np_pad), dtype=jnp.int32)
        dummy_ids = jnp.zeros((np_pad,), dtype=jnp.int32)
        params = model.init(jax.random.PRNGKey(0), g.x, g, dummy_ids, 1)
        out = model.apply(params, batch, graph_ids, 1,
                          method=GraphModel.forward_subgraphs)
        assert out.shape == (1, 2)
        # manual: conv stack on single graph, max-pool rows 0..5
        h = model.apply(params, g.x, g, dummy_ids, 1,
                        method=lambda m, xx, gg, i, n: m.convs(xx, gg))
        manual = np.asarray(h)[:5].max(0)
        manual = manual @ np.asarray(params["params"]["head"]["kernel"]) + \
            np.asarray(params["params"]["head"]["bias"])
        manual = np.exp(manual - manual.max())
        manual /= manual.sum()
        np.testing.assert_allclose(np.asarray(out)[0], manual, rtol=1e-4,
                                   atol=1e-5)


class TestDenseBranchParity:
    """Every layer's small-N dense branch equals its per-edge segment path
    (toggled via DENSE_SPMM_MAX_N) — the Gs-phase fast path is pinned to
    the reference-parity path it replaced."""

    def test_all_layers_dense_equals_segment(self, rng):
        import importlib
        import jax
        from fitgnn_tpu.graph import build_graph
        spmm_mod = importlib.import_module("fitgnn_tpu.ops.spmm")
        n, e, f = 60, 240, 12
        s = rng.integers(0, n, e)
        r = rng.integers(0, n, e)
        x = rng.normal(size=(n, f)).astype(np.float32)
        g = build_graph(x, s.astype(np.int32), r.astype(np.int32))
        old = spmm_mod.DENSE_SPMM_MAX_N
        try:
            for name, layer in [
                ("GCNConv", GCNConv(features=8)),
                ("GATConv", GATConv(features=8, heads=2)),
                ("SAGEConv", SAGEConv(features=8)),
                ("GINConv", GINConv(features=8)),
            ]:
                params = layer.init(jax.random.PRNGKey(0), g.x, g)
                spmm_mod.DENSE_SPMM_MAX_N = 512
                dense = np.asarray(layer.apply(params, g.x, g))
                spmm_mod.DENSE_SPMM_MAX_N = 0
                seg = np.asarray(layer.apply(params, g.x, g))
                np.testing.assert_allclose(
                    dense, seg, rtol=2e-4, atol=2e-4,
                    err_msg=f"{name} dense/segment mismatch")
        finally:
            spmm_mod.DENSE_SPMM_MAX_N = old
