"""Graph container / build invariants."""

import numpy as np
import jax.numpy as jnp

from fitgnn_tpu.graph import build_graph, pad_graph


def small_graph(**kw):
    x = np.eye(5, dtype=np.float32)
    senders = np.array([0, 1, 2, 3], dtype=np.int32)
    receivers = np.array([1, 2, 3, 4], dtype=np.int32)
    y = np.array([0, 1, 0, 1, 0])
    return build_graph(x, senders, receivers, y=y, **kw)


class TestBuildGraph:
    def test_shapes_padded(self):
        g = small_graph()
        assert g.num_nodes_padded % 8 == 0
        assert g.num_edges_padded % 128 == 0
        assert int(g.n_node) == 5

    def test_undirected_and_self_loops(self):
        g = small_graph(normalize=False)
        # 4 edges -> 8 undirected + 5 self loops = 13
        assert int(g.n_edge) == 13
        s = np.asarray(g.senders)[: int(g.n_edge)]
        r = np.asarray(g.receivers)[: int(g.n_edge)]
        pairs = set(zip(s.tolist(), r.tolist()))
        assert (1, 0) in pairs and (0, 1) in pairs and (2, 2) in pairs

    def test_receivers_sorted(self):
        g = small_graph()
        r = np.asarray(g.receivers)
        assert np.all(np.diff(r) >= 0)

    def test_padding_edges_zero_weight(self):
        g = small_graph()
        w = np.asarray(g.edge_weight)
        assert np.all(w[int(g.n_edge):] == 0)
        assert np.all(np.asarray(g.senders)[int(g.n_edge):] == g.num_nodes_padded - 1)

    def test_gcn_norm_row_stochastic_on_regular_graph(self):
        # On a k-regular graph with self loops, sym-normalized rows sum to 1.
        n = 6
        senders = np.array([i for i in range(n)], dtype=np.int32)
        receivers = np.array([(i + 1) % n for i in range(n)], dtype=np.int32)
        x = np.ones((n, 2), dtype=np.float32)
        g = build_graph(x, senders, receivers)
        w = np.asarray(g.edge_weight)
        r = np.asarray(g.receivers)
        sums = np.zeros(g.num_nodes_padded)
        np.add.at(sums, r, w)
        np.testing.assert_allclose(sums[:n], 1.0, rtol=1e-5)

    def test_node_edge_masks(self):
        g = small_graph()
        assert int(jnp.sum(g.node_mask)) == 5
        assert int(jnp.sum(g.edge_mask)) == int(g.n_edge)


class TestPadGraph:
    def test_pad_graph_grows_and_preserves(self):
        g = small_graph()
        g2 = pad_graph(g, g.num_nodes_padded + 8, g.num_edges_padded + 128)
        assert int(g2.n_node) == int(g.n_node)
        assert int(g2.n_edge) == int(g.n_edge)
        np.testing.assert_array_equal(
            np.asarray(g2.x)[: g.num_nodes_padded - 1],
            np.asarray(g.x)[:-1])
        # padding edges re-target new last node
        s2 = np.asarray(g2.senders)
        assert np.all(s2[int(g2.n_edge):] == g2.num_nodes_padded - 1)
