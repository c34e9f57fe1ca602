"""Partition invariants: exact cover, halo semantics, cluster summaries."""

import numpy as np
import scipy.sparse as sp
import pytest

from fitgnn_tpu.partition import (
    extract_subgraphs, pad_subgraphs, coarsen_and_partition,
)
from fitgnn_tpu.data.synthetic import sbm_graph
from fitgnn_tpu.data.splits import splits_classification


def path_W(n=8):
    W = sp.csr_matrix((np.ones(n - 1), (np.arange(n - 1), np.arange(1, n))),
                      shape=(n, n))
    return W + W.T


class TestExtractSubgraphs:
    def setup_method(self):
        self.W = path_W(8)
        self.x = np.arange(8, dtype=np.float32).reshape(8, 1)
        # two metanodes: {0..3}, {4..7}
        self.parent = np.array([0, 0, 0, 0, 1, 1, 1, 1])

    def test_plain_exact_cover(self):
        specs = extract_subgraphs(self.W, self.x, self.parent, mode="plain")
        assert len(specs) == 2
        all_nodes = np.sort(np.concatenate([s.orig_idx for s in specs]))
        np.testing.assert_array_equal(all_nodes, np.arange(8))
        assert all(s.consume.all() for s in specs)
        # induced edges of {0..3}: path 0-1-2-3 => 6 directed
        assert len(specs[0].senders) == 6

    def test_extra_node_halo(self):
        specs = extract_subgraphs(self.W, self.x, self.parent,
                                  mode="extra_node")
        s0 = specs[0]
        # metanode 0 = {0,1,2,3}, halo = {4}
        np.testing.assert_array_equal(np.sort(s0.orig_idx), [0, 1, 2, 3, 4])
        # consume marks exactly the members, independent of sort position
        consumed = s0.orig_idx[s0.consume]
        np.testing.assert_array_equal(np.sort(consumed), [0, 1, 2, 3])
        # edge 3-4 now included
        pairs = set(zip(s0.senders.tolist(), s0.receivers.tolist()))
        i3 = int(np.where(s0.orig_idx == 3)[0][0])
        i4 = int(np.where(s0.orig_idx == 4)[0][0])
        assert (i3, i4) in pairs and (i4, i3) in pairs

    def test_cluster_node_summary(self):
        coarse_x = np.array([[10.0], [20.0]], dtype=np.float32)
        coarse_W = sp.csr_matrix(np.array([[0.0, 1.0], [1.0, 0.0]]))
        specs = extract_subgraphs(self.W, self.x, self.parent,
                                  mode="cluster_node",
                                  coarse_x=coarse_x, coarse_W=coarse_W)
        s0 = specs[0]
        # 4 members + 1 summary (cluster 1)
        assert s0.num_nodes == 5
        assert s0.orig_idx[-1] == -1 and not s0.consume[-1]
        np.testing.assert_allclose(s0.x[-1], [20.0])  # summary feature = Xc row
        # boundary node 3 connects to the summary slot (index 4)
        pairs = set(zip(s0.senders.tolist(), s0.receivers.tolist()))
        assert (3, 4) in pairs and (4, 3) in pairs

    def test_cluster_inter_summary_edges(self):
        # 3 metanodes in a path of 12: middle subgraph sees 2 clusters that
        # are adjacent in the coarse graph -> summary-summary edge
        W = path_W(12)
        x = np.zeros((12, 1), dtype=np.float32)
        parent = np.repeat([0, 1, 2], 4)
        coarse_x = np.zeros((3, 1), dtype=np.float32)
        coarse_W = sp.csr_matrix(
            np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0]], dtype=float))
        specs = extract_subgraphs(W, x, parent, mode="cluster_node",
                                  coarse_x=coarse_x, coarse_W=coarse_W)
        s1 = specs[1]
        assert s1.num_nodes == 6  # 4 members + 2 summaries
        pairs = set(zip(s1.senders.tolist(), s1.receivers.tolist()))
        assert (4, 5) in pairs and (5, 4) in pairs


class TestPadSubgraphs:
    def test_masks_gathered_and_halo_forced_false(self):
        W = path_W(8)
        x = np.eye(8, dtype=np.float32)
        parent = np.array([0, 0, 0, 0, 1, 1, 1, 1])
        y = np.arange(8) % 3
        train = np.zeros(8, dtype=bool)
        train[[3, 4]] = True
        specs = extract_subgraphs(W, x, parent, mode="extra_node")
        batch = pad_subgraphs(specs, y=y, train_mask=train)
        tm = np.asarray(batch.train_mask)
        orig = np.asarray(batch.orig_idx)
        # node 4 is halo in subgraph 0 -> False there; member in 1 -> True
        loc4_in_0 = np.where(orig[0] == 4)[0][0]
        loc4_in_1 = np.where(orig[1] == 4)[0][0]
        assert not tm[0, loc4_in_0]
        assert tm[1, loc4_in_1]
        # node 3 member of subgraph 0 -> True
        loc3 = np.where(orig[0] == 3)[0][0]
        assert tm[0, loc3]
        # y gathered through orig_idx
        ys = np.asarray(batch.y)
        assert ys[1, loc4_in_1] == y[4]

    def test_padding_shapes_uniform(self):
        W = path_W(8)
        x = np.eye(8, dtype=np.float32)
        parent = np.array([0, 0, 0, 1, 1, 1, 1, 1])
        specs = extract_subgraphs(W, x, parent, mode="plain")
        batch = pad_subgraphs(specs)
        assert batch.x.shape[0] == 2
        assert batch.x.shape[1] % 8 == 0
        w = np.asarray(batch.edge_weight)
        for k in range(2):
            ne = int(batch.n_edge[k])
            assert np.all(w[k, ne:] == 0)


class TestPipeline:
    @pytest.mark.parametrize("mode", ["plain", "extra_node", "cluster_node"])
    def test_end_to_end(self, mode):
        x, s, r, y = sbm_graph(num_nodes=200, num_classes=3, num_features=16,
                               p_in=0.06, p_out=0.005, seed=1)
        train, val, test = splits_classification(y, 3, "random", seed=0)
        ds = coarsen_and_partition(
            x, s, r, y, reduction=0.5, method="variation_neighborhoods",
            mode=mode, task="classification", num_classes=3,
            train_mask=train, val_mask=val, test_mask=test)
        # exact cover of all real nodes
        assert ds.parent.min() >= 0
        orig = np.asarray(ds.subgraphs.orig_idx)
        consume = np.asarray(ds.subgraphs.consume_mask)
        owned = orig[consume & (orig >= 0)]
        np.testing.assert_array_equal(np.sort(owned), np.arange(200))
        # coarse graph exists and is smaller
        assert ds.coarse is not None
        assert int(ds.coarse.graph.n_node) < 200
        assert int(ds.coarse.graph.n_node) == ds.num_metanodes
        # coarse train mask non-empty
        assert int(np.asarray(ds.coarse.train_mask).sum()) > 0

    def test_regression_task(self):
        from fitgnn_tpu.data.synthetic import random_regression_graph
        from fitgnn_tpu.data.splits import splits_regression
        x, s, r, y = random_regression_graph(num_nodes=150)
        train, val, test = splits_regression(150, 0.3, 0.2, seed=0)
        ds = coarsen_and_partition(
            x, s, r, y, reduction=0.5, method="heavy_edge", mode="extra_node",
            task="regression", train_mask=train, val_mask=val, test_mask=test)
        assert ds.coarse is not None
        assert np.asarray(ds.coarse.y_train).ndim == 1
