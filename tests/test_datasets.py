"""Loader tests against synthesized raw files (no network in this env)."""

import os
import pickle

import numpy as np
import pytest
import scipy.sparse as sp

from fitgnn_tpu.data.datasets import (
    NodeDataset, DatasetNotFoundError, load_node_dataset, load_graph_dataset,
    load_planetoid, load_tu_dataset, load_wikipedia_network,
    save_npz_cache, load_npz_cache,
)


def write_planetoid(root, name="cora", n_train=6, n_val=4, n_test=5, f=8,
                    c=3):
    raw = os.path.join(root, name, "raw")
    os.makedirs(raw, exist_ok=True)
    rng = np.random.default_rng(0)
    n_allx = n_train + n_val
    n = n_allx + n_test

    def onehot(k):
        lab = rng.integers(0, c, size=k)
        return np.eye(c)[lab]

    x = sp.csr_matrix(rng.random((n_train, f)).astype(np.float32))
    allx = sp.csr_matrix(rng.random((n_allx, f)).astype(np.float32))
    tx = sp.csr_matrix(rng.random((n_test, f)).astype(np.float32))
    y, ally, ty = onehot(n_train), onehot(n_allx), onehot(n_test)
    graph = {i: [int(j) for j in rng.integers(0, n, 2)] for i in range(n)}
    test_idx = rng.permutation(np.arange(n_allx, n))

    objs = dict(x=x, y=y, tx=tx, ty=ty, allx=allx, ally=ally, graph=graph)
    for key, obj in objs.items():
        with open(os.path.join(raw, f"ind.{name}.{key}"), "wb") as fo:
            pickle.dump(obj, fo)
    with open(os.path.join(raw, f"ind.{name}.test.index"), "w") as fo:
        fo.write("\n".join(str(i) for i in test_idx))
    return n, f, test_idx, np.asarray(tx.todense()), ty


class TestPlanetoid:
    def test_parse_and_permutation(self, tmp_path):
        n, f, test_idx, tx_dense, ty = write_planetoid(str(tmp_path))
        ds = load_planetoid(str(tmp_path), "cora")
        assert ds.x.shape == (n, f)
        assert ds.train_mask.sum() == 6
        # val = the 500 nodes after train, clipped by graph size (the real
        # format's semantics; overlaps test in this tiny fixture)
        assert ds.val_mask.sum() == n - 6
        assert ds.test_mask.sum() == 5
        # test features permuted into true id positions: tx row i is node
        # test_idx[i]
        for i, node in enumerate(test_idx):
            np.testing.assert_allclose(ds.x[node], tx_dense[i], rtol=1e-6)
            assert ds.y[node] == ty[i].argmax()

    def test_missing_raises(self, tmp_path):
        with pytest.raises(DatasetNotFoundError):
            load_planetoid(str(tmp_path), "cora")


class TestTU:
    def test_parse(self, tmp_path):
        raw = tmp_path / "PROTEINS" / "raw"
        raw.mkdir(parents=True)
        # 2 graphs: triangle (nodes 1-3) and edge (nodes 4-5), 1-based
        (raw / "PROTEINS_A.txt").write_text(
            "1, 2\n2, 1\n2, 3\n3, 2\n1, 3\n3, 1\n4, 5\n5, 4\n")
        (raw / "PROTEINS_graph_indicator.txt").write_text(
            "1\n1\n1\n2\n2\n")
        (raw / "PROTEINS_graph_labels.txt").write_text("1\n2\n")
        (raw / "PROTEINS_node_labels.txt").write_text("0\n1\n0\n1\n0\n")
        ds = load_tu_dataset(str(tmp_path), "PROTEINS")
        assert len(ds.graphs) == 2
        np.testing.assert_array_equal(ds.y, [0, 1])
        x0, s0, r0 = ds.graphs[0]
        assert x0.shape == (3, 2)      # one-hot of 2 node labels
        assert len(s0) == 6
        x1, s1, r1 = ds.graphs[1]
        assert x1.shape == (2, 2)
        np.testing.assert_array_equal(np.sort(s1), [0, 1])


class TestWikipedia:
    def test_parse(self, tmp_path):
        raw = tmp_path / "chameleon" / "raw"
        raw.mkdir(parents=True)
        (raw / "out1_node_feature_label.txt").write_text(
            "node_id\tfeature\tlabel\n"
            "0\t1.0,2.0\t10\n1\t0.5,0.1\t100\n2\t0.0,1.0\t1\n")
        (raw / "out1_graph_edges.txt").write_text(
            "id1\tid2\n0\t1\n1\t2\n")
        ds = load_wikipedia_network(str(tmp_path), "chameleon")
        assert ds.x.shape == (3, 2)
        np.testing.assert_allclose(ds.y, np.log1p([10, 100, 1]), rtol=1e-6)
        assert len(ds.senders) == 2


class TestGraphSaint:
    def test_parse(self, tmp_path):
        import json
        import scipy.sparse as sp
        raw = tmp_path / "flickr" / "raw"
        raw.mkdir(parents=True)
        adj = sp.csr_matrix(np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]],
                                     dtype=np.float64))
        sp.save_npz(str(raw / "adj_full.npz"), adj)
        np.save(str(raw / "feats.npy"),
                np.ones((3, 4), dtype=np.float32))
        (raw / "class_map.json").write_text(
            json.dumps({"0": 1, "1": 0, "2": 1}))
        (raw / "role.json").write_text(
            json.dumps({"tr": [0], "va": [1], "te": [2]}))
        from fitgnn_tpu.data.datasets import load_graphsaint
        ds = load_graphsaint(str(tmp_path), "flickr")
        assert ds.x.shape == (3, 4)
        np.testing.assert_array_equal(ds.y, [1, 0, 1])
        assert ds.train_mask.sum() == 1 and ds.test_mask[2]
        assert len(ds.senders) == 4


class TestQM9Sdf:
    def test_parse(self, tmp_path):
        raw = tmp_path / "QM9" / "raw"
        raw.mkdir(parents=True)
        # one water-like molecule: 3 atoms, 2 bonds (V2000 sdf block)
        sdf = (
            "gdb_1\n"
            "     RDKit          3D\n"
            "\n"
            "  3  2  0  0  0  0  0  0  0  0999 V2000\n"
            "    0.0000    0.0000    0.0000 O   0  0\n"
            "    0.7572    0.5865    0.0000 H   0  0\n"
            "   -0.7572    0.5865    0.0000 H   0  0\n"
            "  1  2  1  0\n"
            "  1  3  1  0\n"
            "M  END\n"
            "$$$$\n")
        (raw / "gdb9.sdf").write_text(sdf)
        header = "mol_id," + ",".join(f"p{i}" for i in range(19))
        (raw / "gdb9.sdf.csv").write_text(
            header + "\ngdb_1," + ",".join(["1.5"] * 19) + "\n")
        from fitgnn_tpu.data.datasets import load_qm9_sdf
        ds = load_qm9_sdf(str(tmp_path))
        assert len(ds.graphs) == 1
        x, s, r = ds.graphs[0]
        assert x.shape == (3, 9)
        assert x[0, 3 + 3] == 1.0      # oxygen one-hot
        assert x[1, 3 + 0] == 1.0      # hydrogen one-hot
        assert x[0, 8] == 2.0          # O degree
        np.testing.assert_array_equal(s, [0, 0])
        assert ds.y.shape == (1, 19)


class TestNpzCache:
    def test_roundtrip(self, tmp_path):
        ds = NodeDataset(
            name="toy", x=np.ones((4, 2), dtype=np.float32),
            senders=np.array([0, 1]), receivers=np.array([1, 2]),
            y=np.array([0, 1, 0, 1]),
            train_mask=np.array([True, False, True, False]))
        path = str(tmp_path / "toy.npz")
        save_npz_cache(path, ds)
        back = load_npz_cache(path, "toy")
        np.testing.assert_array_equal(back.x, ds.x)
        np.testing.assert_array_equal(back.train_mask, ds.train_mask)
        assert back.val_mask is None

    def test_load_node_dataset_prefers_cache(self, tmp_path):
        d = tmp_path / "cora"
        d.mkdir()
        ds = NodeDataset(
            name="cora", x=np.zeros((3, 2), dtype=np.float32),
            senders=np.array([0]), receivers=np.array([1]),
            y=np.array([0, 1, 1]))
        save_npz_cache(str(d / "cora.npz"), ds)
        back = load_node_dataset("cora", str(tmp_path))
        assert back.x.shape == (3, 2)


class TestOgbnProteins:
    def test_edge_featured_no_node_feat(self, tmp_path):
        """ogbn-proteins layout: no node-feat.csv.gz — node features are
        synthesized from the mean of incident edge features."""
        import gzip
        raw = tmp_path / "ogbn-proteins" / "raw"
        raw.mkdir(parents=True)

        def gz(name, text):
            with gzip.open(str(raw / name), "wt") as f:
                f.write(text)

        gz("edge.csv.gz", "0,1\n1,2\n")
        gz("edge-feat.csv.gz", "1.0,3.0\n2.0,4.0\n")
        gz("node-label.csv.gz", "1,0\n0,1\n1,1\n")
        from fitgnn_tpu.data.datasets import load_ogbn
        ds = load_ogbn(str(tmp_path), "ogbn-proteins")
        assert ds.x.shape == (3, 2)
        # node 1 touches both edges: mean = ((1,3)+(2,4))/2
        np.testing.assert_allclose(ds.x[1], [1.5, 3.5])
        np.testing.assert_allclose(ds.x[0], [1.0, 3.0])
        assert ds.y.shape == (3, 2)    # multi-task labels stay 2-D

    def test_species_fallback(self, tmp_path):
        import gzip
        raw = tmp_path / "ogbn-proteins" / "raw"
        raw.mkdir(parents=True)
        with gzip.open(str(raw / "edge.csv.gz"), "wt") as f:
            f.write("0,1\n1,2\n")
        with gzip.open(str(raw / "node_species.csv.gz"), "wt") as f:
            f.write("9606\n9606\n3702\n")
        from fitgnn_tpu.data.datasets import load_ogbn
        ds = load_ogbn(str(tmp_path), "ogbn-proteins")
        assert ds.x.shape == (3, 2)    # two species -> one-hot width 2
        assert ds.x[0, 1] == 1.0 and ds.x[2, 0] == 1.0


class TestLobpcgFallback:
    def test_matches_arpack(self):
        import scipy.sparse as sp
        from fitgnn_tpu.coarsen.lapgraph import LapGraph
        from fitgnn_tpu.coarsen.spectral import bottom_k_eigen
        rng = np.random.default_rng(1)
        n = 3000
        r = rng.integers(0, n, n * 5)
        s = np.where(rng.random(n * 5) < 0.8,
                     (r // 50) * 50 + rng.integers(0, 50, n * 5),
                     rng.integers(0, n, n * 5))
        keep = s != r
        W = sp.csr_matrix((np.ones(keep.sum()), (s[keep], r[keep])),
                          shape=(n, n))
        W = W + W.T
        W.data[:] = 1.0
        g = LapGraph(W)
        l_a, _ = bottom_k_eigen(g, 8, method="arpack")
        l_l, _ = bottom_k_eigen(g, 8, method="lobpcg")
        np.testing.assert_allclose(l_l, l_a, rtol=1e-3, atol=1e-4)


class TestRandomRing:
    def test_synthetic_ring_dataset(self):
        from fitgnn_tpu.data.datasets import load_node_dataset
        ds = load_node_dataset("random_500")
        assert ds.x.shape == (500, 1)
        assert len(ds.senders) == 4 * 500   # 1- and 2-hop ring, both dirs
        # every node touches exactly 4 ring edges as sender
        assert np.bincount(ds.senders, minlength=500).max() == 4
