"""Round-2 features: train→infer checkpoint handshake, unrestricted node_reg
setups, graph-level minibatching, intermediate-inference CSV, and
CLI-reachable distributed training (``--num_devices``)."""

import os

import numpy as np
import pytest

from fitgnn_tpu.cli.main import checkpoint_path, main
from fitgnn_tpu.data.datasets import NodeDataset, save_npz_cache
from fitgnn_tpu.data.synthetic import sbm_graph


@pytest.fixture
def toy_root(tmp_path):
    x, s, r, y = sbm_graph(num_nodes=200, num_classes=3, num_features=16,
                           p_in=0.08, p_out=0.01, seed=0)
    train = np.zeros(200, dtype=bool)
    val = np.zeros(200, dtype=bool)
    test = np.zeros(200, dtype=bool)
    train[:60], val[60:100], test[100:] = True, True, True
    d = tmp_path / "toy"
    d.mkdir()
    save_npz_cache(str(d / "toy.npz"), NodeDataset(
        name="toy", x=x, senders=s, receivers=r, y=y,
        train_mask=train, val_mask=val, test_mask=test))
    return tmp_path


@pytest.fixture
def toy_graph_root(tmp_path):
    from fitgnn_tpu.data.synthetic import random_graph_dataset
    graphs, y = random_graph_dataset(num_graphs=24, seed=0)
    d = tmp_path / "toyg"
    d.mkdir()
    arr = np.empty(len(graphs), dtype=object)
    for i, g in enumerate(graphs):
        arr[i] = g
    np.savez(str(d / "toyg_graphs.npz"), graphs=arr, y=y, allow_pickle=True)
    return tmp_path


def run_cli(tmp_path, toy_root, *argv):
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        return main(list(argv) + ["--data_root", str(toy_root)])
    finally:
        os.chdir(cwd)


class TestCheckpointHandshake:
    def test_train_then_infer_uses_checkpoint(self, tmp_path, toy_root,
                                              capsys):
        rc = run_cli(tmp_path, toy_root, "train", "--dataset", "toy",
                     "--experiment", "random", "--runs", "1",
                     "--hidden", "16", "--epochs1", "3", "--epochs2", "3",
                     "--exp_setup", "Gs_train_2_Gs_infer", "--train_fitgnn")
        assert rc == 0
        out = capsys.readouterr().out
        assert "checkpoint saved:" in out
        assert (tmp_path / checkpoint_path("node_cls", "out")).exists()

        rc = run_cli(tmp_path, toy_root, "infer", "--dataset", "toy",
                     "--hidden", "16", "--num_test_samples", "5",
                     "--experiment", "random")
        assert rc == 0
        captured = capsys.readouterr()
        assert "using checkpoint from train" in captured.err
        assert "RANDOM params" not in captured.err

    def test_infer_without_checkpoint_warns(self, tmp_path, toy_root,
                                            capsys):
        rc = run_cli(tmp_path, toy_root, "infer", "--dataset", "toy",
                     "--hidden", "16", "--num_test_samples", "5",
                     "--experiment", "random")
        assert rc == 0
        assert "RANDOM params" in capsys.readouterr().err

    def test_baseline_handshake(self, tmp_path, toy_root, capsys):
        rc = run_cli(tmp_path, toy_root, "train", "--dataset", "toy",
                     "--experiment", "random", "--runs", "1",
                     "--hidden", "16", "--epochs1", "3", "--baseline")
        assert rc == 0
        assert (tmp_path / checkpoint_path("node_cls", "out",
                                           baseline=True)).exists()
        rc = run_cli(tmp_path, toy_root, "infer-baseline", "--dataset",
                     "toy", "--hidden", "16", "--num_test_samples", "3",
                     "--experiment", "random")
        assert rc == 0
        assert "using checkpoint from train" in capsys.readouterr().err


class TestNodeRegSetups:
    def test_gc_setup_regression(self, tmp_path, toy_root):
        """node_reg runs the Gc curriculum (reference run.py:508 runs every
        setup for node regression — the CLI no longer forces Gs-only)."""
        rc = run_cli(tmp_path, toy_root, "train", "--dataset", "toy",
                     "--task", "node_reg", "--runs", "1", "--hidden", "16",
                     "--epochs1", "2", "--epochs2", "2",
                     "--exp_setup", "Gc_train_2_Gs_train", "--train_fitgnn")
        assert rc == 0
        # node-reg CSV (reference run.py:557 schema — no exp_setup column)
        content = (tmp_path / "results" / "toy.csv").read_text()
        assert "top_10_loss" in content and "toy," in content


class TestIntermediateCsv:
    def test_csv_written(self, tmp_path, toy_root):
        rc = run_cli(tmp_path, toy_root, "train", "--dataset", "toy",
                     "--experiment", "random", "--runs", "1",
                     "--hidden", "16", "--epochs1", "2", "--epochs2", "4",
                     "--exp_setup", "Gs_train_2_Gs_infer", "--train_fitgnn",
                     "--run_intermediate_inference",
                     "--intermediate_inference_freq", "2")
        assert rc == 0
        p = tmp_path / "results" / "toy_intermediate_inference.csv"
        content = p.read_text()
        # reference schema (run.py:383-387)
        assert content.startswith("epoch,test_loss,test_acc,test_time")
        assert len(content.strip().splitlines()) >= 3  # header + epochs 0,2


class TestGraphMinibatching:
    def test_chunks_share_shapes(self):
        import jax
        from fitgnn_tpu.data.graph_level import (collate_graph_level_batches,
                                                 prepare_graph_sample)
        from fitgnn_tpu.data.synthetic import random_graph_dataset
        graphs, y = random_graph_dataset(num_graphs=13, seed=1)
        samples = [prepare_graph_sample(x, s, r, y_)
                   for (x, s, r), y_ in zip(graphs, y)]
        chunks = collate_graph_level_batches(samples, batch_size=4)
        assert len(chunks) == 4  # 13 graphs / 4 per chunk
        shapes = [jax.tree_util.tree_map(lambda a: a.shape, c)
                  for c in chunks]
        assert all(s == shapes[0] for s in shapes[1:])
        # padding samples masked out
        assert int(chunks[-1].graph_mask.sum()) == 1
        total = sum(int(c.graph_mask.sum()) for c in chunks)
        assert total == 13

    def test_chunked_training_runs(self, tmp_path, toy_graph_root):
        rc = run_cli(tmp_path, toy_graph_root, "train", "--dataset", "toyg",
                     "--task", "graph_cls", "--hidden", "8",
                     "--epochs1", "2", "--epochs2", "2", "--batch_size", "4",
                     "--exp_setup", "Gc_train_2_Gs_train", "--train_fitgnn")
        assert rc == 0
        content = (tmp_path / "results" / "toyg.csv").read_text()
        assert "Gc_train_2_Gs_train" in content

    def test_chunked_eval_matches_single_batch(self):
        """Eval aggregation across chunks equals the single-batch eval."""
        import jax
        from fitgnn_tpu.data.graph_level import (
            collate_graph_level, collate_graph_level_batches,
            prepare_graph_sample)
        from fitgnn_tpu.data.synthetic import random_graph_dataset
        from fitgnn_tpu.models.models import GraphModel
        from fitgnn_tpu.train.graph_loop import graph_eval_sums
        from fitgnn_tpu.train.steps import TrainState, adam_l2

        graphs, y = random_graph_dataset(num_graphs=10, seed=2)
        samples = [prepare_graph_sample(x, s, r, y_)
                   for (x, s, r), y_ in zip(graphs, y)]
        single = collate_graph_level(samples)
        chunks = collate_graph_level_batches(samples, batch_size=3)

        model = GraphModel(layer_name="GCNConv", hidden=8, num_layers=2,
                           out_dim=int(y.max()) + 1, classify=True)
        params = model.init(jax.random.PRNGKey(0), single.gc.x, single.gc,
                            single.gc_graph_ids, single.num_graphs)
        state = TrainState.create(apply_fn=model.apply, params=params,
                                  tx=adam_l2(0.01, 0.0))

        ls, ms, c = graph_eval_sums(state, single, True, None, "gc")
        lsc = msc = cc = 0.0
        for ch in chunks:
            l_, m_, c_ = graph_eval_sums(state, ch, True, None, "gc")
            lsc += float(l_)
            msc += float(m_)
            cc += float(c_)
        assert cc == float(c) == 10.0
        assert np.isclose(lsc, float(ls), rtol=1e-5)
        assert msc == float(ms)


class TestDistributedCli:
    def test_num_devices_node_cls(self, tmp_path, toy_root):
        """--num_devices shards the Gs phase over the 8-device CPU mesh,
        including the Gc→Gs curriculum."""
        rc = run_cli(tmp_path, toy_root, "train", "--dataset", "toy",
                     "--experiment", "random", "--runs", "1",
                     "--hidden", "16", "--epochs1", "2", "--epochs2", "2",
                     "--exp_setup", "Gc_train_2_Gs_train", "--train_fitgnn",
                     "--num_devices", "4")
        assert rc == 0
        content = (tmp_path / "results" / "toy.csv").read_text()
        assert "Gc_train_2_Gs_train" in content

    def test_dist_gs_matches_single_device(self):
        """One sharded GD epoch == one single-device GD epoch (same loss)."""
        import jax
        from jax.sharding import Mesh
        from fitgnn_tpu.models.models import NodeModel
        from fitgnn_tpu.parallel.dist_subgraphs import (
            make_dist_gs_train_step_multi, pad_batch_to_shards)
        from fitgnn_tpu.partition import coarsen_and_partition
        from fitgnn_tpu.train import steps

        x, s, r, y = sbm_graph(num_nodes=120, num_classes=3,
                               num_features=8, seed=3)
        train = np.arange(120) % 3 == 0
        part = coarsen_and_partition(
            x, s, r, y, reduction=0.5, num_classes=3,
            train_mask=train, val_mask=~train, test_mask=~train)
        batch = part.subgraphs
        model = NodeModel(layer_name="GCNConv", hidden=8, num_layers=2,
                          out_dim=3, dropout_rate=0.0)
        g0 = batch.subgraph(0)
        state = steps.create_state(model, jax.random.PRNGKey(0), g0.x, g0)
        rng = jax.random.PRNGKey(1)

        ref_state, ref_loss = steps.gs_train_step_gd_multi(
            state, (batch,), rng, "classification")

        mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
        padded = (pad_batch_to_shards(batch, 4),)
        step = make_dist_gs_train_step_multi(mesh, padded, "classification")
        dist_state, dist_loss = step(state, padded, rng)

        assert np.isclose(float(dist_loss), float(ref_loss), rtol=1e-5)
        a = jax.tree_util.tree_leaves(ref_state.params)
        b = jax.tree_util.tree_leaves(dist_state.params)
        for u, v in zip(a, b):
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       rtol=2e-4, atol=2e-6)


class TestHierarchicalCli:
    def test_distributed_baseline_2x4(self, tmp_path, toy_root):
        """Full-graph baseline training sharded over a (host x chip) mesh
        through the hierarchical exchange, end to end from the CLI."""
        rc = run_cli(tmp_path, toy_root, "train", "--dataset", "toy",
                     "--experiment", "random", "--hidden", "16",
                     "--epochs1", "4", "--baseline",
                     "--num_devices", "8", "--num_hosts", "2")
        assert rc == 0
        content = (tmp_path / "results" / "baseline" / "toy.csv").read_text()
        assert "baseline_dist_2x4" in content
        from fitgnn_tpu.cli.main import checkpoint_path
        assert (tmp_path / checkpoint_path("node_cls", "out",
                                           baseline=True)).exists()


class TestEarlyStopping:
    def test_patience_stops_training(self, tmp_path, toy_root, capsys):
        """--early_stopping stops the epoch loop on a val-loss plateau (the
        reference parses the flag but never uses it, main.py:189)."""
        import json
        rc = run_cli(tmp_path, toy_root, "train", "--dataset", "toy",
                     "--experiment", "random", "--runs", "1",
                     "--hidden", "16", "--epochs1", "200", "--epochs2", "0",
                     "--exp_setup", "Gc_train_2_Gs_infer", "--train_fitgnn",
                     "--early_stopping", "3")
        assert rc == 0
        # the scalar log shows how many Gc epochs actually ran
        logs = list((tmp_path / "save" / "node_cls" / "out").rglob(
            "scalars*.jsonl"))
        assert logs, "scalar log expected"
        epochs = sum(1 for line in logs[0].read_text().splitlines()
                     if json.loads(line).get("tag") == "Gc_val_loss")
        assert epochs < 200, f"early stopping never fired ({epochs} epochs)"
