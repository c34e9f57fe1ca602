"""CLI + tools integration tests (run against an npz-cached toy dataset)."""

import json
import os

import numpy as np
import pytest

from fitgnn_tpu.data.datasets import NodeDataset, save_npz_cache
from fitgnn_tpu.data.synthetic import sbm_graph
from fitgnn_tpu.cli.main import main, build_parser, arg_correction


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


def run_cli(tmp_path, toy_root, *argv):
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        return main(list(argv) + ["--data_root", str(toy_root)])
    finally:
        os.chdir(cwd)


@pytest.fixture
def toy_graph_root(tmp_path):
    from fitgnn_tpu.data.synthetic import random_graph_dataset
    graphs, y = random_graph_dataset(num_graphs=24, seed=0)
    d = tmp_path / "toyg"
    d.mkdir()
    arr = np.empty(len(graphs), dtype=object)
    for i, g in enumerate(graphs):
        arr[i] = g
    np.savez(str(d / "toyg_graphs.npz"), graphs=arr, y=y,
             allow_pickle=True)
    return tmp_path


class TestGraphCommands:
    def test_train_graph_cls(self, tmp_path, toy_graph_root):
        rc = run_cli(tmp_path, toy_graph_root, "train", "--dataset", "toyg",
                     "--task", "graph_cls", "--hidden", "8",
                     "--epochs1", "2", "--epochs2", "2",
                     "--exp_setup", "Gc_train_2_Gc_infer", "--train_fitgnn")
        assert rc == 0
        content = (tmp_path / "results" / "toyg.csv").read_text()
        assert "Gc_train_2_Gc_infer" in content

    def test_infer_graph(self, tmp_path, toy_graph_root):
        rc = run_cli(tmp_path, toy_graph_root, "infer", "--dataset", "toyg",
                     "--task", "graph_cls", "--hidden", "8",
                     "--num_test_samples", "4")
        assert rc == 0
        content = (tmp_path / "inference_results" / "graph_cls.csv"
                   ).read_text()
        assert "fitgnn_gs" in content and "fitgnn_gc" in content


class TestArgCorrection:
    def test_cluster_extra_mutual_exclusion(self):
        args = build_parser().parse_args(
            ["train", "--extra_node", "--cluster_node"])
        args = arg_correction(args)
        assert args.extra_node and not args.cluster_node

    def test_fixed_remap(self):
        args = build_parser().parse_args(
            ["train", "--dataset", "physics", "--experiment", "fixed"])
        args = arg_correction(args)
        assert args.experiment == "random"


class TestCommands:
    def test_stats(self, tmp_path, toy_root, capsys):
        assert run_cli(tmp_path, toy_root, "stats", "--dataset", "toy") == 0
        assert (tmp_path / "dataset_info.csv").exists()
        content = (tmp_path / "dataset_info.csv").read_text()
        assert content.startswith("dataset,num_nodes")
        assert "toy,200," in content

    def test_memory(self, tmp_path, toy_root):
        assert run_cli(tmp_path, toy_root, "memory", "--dataset", "toy",
                       "--extra_node") == 0
        content = (tmp_path / "memory_usage.csv").read_text()
        assert "full_graph" in content and "max_subgraph" in content

    def test_train_small(self, tmp_path, toy_root):
        rc = run_cli(tmp_path, toy_root, "train", "--dataset", "toy",
                     "--experiment", "random", "--runs", "1",
                     "--hidden", "16", "--epochs1", "3", "--epochs2", "3",
                     "--exp_setup", "Gs_train_2_Gs_infer", "--train_fitgnn")
        assert rc == 0
        content = (tmp_path / "results" / "toy.csv").read_text()
        assert content.startswith("dataset,coarsening_method")
        assert "toy,variation_neighborhoods" in content

    def test_train_baseline(self, tmp_path, toy_root):
        rc = run_cli(tmp_path, toy_root, "train", "--dataset", "toy",
                     "--experiment", "random", "--runs", "1",
                     "--hidden", "16", "--epochs1", "5", "--baseline")
        assert rc == 0
        content = (tmp_path / "results" / "baseline" / "toy.csv").read_text()
        assert "baseline" in content

    def test_train_baseline_cluster_aggregation(self, tmp_path, toy_root,
                                                capsys):
        rc = run_cli(tmp_path, toy_root, "train", "--dataset", "toy",
                     "--experiment", "random", "--runs", "1",
                     "--hidden", "16", "--epochs1", "5", "--baseline",
                     # the 256-padded toy is 4 tiles — force stragglers so
                     # the collapse has something to absorb
                     "--hybrid_threshold", "100000",
                     "--cluster_aggregation", "128")
        assert rc == 0
        out = capsys.readouterr().out
        assert "cluster-aggregation entries" in out
        content = (tmp_path / "results" / "baseline" / "toy.csv").read_text()
        assert "baseline" in content

    def test_cluster_exact_requires_mode(self, tmp_path, toy_root):
        with pytest.raises(SystemExit, match="requires"):
            run_cli(tmp_path, toy_root, "train", "--dataset", "toy",
                    "--experiment", "random", "--runs", "1", "--baseline",
                    "--hidden", "16", "--epochs1", "2",
                    "--cluster_aggregation_exact", "16")

    def test_cluster_agg_rejected_without_gc_phase(self, tmp_path,
                                                   toy_root):
        # Gs_train_2_Gs_infer has no full-graph Gc phase — the flag must
        # error, not silently train exact per-edge
        with pytest.raises(SystemExit, match="no.*coarse|phase"):
            run_cli(tmp_path, toy_root, "train", "--dataset", "toy",
                    "--experiment", "random", "--runs", "1",
                    "--hidden", "16", "--epochs1", "2", "--epochs2", "2",
                    "--exp_setup", "Gs_train_2_Gs_infer", "--train_fitgnn",
                    "--cluster_aggregation", "128")

    def test_cluster_aggregation_rejects_gat(self, tmp_path, toy_root):
        with pytest.raises(SystemExit, match="cluster_attention"):
            run_cli(tmp_path, toy_root, "train", "--dataset", "toy",
                    "--experiment", "random", "--runs", "1",
                    "--layer_name", "GATConv",
                    "--hidden", "16", "--epochs1", "2", "--baseline",
                    "--cluster_aggregation", "128")

    def test_infer(self, tmp_path, toy_root):
        rc = run_cli(tmp_path, toy_root, "infer", "--dataset", "toy",
                     "--hidden", "16", "--num_test_samples", "5",
                     "--experiment", "random")
        assert rc == 0
        content = (tmp_path / "inference_results" / "node_cls.csv").read_text()
        assert "avg_inf_time" in content

    def test_infer_baseline(self, tmp_path, toy_root):
        rc = run_cli(tmp_path, toy_root, "infer-baseline", "--dataset", "toy",
                     "--hidden", "16", "--num_test_samples", "5",
                     "--experiment", "random")
        assert rc == 0

    def test_save_graphs_cache_roundtrip(self, tmp_path, toy_root, capsys):
        rc = run_cli(tmp_path, toy_root, "save-graphs", "--dataset", "toy")
        assert rc == 0
        assert "partition artifacts cached" in capsys.readouterr().out
        # second invocation hits the content-hashed cache (stderr notice)
        rc = run_cli(tmp_path, toy_root, "save-graphs", "--dataset", "toy")
        captured = capsys.readouterr()
        assert "loaded from cache" in captured.err
