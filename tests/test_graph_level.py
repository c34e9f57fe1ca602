"""Graph-level pipeline + training tests (classification & regression)."""

import numpy as np
import pytest

from fitgnn_tpu.data.synthetic import random_graph_dataset
from fitgnn_tpu.data.splits import splits_graph_level
from fitgnn_tpu.data.graph_level import (
    prepare_graph_sample, collate_graph_level,
)
from fitgnn_tpu.train.graph_loop import (
    GraphTaskConfig, run_graph_task, GRAPH_EXP_SETUPS,
)


def build_batches(mode="plain", num_graphs=40, seed=0, regression=False):
    graphs, labels = random_graph_dataset(num_graphs=num_graphs, seed=seed)
    if regression:
        # target = edge density (learnable from structure)
        labels = np.array([len(s) / max(x.shape[0], 1)
                           for (x, s, r) in graphs], dtype=np.float32)
    samples = [prepare_graph_sample(x, s, r, y_, reduction=0.5, mode=mode)
               for (x, s, r), y_ in zip(graphs, labels)]
    tr, va, te = splits_graph_level(num_graphs, seed=seed)
    return (collate_graph_level([samples[i] for i in tr]),
            collate_graph_level([samples[i] for i in va]),
            collate_graph_level([samples[i] for i in te]))


class TestCollate:
    def test_shapes_and_ids(self):
        train_b, _, _ = build_batches()
        assert train_b.num_graphs == 20
        gids = np.asarray(train_b.gc_graph_ids)
        n_real = int(train_b.gc.n_node)
        assert gids[:n_real].max() == train_b.num_graphs - 1
        # every sample owns at least one coarse node
        assert len(np.unique(gids[:n_real])) == train_b.num_graphs
        # subgraph graph ids within range
        sgids = np.asarray(train_b.gs_graph_ids)
        assert sgids.max() < train_b.num_graphs


@pytest.mark.parametrize("exp_setup", GRAPH_EXP_SETUPS)
def test_graph_classification_beats_chance(exp_setup):
    train_b, val_b, test_b = build_batches(
        mode="extra_node" if "Gs" in exp_setup else "plain")
    cfg = GraphTaskConfig(hidden=32, num_layers=2, out_dim=2, classify=True,
                          exp_setup=exp_setup, epochs1=40, epochs2=40, seed=0)
    res = run_graph_task(cfg, train_b, val_b, test_b)
    assert res.best_test_acc > 0.6, (exp_setup, res)


def test_graph_regression_runs():
    train_b, val_b, test_b = build_batches(regression=True)
    cfg = GraphTaskConfig(hidden=32, num_layers=2, out_dim=1, classify=False,
                          exp_setup="Gc_train_2_Gc_infer", epochs1=40, seed=0)
    res = run_graph_task(cfg, train_b, val_b, test_b)
    assert np.isfinite(res.best_test_loss)
    # normalized L1 below predict-mean baseline
    assert res.best_test_acc < 1.2


def test_multi_prop_selector():
    graphs, _ = random_graph_dataset(num_graphs=24, seed=1)
    targets = np.stack([
        np.array([x.shape[0], len(s)], dtype=np.float32)
        for (x, s, r) in graphs])
    samples = [prepare_graph_sample(x, s, r, t, reduction=0.5)
               for (x, s, r), t in zip(graphs, targets)]
    tr, va, te = splits_graph_level(24, seed=1)
    bt = collate_graph_level([samples[i] for i in tr])
    bv = collate_graph_level([samples[i] for i in va])
    be = collate_graph_level([samples[i] for i in te])
    cfg = GraphTaskConfig(hidden=16, num_layers=1, out_dim=1, classify=False,
                          exp_setup="Gc_train_2_Gc_infer", epochs1=10,
                          prop=0, seed=0)
    res = run_graph_task(cfg, bt, bv, be)
    assert np.isfinite(res.best_test_loss)
