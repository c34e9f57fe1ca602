"""Distributed regression + distributed MB gradient mode.

The reference trains node_reg through the same runners as node_cls
(``run.py:508``, ``network.py:37``) and MB is its second gradient regime
(``node_train_Gs_MB``, ``run.py:217``); both must therefore ride the
distributed paths too (VERDICT r3 asks #4 and #10):

* Gs-axis regression eval == the single-device multi-bucket eval (the
  std-normalized L1 metric needs GLOBAL target moments — this gates the
  psum'd moment plumbing in ``task_metric_sums``).
* The distributed MB epoch with one chunk == the distributed GD step
  (identical loss AND identical post-step params).
* The hier Gc eval at H=1 on regression == the single-device coarse eval.
* The full distributed curriculum and the distributed MB mode learn.
"""

import numpy as np
import jax
import pytest

from fitgnn_tpu.data.splits import splits_classification, splits_regression
from fitgnn_tpu.data.synthetic import random_regression_graph, sbm_graph
from fitgnn_tpu.models import NodeModel
from fitgnn_tpu.parallel import make_mesh
from fitgnn_tpu.parallel.dist_subgraphs import (
    make_dist_gs_eval_step_multi, make_dist_gs_train_epoch_mb,
    make_dist_gs_train_step_multi, pad_batch_to_shards,
)
from fitgnn_tpu.partition import coarsen_and_partition
from fitgnn_tpu.train import NodeTaskConfig, run_node_task, steps
from fitgnn_tpu.train.loop import _make_hier_gc_steps


def make_reg_dataset(n=240, f=16, seed=0):
    x, s, r, y = random_regression_graph(num_nodes=n, num_features=f,
                                         seed=seed)
    train, val, test = splits_regression(n, 0.3, 0.2, seed=seed)
    return coarsen_and_partition(
        x, s, r, y, reduction=0.5, method="variation_neighborhoods",
        mode="extra_node", task="regression",
        train_mask=train, val_mask=val, test_mask=test, seed=seed)


def make_cls_dataset(n=300, classes=4, seed=0):
    x, s, r, y = sbm_graph(num_nodes=n, num_classes=classes, num_features=32,
                           p_in=0.08, p_out=0.004, feature_noise=1.5,
                           seed=seed)
    train, val, test = splits_classification(y, classes, "random", seed=seed)
    return coarsen_and_partition(
        x, s, r, y, reduction=0.5, method="variation_neighborhoods",
        mode="extra_node", task="classification", num_classes=classes,
        train_mask=train, val_mask=val, test_mask=test, seed=seed)


def _reg_state(ds, seed=0, dropout=0.5):
    model = NodeModel(layer_name="GCNConv", hidden=16, num_layers=2,
                      out_dim=1, classify=False, dropout_rate=dropout)
    g0 = ds.subgraphs.subgraph(0)
    return steps.create_state(model, jax.random.PRNGKey(seed), g0.x, g0)


class TestDistRegressionEval:
    def test_eval_matches_single_device(self):
        """Sharded regression eval: loss AND the std-normalized L1 metric
        (global target moments) match the single-device multi-bucket path."""
        ds = make_reg_dataset()
        state = _reg_state(ds)
        mesh = make_mesh(8)
        batch = pad_batch_to_shards(ds.subgraphs, 8)
        eval_step = make_dist_gs_eval_step_multi(mesh, (batch,), "regression",
                                                 split="test")
        with mesh:
            dl, dm = eval_step(state, (batch,))
        sl, sm = steps.gs_eval_step_multi(state, (batch,), "regression",
                                          split="test")
        np.testing.assert_allclose(float(dl), float(sl), rtol=1e-5)
        np.testing.assert_allclose(float(dm), float(sm), rtol=1e-5)

    def test_regression_training_learns(self):
        ds = make_reg_dataset()
        state = _reg_state(ds)
        mesh = make_mesh(8)
        batch = pad_batch_to_shards(ds.subgraphs, 8)
        train_step = make_dist_gs_train_step_multi(mesh, (batch,),
                                                   "regression")
        eval_step = make_dist_gs_eval_step_multi(mesh, (batch,), "regression",
                                                 split="test")
        with mesh:
            losses = []
            for i in range(40):
                state, loss = train_step(state, (batch,),
                                         jax.random.PRNGKey(100 + i))
                losses.append(float(loss))
            _, metric = eval_step(state, (batch,))
        assert losses[-1] < losses[0]
        # normalized L1 < 1.0 beats the predict-the-mean baseline
        assert float(metric) < 1.0, float(metric)


class TestDistMB:
    @pytest.mark.parametrize("task,make_ds", [
        ("classification", make_cls_dataset),
        ("regression", make_reg_dataset),
    ])
    def test_single_chunk_matches_gd(self, task, make_ds):
        """batch_size ≥ padded subgraph count ⇒ ONE chunk ⇒ the MB epoch is
        the GD step: same loss, same post-step params (dropout off so the
        rng folding schemes can't differ)."""
        ds = make_ds()
        classify = task == "classification"
        model = NodeModel(layer_name="GCNConv", hidden=16, num_layers=2,
                          out_dim=4 if classify else 1, classify=classify,
                          dropout_rate=0.0)
        g0 = ds.subgraphs.subgraph(0)
        state = steps.create_state(model, jax.random.PRNGKey(0), g0.x, g0)
        mesh = make_mesh(8)
        batch = pad_batch_to_shards(ds.subgraphs, 8)
        gd = make_dist_gs_train_step_multi(mesh, (batch,), task)
        mb = make_dist_gs_train_epoch_mb(mesh, (batch,), task,
                                         batch_size=batch.num_subgraphs)
        rng = jax.random.PRNGKey(7)
        with mesh:
            st_gd, loss_gd = gd(state, (batch,), rng)
            st_mb, loss_mb = mb(state, (batch,), rng)
        np.testing.assert_allclose(float(loss_mb), float(loss_gd), rtol=1e-5)
        flat_gd = jax.tree_util.tree_leaves(st_gd.params)
        flat_mb = jax.tree_util.tree_leaves(st_mb.params)
        for a, b in zip(flat_gd, flat_mb):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-6)

    def test_multi_chunk_learns(self):
        """batch_size < subgraph count ⇒ several psum'd optimizer steps per
        epoch; the model still learns."""
        ds = make_cls_dataset()
        model = NodeModel(layer_name="GCNConv", hidden=32, num_layers=2,
                          out_dim=4)
        g0 = ds.subgraphs.subgraph(0)
        state = steps.create_state(model, jax.random.PRNGKey(0), g0.x, g0)
        mesh = make_mesh(8)
        batch = pad_batch_to_shards(ds.subgraphs, 8)
        assert batch.num_subgraphs > 16  # several chunks at batch_size=16
        mb = make_dist_gs_train_epoch_mb(mesh, (batch,), "classification",
                                         batch_size=16)
        eval_step = make_dist_gs_eval_step_multi(mesh, (batch,),
                                                 "classification",
                                                 split="test")
        with mesh:
            for i in range(30):
                state, loss = mb(state, (batch,), jax.random.PRNGKey(i))
            _, acc = eval_step(state, (batch,))
        assert float(acc) > 0.5, float(acc)

    def test_mb_through_run_node_task(self):
        """cfg.gradient_method='MB' with num_devices>1 no longer refuses
        (VERDICT r3 #10) and reaches the GD-distributed accuracy class."""
        ds = make_cls_dataset()
        cfg = NodeTaskConfig(
            layer_name="GCNConv", hidden=32, num_layers=2, out_dim=4,
            exp_setup="Gs_train_2_Gs_infer", epochs2=30, runs=1, seed=0,
            gradient_method="MB", batch_size=16, num_devices=8)
        res = run_node_task(cfg, ds.coarse, ds.subgraphs)
        assert res.runs[0].test_acc > 0.5, res.runs[0].test_acc


class TestHierRegression:
    def test_hier_gc_eval_matches_single_device_h1(self):
        """H=1 hier Gc eval on node_reg == single-device coarse eval — gates
        the classify=False head + psum'd std-normalized metric."""
        ds = make_reg_dataset()
        cfg = NodeTaskConfig(layer_name="GCNConv", hidden=16, num_layers=2,
                             task="regression", out_dim=1,
                             num_devices=4, num_hosts=1)
        train_fn, val_fn = _make_hier_gc_steps(cfg, ds.coarse)
        g = ds.coarse.graph
        model = NodeModel(layer_name="GCNConv", hidden=16, num_layers=2,
                          out_dim=1, classify=False)
        state = steps.create_state(model, jax.random.PRNGKey(0), g.x, g)
        vloss, vmetric = val_fn(state)
        ref_loss, ref_metric = steps.gc_eval_step(
            state, g, ds.coarse.y_val, ds.coarse.val_mask, "regression")
        np.testing.assert_allclose(float(vloss), float(ref_loss), rtol=1e-4)
        np.testing.assert_allclose(float(vmetric), float(ref_metric),
                                   rtol=1e-4)

    def test_distributed_curriculum_regression_learns(self):
        """Full distributed node_reg curriculum (hier Gc → Gs axis) beats
        the predict-the-mean baseline (normalized L1 < 1)."""
        ds = make_reg_dataset()
        cfg = NodeTaskConfig(
            layer_name="GCNConv", hidden=32, num_layers=2,
            task="regression", out_dim=1,
            exp_setup="Gc_train_2_Gs_train", epochs1=30, epochs2=30,
            runs=1, seed=0, num_devices=8, num_hosts=2)
        res = run_node_task(cfg, ds.coarse, ds.subgraphs)
        loss = res.runs[0].test_loss
        assert np.isfinite(loss)
        assert loss < 1.0, f"distributed node_reg normalized L1={loss}"
