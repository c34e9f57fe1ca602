"""Distributed FIT-GNN curriculum: the Gc phase sharded over the hier mesh
(num_devices × num_hosts) feeding the subgraph-axis Gs phase through one
shared param pytree — the reference's Gc→Gs transfer (``run.py:345-400``)
as the distributed phase (SURVEY §2.4)."""

import numpy as np
import jax
import pytest

from fitgnn_tpu.data.splits import splits_classification
from fitgnn_tpu.data.synthetic import sbm_graph
from fitgnn_tpu.models import NodeModel
from fitgnn_tpu.partition import coarsen_and_partition
from fitgnn_tpu.train import NodeTaskConfig, run_node_task, steps
from fitgnn_tpu.train.loop import _make_hier_gc_steps


def make_dataset(n=300, classes=4, seed=0):
    x, s, r, y = sbm_graph(num_nodes=n, num_classes=classes, num_features=32,
                           p_in=0.08, p_out=0.004, feature_noise=1.5,
                           seed=seed)
    train, val, test = splits_classification(y, classes, "random", seed=seed)
    return coarsen_and_partition(
        x, s, r, y, reduction=0.5, method="variation_neighborhoods",
        mode="extra_node", task="classification", num_classes=classes,
        train_mask=train, val_mask=val, test_mask=test, seed=seed)


@pytest.mark.parametrize("layer", ["GCNConv", "SAGEConv", "GATConv"])
def test_hier_gc_eval_matches_single_device_h1(layer):
    """H=1: the hier Gc eval (community-ordered, prebuilt-weight shards)
    must equal the single-device coarse eval with the same params — gates
    the per-layer weight construction in _make_hier_gc_steps."""
    ds = make_dataset()
    cfg = NodeTaskConfig(layer_name=layer, hidden=16, num_layers=2,
                         out_dim=4, num_devices=4, num_hosts=1)
    train_fn, val_fn = _make_hier_gc_steps(cfg, ds.coarse)
    g = ds.coarse.graph
    model = NodeModel(layer_name=layer, hidden=16, num_layers=2, out_dim=4)
    state = steps.create_state(model, jax.random.PRNGKey(0), g.x, g)
    vloss, vacc = val_fn(state)
    ref_loss, ref_acc = steps.gc_eval_step(
        state, g, ds.coarse.y_val, ds.coarse.val_mask, "classification")
    np.testing.assert_allclose(float(vloss), float(ref_loss), rtol=1e-4)
    np.testing.assert_allclose(float(vacc), float(ref_acc), rtol=1e-5)


def test_distributed_curriculum_learns():
    """Full distributed curriculum: Gc on the 2×4 hier mesh → Gs on the
    subgraph axis, one checkpoint pytree end to end."""
    ds = make_dataset()
    cfg = NodeTaskConfig(
        layer_name="GCNConv", hidden=32, num_layers=2, out_dim=4,
        exp_setup="Gc_train_2_Gs_train", epochs1=30, epochs2=30, runs=1,
        seed=0, num_devices=8, num_hosts=2)
    res = run_node_task(cfg, ds.coarse, ds.subgraphs)
    acc = res.runs[0].test_acc
    assert np.isfinite(acc)
    assert acc > 0.5, f"distributed curriculum acc={acc} (chance=0.25)"


def test_distributed_curriculum_cluster_interior_learns():
    """VERDICT r4 ask #4 end-to-end: the distributed curriculum with the
    per-shard interior straggler collapse (gc_cluster) learns, and the
    non-dividing K snaps to a valid 128-multiple instead of crashing."""
    ds = make_dataset()
    cfg = NodeTaskConfig(
        layer_name="GCNConv", hidden=32, num_layers=2, out_dim=4,
        exp_setup="Gc_train_2_Gs_train", epochs1=30, epochs2=30, runs=1,
        seed=0, num_devices=8, num_hosts=2, gc_cluster=384)
    res = run_node_task(cfg, ds.coarse, ds.subgraphs)
    acc = res.runs[0].test_acc
    assert np.isfinite(acc)
    assert acc > 0.5, f"cluster-interior curriculum acc={acc} (chance=0.25)"
