"""Regression tests for the round-2 code-review findings: each test pins a
specific bug class (silently dropped hub edges, stale cache keys, label
misalignment, NaN attention gradients, metric/reduction inconsistencies)."""

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fitgnn_tpu.data.synthetic import sbm_graph, random_regression_graph
from fitgnn_tpu.data.splits import splits_classification, splits_regression
from fitgnn_tpu.partition import coarsen_and_partition


def test_ell_hub_above_max_k_keeps_all_edges():
    """A node whose degree exceeds max_k must keep ALL its edges (the last
    bucket widens) — previously such nodes landed in no bucket and their
    output rows (and gradients) were silently zero."""
    from fitgnn_tpu.ops.ell_spmm import build_ell, ell_spmm

    rng = np.random.default_rng(0)
    n, f = 64, 8
    # hub node 0 receives from 10 senders; max_k=4 forces the overflow path
    s = np.concatenate([rng.integers(1, n, 10), rng.integers(0, n, 30)])
    r = np.concatenate([np.zeros(10, np.int64), rng.integers(1, n, 30)])
    w = rng.random(40).astype(np.float32)
    m = build_ell(s, r, w, n, min_k=2, max_k=4)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))

    dense = np.zeros((n, f), dtype=np.float64)
    np.add.at(dense, r, w[:, None] * np.asarray(x, np.float64)[s])
    out = np.asarray(ell_spmm(m, x))
    np.testing.assert_allclose(out, dense, rtol=1e-5, atol=1e-5)

    # gradient flows through the hub row too (transpose structure)
    g = jax.grad(lambda xx: jnp.sum(ell_spmm(m, xx) ** 2))(x)
    dense_g = 2.0 * np.zeros((n, f))
    np.add.at(dense_g, s, 2.0 * w[:, None] * dense[r])
    np.testing.assert_allclose(np.asarray(g), dense_g, rtol=1e-4, atol=1e-4)


def test_affinity_gs_colinear_vectors_have_unit_affinity(monkeypatch):
    """Colinear smoothed vectors (perfectly correlated nodes) must have
    affinity 1 on every edge regardless of per-node norms — the
    Ruge–Stüben denominator is |xi|^2·|xj|^2, not its square."""
    import fitgnn_tpu.coarsen.proximity as prox
    from fitgnn_tpu.coarsen.lapgraph import LapGraph

    rng = np.random.default_rng(1)
    n = 20
    s = np.arange(n - 1)
    r = np.arange(1, n)
    import scipy.sparse as sp
    W = sp.coo_matrix((np.ones(n - 1), (s, r)), shape=(n, n))
    g = LapGraph(W + W.T)
    v = rng.standard_normal(5).astype(np.float64)
    scales = rng.uniform(0.1, 10.0, size=n)          # wildly varying norms

    monkeypatch.setattr(prox, "smoothed_vectors",
                        lambda *a, **k: scales[:, None] * v[None, :])
    _, p, _ = prox.affinity_gs(g, num_vectors=5)
    np.testing.assert_allclose(p, 1.0, rtol=1e-10)


def test_qm9_skipped_molecule_keeps_target_alignment(tmp_path):
    """A malformed sdf block must skip its TARGET row too, not shift every
    later molecule onto the previous molecule's labels."""
    raw = tmp_path / "QM9" / "raw"
    raw.mkdir(parents=True)
    good = (
        "gdb_{i}\n     RDKit          3D\n\n"
        "  2  1  0  0  0  0  0  0  0  0999 V2000\n"
        "    0.0000    0.0000    0.0000 C   0  0\n"
        "    1.0000    0.0000    0.0000 O   0  0\n"
        "  1  2  1  0\nM  END\n")
    bad = "gdb_bad\n     RDKit          3D\n\n  X  Y broken counts\nM  END\n"
    (raw / "gdb9.sdf").write_text(
        good.format(i=1) + "$$$$\n" + bad + "$$$$\n"
        + good.format(i=3) + "$$$$\n")
    header = "mol_id," + ",".join(f"p{i}" for i in range(19))
    rows = [",".join([str(float(k + 1))] * 19) for k in range(3)]
    (raw / "gdb9.sdf.csv").write_text(
        header + "\n" + "\n".join(f"gdb_{k+1},{rw}"
                                  for k, rw in enumerate(rows)) + "\n")

    from fitgnn_tpu.data.datasets import load_qm9_sdf
    ds = load_qm9_sdf(str(tmp_path))
    assert len(ds.graphs) == 2
    # molecule 2's row (all 3.0) must pair with the SECOND kept graph
    np.testing.assert_allclose(ds.y[0], 1.0)
    np.testing.assert_allclose(ds.y[1], 3.0)


def test_partition_cache_key_sees_val_mask_change(tmp_path):
    """Changing the val/test split at equal train count must MISS the
    partition artifact cache (the masks are baked into the artifact)."""
    from fitgnn_tpu.cli.main import _partition
    from fitgnn_tpu.data.datasets import NodeDataset

    x, s, r, y = sbm_graph(num_nodes=120, num_classes=3, num_features=8,
                           p_in=0.15, p_out=0.01, seed=0)
    ds = NodeDataset(name="synth", x=x, senders=s, receivers=r, y=y)
    args = argparse.Namespace(
        data_root=str(tmp_path), dataset="synth", coarsening_ratio=0.5,
        coarsening_method="variation_neighborhoods", task="node_cls",
        seed=0, extra_node=False, cluster_node=False)

    train = np.zeros(120, bool)
    train[:30] = True
    val_a = np.zeros(120, bool)
    val_a[30:60] = True
    val_b = np.zeros(120, bool)
    val_b[60:90] = True          # same size, different nodes
    test = np.zeros(120, bool)
    test[90:] = True

    _partition(args, ds, train, val_a, test, 3)
    part_b = _partition(args, ds, train, val_b, test, 3)
    # the returned batch's val mask must reflect val_b, not cached val_a
    got_val = np.zeros(120, bool)
    orig = np.asarray(part_b.subgraphs.orig_idx)
    vm = np.asarray(part_b.subgraphs.val_mask)
    cm = np.asarray(part_b.subgraphs.consume_mask)
    sel = vm & cm & (orig >= 0)
    got_val[orig[sel]] = True
    np.testing.assert_array_equal(got_val, val_b)


def test_rowwalk_rejects_non_default_block():
    from fitgnn_tpu.ops.pallas.bsr_spmm import build_bsr

    s = np.array([0, 1], np.int64)
    r = np.array([1, 0], np.int64)
    w = np.ones(2, np.float32)
    with pytest.raises(ValueError, match="rowwalk"):
        build_bsr(s, r, w, 512, block=256, rowwalk=True)


def test_tile_gat_exact_segment_max_grads_finite(monkeypatch):
    """With FITGNN_GAT_GLOBAL_MAX=0, edgeless padding rows inside a covered
    block (m = -1e30) must not NaN the score gradients."""
    import fitgnn_tpu.ops.tile_gat as tg
    from fitgnn_tpu.graph.optimize import build_optimized_graph
    from fitgnn_tpu.models.layers import GATConv

    monkeypatch.setattr(tg, "_GLOBAL_MAX", False)
    # 600 real nodes pad to 640: the last block-row mixes real + edgeless
    x, s, r, y = sbm_graph(num_nodes=600, num_classes=4, num_features=16,
                           p_in=0.1, p_out=0.01, seed=3)
    g_opt, _ = build_optimized_graph(x, s, r, y=y, min_block_edges=8,
                                     layer_name="GATConv", seed=0)
    layer = GATConv(features=16)
    params = layer.init(jax.random.PRNGKey(0), g_opt.x, g_opt)

    grads = jax.grad(
        lambda p: jnp.sum(layer.apply(p, g_opt.x, g_opt) ** 2))(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf))), "NaN/inf in GAT grads"


def _regression_batch():
    x, s, r, y = random_regression_graph(num_nodes=200, num_features=16,
                                         seed=0)
    train, val, test = splits_regression(len(y), 0.5, 0.25, seed=0)
    ds = coarsen_and_partition(
        x, s, r, y, reduction=0.5, method="variation_neighborhoods",
        mode="plain", task="regression", train_mask=train, val_mask=val,
        test_mask=test, seed=0)
    return ds.subgraphs


def test_regression_eval_metric_consistent_across_paths():
    """gs_eval_step and gs_eval_step_multi must agree on BOTH loss (plain
    masked L1) and metric (std-normalized L1) for the same single bucket."""
    from fitgnn_tpu.models import NodeModel
    from fitgnn_tpu.train import steps

    batch = _regression_batch()
    model = NodeModel(layer_name="GCNConv", hidden=16, num_layers=2,
                      out_dim=1, classify=False)
    g0 = batch.subgraph(0)
    state = steps.create_state(model, jax.random.PRNGKey(0), g0.x, g0)

    l1, m1 = steps.gs_eval_step(state, batch, "regression", split="test")
    l2, m2 = steps.gs_eval_step_multi(state, (batch,), "regression",
                                      split="test")
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    np.testing.assert_allclose(float(m1), float(m2), rtol=1e-4)
    assert float(m1) != pytest.approx(float(l1)), \
        "metric must be std-normalized, not the plain L1"


def test_mb_epoch_honors_loss_reduction():
    from fitgnn_tpu.models import NodeModel
    from fitgnn_tpu.train import steps

    batch = _regression_batch()
    model = NodeModel(layer_name="GCNConv", hidden=16, num_layers=2,
                      out_dim=1, classify=False)
    g0 = batch.subgraph(0)
    state = steps.create_state(model, jax.random.PRNGKey(0), g0.x, g0)

    rng = jax.random.PRNGKey(1)
    _, loss_mean = steps.gs_train_epoch_mb(state, batch, rng, "regression",
                                           batch_size=2, reduction="mean")
    _, loss_sum = steps.gs_train_epoch_mb(state, batch, rng, "regression",
                                          batch_size=2, reduction="sum")
    assert float(loss_sum) > float(loss_mean) * 1.5, \
        "sum reduction must differ from mean (it was silently ignored)"
