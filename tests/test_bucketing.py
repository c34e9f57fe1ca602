"""Size-bucketed subgraph batches: cover preservation + train/eval parity."""

import numpy as np
import jax
import pytest

from fitgnn_tpu.data.synthetic import sbm_graph
from fitgnn_tpu.data.splits import splits_classification
from fitgnn_tpu.partition import coarsen_and_partition
from fitgnn_tpu.partition.bucketing import bucket_subgraphs
from fitgnn_tpu.partition.pipeline import _component_adjacency
from fitgnn_tpu.partition.subgraphs import extract_subgraphs
from fitgnn_tpu.models import NodeModel
from fitgnn_tpu.train import steps


def make_setup(seed=0):
    x, s, r, y = sbm_graph(num_nodes=300, num_classes=3, num_features=16,
                           p_in=0.08, p_out=0.01, seed=seed)
    train, val, test = splits_classification(y, 3, "random", seed=seed)
    ds = coarsen_and_partition(
        x, s, r, y, reduction=0.5, method="variation_neighborhoods",
        mode="extra_node", task="classification", num_classes=3,
        train_mask=train, val_mask=val, test_mask=test, seed=seed)
    W = _component_adjacency(s, r, 300)
    specs = extract_subgraphs(W, x, ds.parent, mode="extra_node")
    buckets = bucket_subgraphs(specs, y=y, train_mask=train, val_mask=val,
                               test_mask=test)
    return ds, buckets, y


class TestBucketing:
    def test_cover_preserved(self):
        ds, buckets, y = make_setup()
        owned = []
        for b in buckets:
            orig = np.asarray(b.orig_idx)
            consume = np.asarray(b.consume_mask)
            owned.append(orig[consume & (orig >= 0)])
        owned = np.sort(np.concatenate(owned))
        np.testing.assert_array_equal(owned, np.arange(300))

    def test_bucket_shapes_power_of_two(self):
        _, buckets, _ = make_setup()
        assert len(buckets) >= 1
        for b in buckets:
            n = b.num_nodes_padded
            assert n >= 8

    def test_max_buckets_cap_preserves_cover(self):
        """max_buckets merges size groups without losing any consuming
        node, and the placement index stays consistent."""
        from fitgnn_tpu.partition.bucketing import (
            bucket_subgraphs_with_index)
        x, s, r, y = sbm_graph(num_nodes=300, num_classes=3,
                               num_features=16, p_in=0.08, p_out=0.01,
                               seed=0)
        train, val, test = splits_classification(y, 3, "random", seed=0)
        ds = coarsen_and_partition(
            x, s, r, y, reduction=0.5, method="variation_neighborhoods",
            mode="extra_node", task="classification", num_classes=3,
            train_mask=train, val_mask=val, test_mask=test, seed=0)
        W = _component_adjacency(s, r, 300)
        specs = extract_subgraphs(W, x, ds.parent, mode="extra_node")
        full, _ = bucket_subgraphs_with_index(specs, y=y, train_mask=train,
                                              val_mask=val, test_mask=test)
        for cap in (1, 2):
            bks, idx = bucket_subgraphs_with_index(
                specs, y=y, train_mask=train, val_mask=val, test_mask=test,
                max_buckets=cap)
            assert len(bks) <= max(cap, 1)
            owned = []
            for b in bks:
                orig = np.asarray(b.orig_idx)
                consume = np.asarray(b.consume_mask)
                owned.append(orig[consume & (orig >= 0)])
            np.testing.assert_array_equal(
                np.sort(np.concatenate(owned)), np.arange(300))
            # index addresses every spec's own subgraph
            for i in (0, len(specs) - 1):
                b, pos = idx[i]
                orig = np.asarray(bks[b].orig_idx[pos])
                want = specs[i].orig_idx[specs[i].orig_idx >= 0]
                assert set(want) <= set(orig[orig >= 0])
        # cap >= group count is a no-op
        same, _ = bucket_subgraphs_with_index(
            specs, y=y, train_mask=train, val_mask=val, test_mask=test,
            max_buckets=len(full))
        assert len(same) == len(full)

    def test_multi_bucket_step_matches_single(self):
        """GD over buckets == GD over the single global-padded batch."""
        ds, buckets, _ = make_setup()
        model = NodeModel(layer_name="GCNConv", hidden=8, num_layers=1,
                          out_dim=3, classify=True)
        g0 = ds.subgraphs.subgraph(0)
        state = steps.create_state(model, jax.random.PRNGKey(0), g0.x, g0)

        # dropout must be off for exact parity: use eval-mode losses via a
        # zero-dropout model
        model_nd = NodeModel(layer_name="GCNConv", hidden=8, num_layers=1,
                             out_dim=3, classify=True)
        # evaluate loss/metric parity (eval has no dropout)
        l1, m1 = steps.gs_eval_step(state, ds.subgraphs, "classification",
                                    split="test")
        l2, m2 = steps.gs_eval_step_multi(state, tuple(buckets),
                                          "classification", split="test")
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
        np.testing.assert_allclose(float(m1), float(m2), rtol=1e-5)

    def test_run_node_task_accepts_buckets(self):
        from fitgnn_tpu.train import NodeTaskConfig, run_node_task
        ds, buckets, _ = make_setup()
        cfg = NodeTaskConfig(layer_name="GCNConv", hidden=16, num_layers=2,
                             out_dim=3, exp_setup="Gs_train_2_Gs_infer",
                             epochs2=20, runs=1, seed=0)
        res = run_node_task(cfg, ds.coarse, buckets)
        assert res.runs[0].test_acc > 0.5

    def test_multi_bucket_training_learns(self):
        ds, buckets, _ = make_setup()
        model = NodeModel(layer_name="GCNConv", hidden=16, num_layers=2,
                          out_dim=3)
        g0 = ds.subgraphs.subgraph(0)
        state = steps.create_state(model, jax.random.PRNGKey(0), g0.x, g0)
        batches = tuple(buckets)
        losses = []
        for i in range(30):
            state, loss = steps.gs_train_step_gd_multi(
                state, batches, jax.random.PRNGKey(i), "classification")
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        _, acc = steps.gs_eval_step_multi(state, batches, "classification",
                                          split="test")
        assert float(acc) > 0.5


class TestChunkedEval:
    def test_chunked_eval_matches_full(self):
        """chunk-scanned eval sums == whole-bucket vmap eval (the memory-
        bounded path the products-scale flagship run uses)."""
        import jax
        from fitgnn_tpu.models import NodeModel
        from fitgnn_tpu.train import steps
        ds, buckets, y = make_setup()
        model = NodeModel(layer_name="GCNConv", hidden=16, num_layers=2,
                          out_dim=int(y.max()) + 1)
        g0 = buckets[0].subgraph(0)
        state = steps.create_state(model, jax.random.PRNGKey(0), g0.x, g0)
        full = steps.gs_eval_step_multi(state, tuple(buckets),
                                        "classification", split="test")
        chunked = steps.gs_eval_step_multi(state, tuple(buckets),
                                           "classification", split="test",
                                           chunk=3)
        np.testing.assert_allclose(float(chunked[0]), float(full[0]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(chunked[1]), float(full[1]),
                                   rtol=1e-5)

    def test_per_bucket_sums_eval_matches_monolithic(self):
        """The per-bucket-program eval (products-scale path) == the
        monolithic multi-bucket eval."""
        import jax
        from fitgnn_tpu.models import NodeModel
        from fitgnn_tpu.train import steps
        ds, buckets, y = make_setup()
        model = NodeModel(layer_name="GCNConv", hidden=16, num_layers=2,
                          out_dim=int(y.max()) + 1)
        g0 = buckets[0].subgraph(0)
        state = steps.create_state(model, jax.random.PRNGKey(0), g0.x, g0)
        mono = steps.gs_eval_step_multi(state, tuple(buckets),
                                        "classification", split="test")
        sums = [steps.gs_eval_bucket_sums(state, b, "classification",
                                          split="test", chunk=3)
                for b in buckets]
        split = steps.finish_eval_from_sums("classification", sums)
        np.testing.assert_allclose(split[0], float(mono[0]), rtol=1e-5)
        np.testing.assert_allclose(split[1], float(mono[1]), rtol=1e-5)
