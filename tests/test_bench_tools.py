"""Tests for bench/observability/multihost helper modules (CPU)."""

import json
import os

import numpy as np
import jax
import pytest

from fitgnn_tpu.bench.roofline import measure_spmm_roofline, detect_peak_gbps
from fitgnn_tpu.bench.memory import memory_report
from fitgnn_tpu.bench.graph_inference import graph_inference_benchmark
from fitgnn_tpu.utils.logging import ScalarWriter
from fitgnn_tpu.parallel.multihost import placement_by_community


class TestRoofline:
    def test_measure_small(self):
        rep = measure_spmm_roofline(num_nodes=512, avg_degree=4, feat=32,
                                    reps=2)
        assert rep.seconds_per_spmm > 0
        assert rep.achieved_gbps > 0
        assert rep.peak_gbps == detect_peak_gbps()
        assert 0 < rep.fraction_of_roofline


class TestScalarWriter:
    def test_jsonl_rows(self, tmp_path):
        with ScalarWriter(str(tmp_path), run=1) as w:
            w.add_scalar("loss", 0.5, 0)
            w.add_scalar("loss", 0.25, 1)
        rows = [json.loads(l) for l in
                open(tmp_path / "run_1" / "scalars.jsonl")]
        assert rows[0]["tag"] == "loss" and rows[1]["value"] == 0.25


class TestPlacement:
    def test_balanced_contiguous(self):
        labels = np.array([0] * 50 + [1] * 30 + [2] * 20 + [3] * 20)
        order, shard = placement_by_community(labels, num_shards=2)
        # balanced: 50+20 vs 30+20 (LPT)
        counts = np.bincount(shard)
        assert abs(int(counts[0]) - int(counts[1])) <= 20
        # contiguity: ordered shards are non-decreasing
        assert np.all(np.diff(shard[order]) >= 0)
        # communities unsplit
        for c in range(4):
            assert len(np.unique(shard[labels == c])) == 1


class TestGraphInference:
    def test_runs_and_reports(self):
        from fitgnn_tpu.data.synthetic import random_graph_dataset
        from fitgnn_tpu.data.graph_level import (prepare_graph_sample,
                                                 collate_graph_level)
        from fitgnn_tpu.models import GraphModel
        graphs, y = random_graph_dataset(num_graphs=6, seed=0)
        samples = [prepare_graph_sample(x, s, r, y_)
                   for (x, s, r), y_ in zip(graphs, y)]
        model = GraphModel(layer_name="GCNConv", hidden=8, num_layers=1,
                           out_dim=2)
        b = collate_graph_level([samples[0]])
        params = model.init(jax.random.PRNGKey(0), b.gc.x, b.gc,
                            b.gc_graph_ids, 1)
        rep = graph_inference_benchmark(model, params, samples[:4], y[:4],
                                        view="gc")
        assert rep.num_test_samples == 4
        assert rep.avg_inf_time > 0
        rep_gs = graph_inference_benchmark(model, params, samples[:3], y[:3],
                                           view="gs")
        assert np.isfinite(rep_gs.avg_loss)
