"""Auto-config planner (VERDICT r4 ask #7): the cost model's choices must
reproduce the measured on-chip champions (PERFORMANCE.md sweeps) —
threshold ~48 (32-96 plateau) for exact GCN, the >=192 plateau under the
cluster collapse, the 16-32 plateau for exact GAT — and the operational
knobs must follow the round-4 products-scale findings."""

import numpy as np
import pytest

from fitgnn_tpu.graph.planner import (PlanConfig, plan_config,
                                      predict_cost_ms, tile_histogram)


def community_graph_edges(n=25_600, comm=512, degree=16, internal=0.85,
                          seed=0):
    """Bench-graph-like structure (community-contiguous order)."""
    rng = np.random.default_rng(seed)
    e = n * degree // 2
    r = rng.integers(0, n, e, dtype=np.int64)
    c = r // comm
    s = np.where(rng.random(e) < internal,
                 np.minimum(c * comm + rng.integers(0, comm, e), n - 1),
                 rng.integers(0, n, e, dtype=np.int64))
    keep = s != r
    return s[keep], r[keep]


@pytest.fixture(scope="module")
def edges():
    return community_graph_edges()


class TestThresholdChoice:
    def test_exact_gcn_lands_on_measured_plateau(self, edges):
        s, r = edges
        p = plan_config(s, r, 25_600, layer_name="GCNConv")
        assert 32 <= p.min_block_edges <= 96, p.min_block_edges

    def test_cluster_collapse_retunes_up(self, edges):
        s, r = edges
        p = plan_config(s, r, 25_600, layer_name="GCNConv", cluster=2048)
        assert p.min_block_edges >= 128, p.min_block_edges
        # 2048 does not divide 25_600 — snapped to a valid 128-multiple
        assert p.cluster_k > 0 and 25_600 % p.cluster_k == 0

    def test_exact_gat_lands_lower(self, edges):
        s, r = edges
        p_gat = plan_config(s, r, 25_600, layer_name="GATConv")
        p_gcn = plan_config(s, r, 25_600, layer_name="GCNConv")
        assert p_gat.min_block_edges <= 48
        assert p_gat.min_block_edges <= p_gcn.min_block_edges

    def test_within_5pct_of_hand_tuned(self, edges):
        """Exact modes: the hand-tuned champion threshold (48 GCN / 32 GAT)
        must cost within 5% of the planner's pick under its calibrated
        model — i.e. the pick and the champion sit on the same measured
        plateau.  (The cluster-mode equivalent holds on the full bench
        graph — planner picks 384 with t192 within 1.4%, recorded in
        PERFORMANCE.md round 5 — but not on this scaled-down fixture,
        whose community tiles fall between 192 and 384.)"""
        s, r = edges
        for layer, hand in (("GCNConv", 48), ("GATConv", 32)):
            p = plan_config(s, r, 25_600, layer_name=layer)
            assert p.alternatives[hand] <= p.predicted_ms * 1.05, (
                layer, p.min_block_edges, p.alternatives)

    def test_k_snaps_to_divisor(self, edges):
        s, r = edges
        # 25_600 / 128 = 200 blocks; K=3*128=384 does not divide
        p = plan_config(s, r, 25_600, layer_name="GCNConv", cluster=384)
        assert p.cluster_k > 0 and 25_600 % p.cluster_k == 0

    def test_histogram_and_cost_monotonicity(self, edges):
        s, r = edges
        counts = tile_histogram(s, r, 25_600)
        assert counts.sum() == len(s)
        # collapsed mode: raising the threshold can only shed tile cost
        c1 = predict_cost_ms(counts, 48, False, 2048, 25_600)
        c2 = predict_cost_ms(counts, 384, False, 2048, 25_600)
        assert c2 <= c1 + 1e-9


class TestOperationalKnobs:
    def test_big_graph_limits(self, edges):
        s, r = edges
        p = plan_config(s, r, 2_500_000, layer_name="GCNConv",
                        num_subgraphs=80_000)
        assert p.max_buckets == 2
        assert p.chunk_budget == 1 << 26

    def test_small_graph_defaults(self, edges):
        s, r = edges
        p = plan_config(s, r, 25_600, layer_name="GCNConv")
        assert p.max_buckets == 0
        assert p.chunk_budget == 1 << 28
        assert p.block == 128 and p.dense_cutoff == 512
        assert isinstance(p, PlanConfig)


class TestAutoThreshold:
    def test_optimize_coarse_accepts_auto(self):
        from fitgnn_tpu.data.splits import splits_classification
        from fitgnn_tpu.data.synthetic import sbm_graph
        from fitgnn_tpu.graph.optimize import optimize_coarse
        from fitgnn_tpu.partition import coarsen_and_partition

        x, s, r, y = sbm_graph(num_nodes=300, num_classes=3, num_features=8,
                               p_in=0.1, p_out=0.01, seed=0)
        tr, va, te = splits_classification(y, 3, "random", seed=0)
        ds = coarsen_and_partition(
            x, s, r, y, reduction=0.5, method="variation_neighborhoods",
            mode="extra_node", task="classification", num_classes=3,
            train_mask=tr, val_mask=va, test_mask=te, seed=0)
        out = optimize_coarse(ds.coarse, min_block_edges="auto")
        assert out.graph.aux is not None

    def test_build_optimized_graph_accepts_auto(self):
        from fitgnn_tpu.data.synthetic import sbm_graph
        from fitgnn_tpu.graph.optimize import build_optimized_graph

        x, s, r, y = sbm_graph(num_nodes=400, num_classes=3, num_features=8,
                               p_in=0.1, p_out=0.01, seed=0)
        g, order = build_optimized_graph(x, s, r, y=y,
                                         min_block_edges="auto")
        assert g.aux is not None
        assert len(order) == 400
