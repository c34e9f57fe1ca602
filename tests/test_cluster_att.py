"""Cluster-factorized GAT attention (opt-in): straggler edges attend to
their sender's CLUSTER-SUMMARY row through a dense (N, C) masked-count MXU
block — the single-chip analog of the hierarchical path's summary
attention (parallel/hierarchical.HierGATConv) and of the reference's
cluster_node approximation (utils.py:191-232).

The oracle is EXACT for these semantics: a plain per-edge GAT on an
AUGMENTED graph with C summary pseudo-nodes whose features are the
member-mean of x (means commute with the layer's linear projection, so
the summary's h/score rows equal the cluster means of the members'), and
one (summary -> receiver) edge per collapsed straggler edge (duplicates
keep multiplicity).
"""

import numpy as np
import jax
import jax.numpy as jnp

from fitgnn_tpu.graph import build_graph
from fitgnn_tpu.graph.optimize import build_optimized_graph
from fitgnn_tpu.models.layers import GATConv
from fitgnn_tpu.ops.hybrid_spmm import build_hybrid


def _random_graph(seed, n=500, e=2500):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n, e, dtype=np.int64)
    r = rng.integers(0, n, e, dtype=np.int64)
    keep = s != r
    x = rng.standard_normal((n, 16)).astype(np.float32)
    y = rng.integers(0, 3, n).astype(np.int32)
    return x, s[keep], r[keep], y


def _oracle_graph(g_opt, thresh, K, exact_k=0):
    """Rebuild the exact split the hybrid applied, then emit the augmented
    per-edge oracle graph (directed, no extra self-loops/normalization).
    ``exact_k``: replicate the hybrid top-k-sender split — those senders'
    straggler edges stay per-edge in the oracle too."""
    n_pad = g_opt.num_nodes_padded
    s_all = np.asarray(g_opt.senders, dtype=np.int64)
    r_all = np.asarray(g_opt.receivers, dtype=np.int64)
    real = np.arange(len(s_all)) < int(g_opt.n_edge)
    s_e, r_e = s_all[real], r_all[real]
    nb = n_pad // 128
    tile = (r_e // 128) * nb + (s_e // 128)
    _, inv_t, cnts = np.unique(tile, return_inverse=True, return_counts=True)
    dense = cnts[inv_t] >= thresh

    C = n_pad // K
    nr = int(g_opt.n_node)
    member = (np.arange(n_pad) < nr).astype(np.float64)
    x_pad = np.asarray(g_opt.x, dtype=np.float64)
    sums = (x_pad * member[:, None]).reshape(C, K, -1).sum(axis=1)
    counts = member.reshape(C, K).sum(axis=1)
    x_sum = (sums / np.maximum(counts, 1.0)[:, None]).astype(np.float32)

    strag_s, strag_r = s_e[~dense], r_e[~dense]
    keep = np.zeros(len(strag_s), dtype=bool)
    if exact_k:
        deg = np.bincount(strag_s, minlength=n_pad)
        k = min(exact_k, int((deg > 0).sum()))
        if k:
            top = np.argpartition(deg, -k)[-k:]
            is_top = np.zeros(n_pad, dtype=bool)
            is_top[top[deg[top] > 0]] = True
            keep = is_top[strag_s]
    aug_s = np.concatenate([s_e[dense], strag_s[keep],
                            n_pad + strag_s[~keep] // K])
    aug_r = np.concatenate([r_e[dense], strag_r[keep], strag_r[~keep]])
    x_aug = np.concatenate([x_pad.astype(np.float32), x_sum], axis=0)
    return build_graph(x_aug, aug_s.astype(np.int32),
                       aug_r.astype(np.int32), undirected=False,
                       self_loops=False, normalize=False, node_pad_to=8)


def _run_case(thresh, K, seed=0, features=16, exact_k=0):
    x, s, r, y = _random_graph(seed)
    g_opt, order = build_optimized_graph(x, s, r, y=y,
                                         min_block_edges=thresh,
                                         layer_name="GATConv",
                                         cluster_att=K,
                                         cluster_att_exact=exact_k, seed=0)
    assert g_opt.aux.cluster_count is not None
    assert g_opt.aux.cluster_size == K
    g_aug = _oracle_graph(g_opt, thresh, K, exact_k=exact_k)

    layer = GATConv(features=features)
    params = layer.init(jax.random.PRNGKey(1), g_aug.x, g_aug)
    out_aug = np.asarray(layer.apply(params, g_aug.x, g_aug))
    out_opt = np.asarray(layer.apply(params, g_opt.x, g_opt))
    n = len(order)
    np.testing.assert_allclose(out_opt[:n], out_aug[:n],
                               rtol=3e-4, atol=3e-5)

    def loss_opt(p):
        return jnp.sum(layer.apply(p, g_opt.x, g_opt)[:n] ** 2)

    def loss_aug(p):
        return jnp.sum(layer.apply(p, g_aug.x, g_aug)[:n] ** 2)

    g1 = jax.grad(loss_aug)(params)
    g2 = jax.grad(loss_opt)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        assert np.isfinite(np.asarray(b)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-3, atol=3e-4)


def test_pure_cluster_attention_matches_summary_oracle():
    """All edges stragglers (threshold huge): the output is ENTIRELY the
    dense cluster block, incl. self-loops collapsing onto own-cluster
    summaries — must match the augmented per-edge oracle exactly."""
    _run_case(thresh=10 ** 9, K=128)


def test_mixed_tiles_plus_cluster_attention():
    """Realistic split: dense tiles stay exact per-edge/tile attention,
    only the straggler remainder rides the summary block."""
    _run_case(thresh=8, K=128)


def test_cluster_attention_wider_clusters():
    _run_case(thresh=8, K=256, seed=3)


def test_cluster_attention_exact_max_stabilizer(monkeypatch):
    """FITGNN_GAT_GLOBAL_MAX=0: the exact segment-max must fold in the
    cluster-score row maxima (a receiver whose edges ALL collapsed to the
    summary block has no straggler/tile contribution to m)."""
    from fitgnn_tpu.ops import tile_gat
    monkeypatch.setattr(tile_gat, "_GLOBAL_MAX", False)
    _run_case(thresh=10 ** 9, K=128, seed=5)


def test_cluster_count_multiplicity_and_guards():
    x, s, r, y = _random_graph(7, n=300, e=900)
    g_opt, order = build_optimized_graph(x, s, r, y=y,
                                         min_block_edges=10 ** 9,
                                         layer_name="GATConv",
                                         cluster_att=128, seed=0)
    hyb = g_opt.aux
    n_pad = g_opt.num_nodes_padded
    cc = np.asarray(hyb.cluster_count, dtype=np.float64)
    # total count == number of real (weight>0) edges, all collapsed
    s_all = np.asarray(g_opt.senders, dtype=np.int64)
    r_all = np.asarray(g_opt.receivers, dtype=np.int64)
    real = np.arange(len(s_all)) < int(g_opt.n_edge)
    assert cc.sum() == real.sum()
    ref = np.zeros_like(cc)
    np.add.at(ref, (r_all[real], s_all[real] // 128), 1.0)
    np.testing.assert_array_equal(cc, ref)
    # straggler lists emptied to the single zero-weight placeholder
    assert hyb.num_coo_edges == 1
    assert float(hyb.weights[0]) == 0.0
    # member mask / scale match the real-node prefix
    member = np.asarray(hyb.cluster_member)
    assert member[: len(order)].all() and not member[len(order):].any()
    # guards: non-attention semantics and non-dividing cluster size
    import pytest
    with pytest.raises(ValueError):
        build_hybrid(s_all, r_all, np.ones(len(s_all), np.float32), n_pad,
                     semantics="gcn_norm", cluster_att=128)
    with pytest.raises(ValueError):
        build_hybrid(s_all, r_all, np.ones(len(s_all), np.float32), n_pad,
                     semantics="att_unit", cluster_att=n_pad + 128)


def test_optimize_coarse_cluster_attention_trains():
    """Gc-phase wiring: optimize_coarse(cluster_att=K) builds a GAT coarse
    graph whose node space is padded to whole clusters, trains without
    NaNs, and carries the count table (approximate mode — exactness vs the
    per-edge oracle is gated by the tests above at the op level)."""
    import sys
    import os
    sys.path.insert(0, os.path.dirname(__file__))
    from fitgnn_tpu.graph.optimize import optimize_coarse
    from fitgnn_tpu.models import NodeModel
    from fitgnn_tpu.train import steps
    from test_train import make_dataset

    ds = make_dataset()
    co2 = optimize_coarse(ds.coarse, min_block_edges=4, cluster_att=128,
                          layer_name="GATConv")
    hyb = co2.graph.aux
    assert hyb.cluster_count is not None and hyb.cluster_size == 128
    assert co2.graph.num_nodes_padded % 128 == 0
    model = NodeModel(layer_name="GATConv", hidden=16, num_layers=2,
                      out_dim=4, dropout_rate=0.0)
    st = steps.create_state(model, jax.random.PRNGKey(0), co2.graph.x,
                            co2.graph)
    losses = []
    for i in range(8):
        st, l = steps.gc_train_step(st, co2.graph, co2.y_train,
                                    co2.train_mask, jax.random.PRNGKey(i),
                                    "classification")
        losses.append(float(l))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_hybrid_exact_summary_split_matches_oracle():
    """VERDICT r3 #3: top-k straggler senders stay per-edge exact, the
    tail collapses onto summaries — output AND grads must match the
    augmented oracle that applies the same split."""
    _run_case(thresh=8, K=128, exact_k=32, seed=11)


def test_hybrid_split_pure_summary_at_k0():
    """exact_k=0 degenerates to the all-summary mode (regression gate for
    the split refactor)."""
    _run_case(thresh=8, K=128, exact_k=0, seed=12)


def test_hybrid_split_all_exact_equals_per_edge():
    """exact_k >= #straggler senders: the count table is all-zero and the
    hybrid must equal PLAIN per-edge GAT on the original graph."""
    x, s, r, y = _random_graph(13)
    g_opt, order = build_optimized_graph(x, s, r, y=y, min_block_edges=8,
                                         layer_name="GATConv",
                                         cluster_att=128,
                                         cluster_att_exact=10 ** 9, seed=0)
    assert float(np.asarray(g_opt.aux.cluster_count,
                            dtype=np.float64).sum()) == 0.0
    g_plain, order2 = build_optimized_graph(x, s, r, y=y,
                                            min_block_edges=8,
                                            layer_name="GATConv", seed=0)
    np.testing.assert_array_equal(order, order2)
    layer = GATConv(features=16)
    params = layer.init(jax.random.PRNGKey(1), g_plain.x, g_plain)
    out_split = np.asarray(layer.apply(params, g_opt.x, g_opt))
    out_plain = np.asarray(layer.apply(params, g_plain.x, g_plain))
    n = len(order)
    np.testing.assert_allclose(out_split[:n], out_plain[:n],
                               rtol=3e-4, atol=3e-5)
