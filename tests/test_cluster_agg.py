"""Cluster-factorized STATIC aggregation (opt-in, GCN/SAGE/GIN semantics):
straggler edges aggregate their sender's cluster-mean row through one
(N, C) @ (C, F) MXU matmul — the static-weight analog of the GAT
cluster attention and of the reference's cluster_node approximation
(utils.py:191-232), applied per edge.

The oracle is EXACT for these semantics: a per-edge aggregation on a
modified edge set where every collapsed straggler edge (u→v, w) reads the
member-mean of u's cluster instead of x[u].
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fitgnn_tpu.ops.hybrid_spmm import build_hybrid, hybrid_spmm


def _random_case(seed, n_pad=512, e=3000, f=16, real_nodes=None):
    rng = np.random.default_rng(seed)
    nr = n_pad if real_nodes is None else real_nodes
    s = rng.integers(0, nr, e, dtype=np.int64)
    r = rng.integers(0, nr, e, dtype=np.int64)
    w = rng.random(e).astype(np.float32) + 0.1
    x = rng.standard_normal((n_pad, f)).astype(np.float32)
    x[nr:] = 0.0
    return s, r, w, x


def _oracle(s, r, w, x, n_pad, thresh, K, real_nodes, exact_k=0):
    """Per-edge numpy oracle replicating the hybrid's split decisions."""
    nb = n_pad // 128
    tile = (r // 128) * nb + (s // 128)
    _, inv, cnts = np.unique(tile, return_inverse=True, return_counts=True)
    dense = cnts[inv] >= thresh
    cs, cr, cw = s[~dense], r[~dense], w[~dense]
    real = cw > 0
    keep = np.zeros(len(cs), dtype=bool)
    if exact_k:
        deg = np.bincount(cs[real], weights=cw[real].astype(np.float64),
                          minlength=n_pad)
        k = min(exact_k, int((deg > 0).sum()))
        if k:
            top = np.argpartition(deg, -k)[-k:]
            is_top = np.zeros(n_pad, dtype=bool)
            is_top[top[deg[top] > 0]] = True
            keep = is_top[cs] & real
    member = (np.arange(n_pad) < real_nodes).astype(np.float64)
    C = n_pad // K
    xm = (np.asarray(x, dtype=np.float64) * member[:, None])
    sums = xm.reshape(C, K, -1).sum(axis=1)
    cnt_m = member.reshape(C, K).sum(axis=1)
    xmean = sums / np.maximum(cnt_m, 1.0)[:, None]

    out = np.zeros_like(np.asarray(x, dtype=np.float64))
    # dense tiles + kept-exact stragglers: per-edge on real features
    es = np.concatenate([s[dense], cs[keep]])
    er = np.concatenate([r[dense], cr[keep]])
    ew = np.concatenate([w[dense], cw[keep]])
    np.add.at(out, er, ew[:, None] * np.asarray(x, np.float64)[es])
    # collapsed stragglers: per-edge on the sender's cluster mean
    col = real & ~keep
    np.add.at(out, cr[col], cw[col][:, None] * xmean[cs[col] // K])
    return out.astype(np.float32)


class TestClusterAgg:
    @pytest.mark.parametrize("exact_k", [0, 5])
    def test_forward_matches_per_edge_oracle(self, exact_k):
        n_pad, K, thresh = 512, 128, 6
        s, r, w, x = _random_case(0, n_pad=n_pad)
        h = build_hybrid(s, r, w, n_pad, min_block_edges=thresh,
                         cluster_agg=K, cluster_agg_exact=exact_k,
                         real_nodes=n_pad)
        got = np.asarray(hybrid_spmm(h, jnp.asarray(x)))
        want = _oracle(s, r, w, x, n_pad, thresh, K, n_pad,
                       exact_k=exact_k)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_padding_rows_excluded_from_summaries(self):
        n_pad, K, thresh, nr = 512, 128, 6, 400
        s, r, w, x = _random_case(1, n_pad=n_pad, real_nodes=nr)
        h = build_hybrid(s, r, w, n_pad, min_block_edges=thresh,
                         cluster_agg=K, real_nodes=nr)
        got = np.asarray(hybrid_spmm(h, jnp.asarray(x)))
        want = _oracle(s, r, w, x, n_pad, thresh, K, nr)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_gradient_matches_per_edge_oracle(self):
        n_pad, K, thresh = 512, 128, 6
        s, r, w, x = _random_case(2, n_pad=n_pad)
        h = build_hybrid(s, r, w, n_pad, min_block_edges=thresh,
                         cluster_agg=K, real_nodes=n_pad)
        g_out = np.random.default_rng(3).standard_normal(x.shape)
        g_out = jnp.asarray(g_out.astype(np.float32))

        def loss_hyb(xx):
            return jnp.vdot(hybrid_spmm(h, xx), g_out)

        # jnp per-edge reference with the same split decisions
        nb = n_pad // 128
        tile = (r // 128) * nb + (s // 128)
        _, inv, cnts = np.unique(tile, return_inverse=True,
                                 return_counts=True)
        dense = cnts[inv] >= thresh
        cs, cr, cw = s[~dense], r[~dense], w[~dense]
        member = jnp.ones((n_pad,), jnp.float32)
        C = n_pad // K

        def loss_ref(xx):
            out = jnp.zeros_like(xx)
            out = out.at[r[dense]].add(w[dense][:, None] * xx[s[dense]])
            xmean = (xx * member[:, None]).reshape(C, K, -1).sum(1) / K
            out = out.at[cr].add(cw[:, None] * xmean[cs // K])
            return jnp.vdot(out, g_out)

        gh = np.asarray(jax.grad(loss_hyb)(jnp.asarray(x)))
        gr = np.asarray(jax.grad(loss_ref)(jnp.asarray(x)))
        np.testing.assert_allclose(gh, gr, rtol=2e-5, atol=2e-5)

    def test_table_holds_weights_not_counts(self):
        # duplicate edges with distinct weights must sum their weights;
        # 0.1/0.3 are bf16-INEXACT, so a regression of the static-table
        # f32 dtype rule would shift the sum and fail the exact compare
        n_pad, K = 256, 128
        s = np.array([0, 0, 3], dtype=np.int64)
        r = np.array([200, 200, 200], dtype=np.int64)
        w = np.array([0.1, 0.3, 1.25], dtype=np.float32)
        h = build_hybrid(s, r, w, n_pad, min_block_edges=100,
                         cluster_agg=K, real_nodes=n_pad)
        assert h.cluster_count.dtype == jnp.float32  # never bf16 (sums)
        cc = np.asarray(h.cluster_count)
        np.testing.assert_array_equal(
            cc[200, 0], np.float32(0.1) + np.float32(0.3) + np.float32(1.25))
        assert h.num_coo_edges == 1 and float(h.weights[0]) == 0.0

    def test_bf16_summary_accumulates_f32(self):
        # 2048 members of 1e-3 each: a bf16 chain sum stops absorbing
        # terms once the partial passes ~0.25 (8 mantissa bits), losing
        # most of the sum; the MXU/dot_general f32 accumulation keeps it.
        n_pad = K = 2048
        s = np.array([5], dtype=np.int64)
        r = np.array([1900], dtype=np.int64)
        w = np.array([1.0], dtype=np.float32)
        h = build_hybrid(s, r, w, n_pad, min_block_edges=10**6,
                         cluster_agg=K, real_nodes=n_pad)
        x = jnp.full((n_pad, 8), 1e-3, dtype=jnp.bfloat16)
        out = np.asarray(hybrid_spmm(h, x), dtype=np.float32)
        # exact mean = 1e-3 (w=1); allow bf16 I/O rounding only (~0.4 %)
        np.testing.assert_allclose(out[1900], 1e-3, rtol=0.01)

    def test_semantics_guards(self):
        s, r, w, _ = _random_case(4, n_pad=256)
        with pytest.raises(ValueError, match="att_unit"):
            build_hybrid(s, r, w, 256, cluster_agg=128,
                         semantics="att_unit")
        with pytest.raises(ValueError, match="mutually exclusive"):
            build_hybrid(s, r, w, 256, cluster_att=128, cluster_agg=128,
                         semantics="att_unit")

    def test_layer_level_gcn_runs_and_is_finite(self):
        from fitgnn_tpu.graph.optimize import build_optimized_graph
        from fitgnn_tpu.models import NodeModel
        rng = np.random.default_rng(5)
        n, e = 700, 4000
        s = rng.integers(0, n, e, dtype=np.int64)
        r = rng.integers(0, n, e, dtype=np.int64)
        keep = s != r
        x = rng.standard_normal((n, 8)).astype(np.float32)
        y = rng.integers(0, 3, n).astype(np.int32)
        g, _ = build_optimized_graph(x, s[keep], r[keep], y=y,
                                     min_block_edges=6, cluster_agg=128,
                                     layer_name="GCNConv")
        assert g.aux.cluster_size == 128
        assert g.aux.semantics == "gcn_norm"
        model = NodeModel(layer_name="GCNConv", hidden=8, num_layers=2,
                          out_dim=3)
        params = model.init(jax.random.PRNGKey(0), g.x, g)
        out = model.apply(params, g.x, g)
        assert np.isfinite(np.asarray(out)).all()
