"""Selector-matmul straggler scatter: parity vs the COO segment-sum path
(interpret mode on CPU) through the kernel, the hybrid operator, and grads."""

import numpy as np
import jax
import jax.numpy as jnp

from fitgnn_tpu.ops.hybrid_spmm import build_hybrid, hybrid_spmm
from fitgnn_tpu.ops.pallas.coo_segmm import build_segmm, segmm_spmm
from fitgnn_tpu.ops.spmm import spmm_coo


def _edges(rng, n, e):
    s = rng.integers(0, n, e, dtype=np.int64)
    r = np.sort(rng.integers(0, n, e, dtype=np.int64))
    w = rng.random(e).astype(np.float32)
    return s, r, w


class TestSegMM:
    def test_matches_segment_sum(self):
        rng = np.random.default_rng(0)
        n, e, f = 512, 700, 64
        s, r, w = _edges(rng, n, e)
        x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
        m = build_segmm(s, r, w, n)
        out = segmm_spmm(m, x)
        ref = spmm_coo(jnp.asarray(w), jnp.asarray(s, dtype=jnp.int32),
                       jnp.asarray(r, dtype=jnp.int32), x, n)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_grouped_blocks_match(self):
        """group>1 selectors (128·g output rows per chunk) are exact, incl.
        a node count NOT divisible by 128·g (rounded out buffer + slice)."""
        rng = np.random.default_rng(4)
        n, e, f = 640, 1500, 32          # 5 blocks: g=2 → 2.5 groups
        s, r, w = _edges(rng, n, e)
        x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
        ref = spmm_coo(jnp.asarray(w), jnp.asarray(s, dtype=jnp.int32),
                       jnp.asarray(r, dtype=jnp.int32), x, n)
        for g in (2, 4, 8):
            m = build_segmm(s, r, w, n, group=g)
            assert m.group == g
            out = segmm_spmm(m, x)
            assert out.shape == ref.shape
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5)
            # grouped padding never exceeds the per-block padding
            assert (m.num_edges_padded
                    <= build_segmm(s, r, w, n, group=1).num_edges_padded)

    def test_grouped_weighted_grads(self):
        """Dynamic-weight (GAT α) path with grouped structures."""
        from fitgnn_tpu.ops.pallas.coo_segmm import segmm_weighted_spmm
        rng = np.random.default_rng(9)
        n, e, f = 384, 800, 16           # 3 blocks: g=2 rounds up
        s = rng.integers(0, n, e, dtype=np.int64)
        r = np.sort(rng.integers(0, n, e, dtype=np.int64))
        unit = np.ones(e, np.float32)
        hyb = build_hybrid(s, r, unit, n, min_block_edges=10 ** 9,
                           use_segmm=True, semantics="att_unit",
                           segmm_group=2)
        assert hyb.segmm.group == 2 and hyb.t_segmm.group == 2
        w_dyn = jnp.asarray(rng.random(len(hyb.senders)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))

        def loss_k(w, xx):
            out = segmm_weighted_spmm(hyb.segmm, hyb.t_segmm, hyb.senders,
                                      hyb.receivers, w, xx)
            return jnp.sum(out ** 2)

        def loss_ref(w, xx):
            out = jax.ops.segment_sum(xx[hyb.senders] * w[:, None],
                                      hyb.receivers, num_segments=n,
                                      indices_are_sorted=True)
            return jnp.sum(out ** 2)

        np.testing.assert_allclose(np.asarray(loss_k(w_dyn, x)),
                                   np.asarray(loss_ref(w_dyn, x)),
                                   rtol=1e-4)
        dw_k, dx_k = jax.grad(loss_k, argnums=(0, 1))(w_dyn, x)
        dw_r, dx_r = jax.grad(loss_ref, argnums=(0, 1))(w_dyn, x)
        np.testing.assert_allclose(np.asarray(dw_k), np.asarray(dw_r),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dx_k), np.asarray(dx_r),
                                   rtol=1e-4, atol=1e-4)

    def test_empty_edges(self):
        m = build_segmm(np.empty(0, np.int64), np.empty(0, np.int64),
                        np.empty(0, np.float32), 256)
        x = jnp.ones((256, 32), dtype=jnp.float32)
        out = segmm_spmm(m, x)
        assert float(jnp.abs(out).sum()) == 0.0

    def test_hybrid_with_segmm_forward_and_grad(self):
        rng = np.random.default_rng(1)
        n, e, f = 640, 4000, 32
        # community edges so some tiles go dense, plus a scattered tail
        r = np.sort(rng.integers(0, n, e, dtype=np.int64))
        s = np.where(rng.random(e) < 0.7,
                     (r // 128) * 128 + rng.integers(0, 128, e),
                     rng.integers(0, n, e, dtype=np.int64))
        w = rng.random(e).astype(np.float32)
        x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))

        hyb = build_hybrid(s, r, w, n, min_block_edges=40)
        hyb_k = build_hybrid(s, r, w, n, min_block_edges=40, use_segmm=True)
        assert hyb_k.segmm is not None and hyb_k.t_segmm is not None

        ref = hybrid_spmm(hyb, x)
        out = hybrid_spmm(hyb_k, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

        g_ref = jax.grad(lambda xx: jnp.sum(hybrid_spmm(hyb, xx) ** 2))(x)
        g_out = jax.grad(lambda xx: jnp.sum(hybrid_spmm(hyb_k, xx) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-4)


class TestRowWalk:
    def test_rowwalk_matches_gridwalk(self):
        """Row-walk BSR kernel (double-buffered A/X DMAs, f32 accumulate)
        matches the grid-walk kernel and the dense oracle, incl. empty
        block-rows (no filler tiles needed) and grads."""
        from fitgnn_tpu.ops.pallas.bsr_spmm import build_bsr, bsr_spmm
        rng = np.random.default_rng(3)
        n, e, f = 768, 5000, 64
        # leave block-row 2 empty on purpose
        r = np.sort(rng.integers(0, n, e, dtype=np.int64))
        r = np.where((r // 128) == 2, r - 128, r)
        s = (r // 128) * 128 + rng.integers(0, 128, e)
        w = rng.random(e).astype(np.float32)
        x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))

        grid = build_bsr(s, r, w, n)
        walk = build_bsr(s, r, w, n, rowwalk=True)
        a = np.zeros((n, n), dtype=np.float32)
        np.add.at(a, (r, s), w)

        o_grid = np.asarray(bsr_spmm(grid, x))
        o_walk = np.asarray(bsr_spmm(walk, x))
        ref = np.asarray(jnp.asarray(a) @ x)
        np.testing.assert_allclose(o_walk, ref, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(o_walk, o_grid, rtol=1e-4, atol=1e-4)

        g1 = jax.grad(lambda xx: jnp.sum(bsr_spmm(walk, xx) ** 2))(x)
        g2 = jax.grad(lambda xx: jnp.sum((jnp.asarray(a) @ xx) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-3, atol=1e-2)


class TestWeightedSegMM:
    """Dynamic per-edge weights (the GAT straggler α path)."""

    def _setup(self, seed=5, n=512, e=900, f=48):
        rng = np.random.default_rng(seed)
        s = rng.integers(0, n, e, dtype=np.int64)
        r = np.sort(rng.integers(0, n, e, dtype=np.int64))
        unit = np.ones(e, np.float32)
        hyb = build_hybrid(s, r, unit, n, min_block_edges=10 ** 9,
                           use_segmm=True, semantics="att_unit")
        w_dyn = jnp.asarray(rng.random(len(hyb.senders)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
        return hyb, w_dyn, x, n

    def test_forward_matches_segment_sum(self):
        from fitgnn_tpu.ops.pallas.coo_segmm import segmm_weighted_spmm
        hyb, w_dyn, x, n = self._setup()
        out = segmm_weighted_spmm(hyb.segmm, hyb.t_segmm, hyb.senders,
                                  hyb.receivers, w_dyn, x)
        ref = jax.ops.segment_sum(x[hyb.senders] * w_dyn[:, None],
                                  hyb.receivers, num_segments=n,
                                  indices_are_sorted=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_grads_match_autodiff_reference(self):
        from fitgnn_tpu.ops.pallas.coo_segmm import segmm_weighted_spmm
        hyb, w_dyn, x, n = self._setup(seed=6)
        tgt = jnp.asarray(np.random.default_rng(7).standard_normal(
            (n, x.shape[1])).astype(np.float32))

        def loss_k(w, xx):
            out = segmm_weighted_spmm(hyb.segmm, hyb.t_segmm, hyb.senders,
                                      hyb.receivers, w, xx)
            return jnp.sum((out - tgt) ** 2)

        def loss_ref(w, xx):
            out = jax.ops.segment_sum(xx[hyb.senders] * w[:, None],
                                      hyb.receivers, num_segments=n,
                                      indices_are_sorted=True)
            return jnp.sum((out - tgt) ** 2)

        dw_k, dx_k = jax.grad(loss_k, argnums=(0, 1))(w_dyn, x)
        dw_r, dx_r = jax.grad(loss_ref, argnums=(0, 1))(w_dyn, x)
        np.testing.assert_allclose(np.asarray(dw_k), np.asarray(dw_r),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dx_k), np.asarray(dx_r),
                                   rtol=1e-4, atol=1e-4)

    def test_att_unit_hybrid_attaches_segmm(self):
        from fitgnn_tpu.graph.optimize import build_optimized_graph
        from fitgnn_tpu.data.synthetic import sbm_graph
        x, s, r, y = sbm_graph(num_nodes=384, num_classes=3,
                               num_features=8, p_in=0.08, p_out=0.01, seed=2)
        g, _ = build_optimized_graph(x, s, r, y=y, min_block_edges=8,
                                     layer_name="GATConv", seed=0)
        assert g.aux.semantics == "att_unit"
        assert g.aux.segmm is not None
        assert g.aux.segmm.edge_ids is not None
        assert g.aux.t_segmm.edge_ids is not None


class TestSegmmDen:
    """Denominator-in-selector: (num, den) from one augmented selector pass
    with a saved-y backward (round-2 VERDICT next-step #2)."""

    def test_num_den_and_grads_match_reference(self):
        import jax
        from fitgnn_tpu.ops.pallas.coo_segmm import segmm_weighted_spmm_den
        rng = np.random.default_rng(11)
        n, e, f = 384, 800, 16
        s = rng.integers(0, n, e, dtype=np.int64)
        r = np.sort(rng.integers(0, n, e, dtype=np.int64))
        unit = np.ones(e, np.float32)
        hyb = build_hybrid(s, r, unit, n, min_block_edges=10 ** 9,
                           use_segmm=True, semantics="att_unit",
                           segmm_group=2)
        w_dyn = jnp.asarray(rng.random(len(hyb.senders)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))

        def loss_k(w, xx):
            num, den = segmm_weighted_spmm_den(hyb.segmm, hyb.t_segmm,
                                               hyb.receivers, w, xx)
            return jnp.sum(num ** 2) + jnp.sum(jnp.cos(den))

        def loss_ref(w, xx):
            num = jax.ops.segment_sum(xx[hyb.senders] * w[:, None],
                                      hyb.receivers, num_segments=n,
                                      indices_are_sorted=True)
            den = jax.ops.segment_sum(w, hyb.receivers, num_segments=n,
                                      indices_are_sorted=True)
            return jnp.sum(num ** 2) + jnp.sum(jnp.cos(den))

        np.testing.assert_allclose(np.asarray(loss_k(w_dyn, x)),
                                   np.asarray(loss_ref(w_dyn, x)), rtol=1e-4)
        dw_k, dx_k = jax.grad(loss_k, argnums=(0, 1))(w_dyn, x)
        dw_r, dx_r = jax.grad(loss_ref, argnums=(0, 1))(w_dyn, x)
        np.testing.assert_allclose(np.asarray(dw_k), np.asarray(dw_r),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dx_k), np.asarray(dx_r),
                                   rtol=1e-4, atol=1e-4)

    def test_gat_layer_with_segmm_den(self, monkeypatch):
        """GATConv tile path with FITGNN_GAT_SEGMM_DEN=1 matches the
        per-edge reference (outputs + grads)."""
        import jax
        from fitgnn_tpu import models
        from fitgnn_tpu.data.synthetic import sbm_graph
        from fitgnn_tpu.graph import build_graph
        from fitgnn_tpu.graph.optimize import build_optimized_graph
        from fitgnn_tpu.models.layers import GATConv
        from fitgnn_tpu.ops import tile_gat
        monkeypatch.setattr(tile_gat, "_SEGMM_DEN", True)
        x, s, r, y = sbm_graph(num_nodes=640, num_classes=4,
                               num_features=16, p_in=0.1, p_out=0.01, seed=7)
        g_plain = build_graph(x, s, r, y=y, node_pad_to=128)
        g_opt, order = build_optimized_graph(x, s, r, y=y,
                                             min_block_edges=8,
                                             layer_name="GATConv", seed=0)
        layer = GATConv(features=16)
        params = layer.init(jax.random.PRNGKey(0), g_plain.x, g_plain)
        out_plain = np.asarray(layer.apply(params, g_plain.x, g_plain))
        out_opt = np.asarray(layer.apply(params, g_opt.x, g_opt))
        np.testing.assert_allclose(out_opt[: len(order)], out_plain[order],
                                   rtol=2e-4, atol=2e-5)

        def loss(p, gg):
            out = layer.apply(p, gg.x, gg)
            return jnp.sum(out[: gg.n_node] ** 2)

        g1 = jax.grad(loss)(params, g_plain)
        g2 = jax.grad(loss)(params, g_opt)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-4)


class TestFillerSlots:
    """Uncovered output block-groups emit zero-weight filler chunks with
    edge_ids == 0; first_slot must never point at them (review round-3)."""

    def _uncovered_group0(self, seed=3):
        # every receiver >= 128 → block-group 0 (group=1) is pure filler,
        # and its chunk precedes all real slots in the stream
        rng = np.random.default_rng(seed)
        n, e = 256, 40
        s = rng.integers(1, n, e, dtype=np.int64)     # senders[0] != 0
        r = np.sort(rng.integers(128, n, e, dtype=np.int64))
        w = np.ones(e, np.float32)
        return n, e, s, r, w

    def test_first_slot_points_at_real_slots(self):
        n, e, s, r, w = self._uncovered_group0()
        m = build_segmm(s, r, w, n, group=1)
        fs = np.asarray(m.first_slot)
        s_all = np.asarray(m.senders)
        # each edge's first_slot must hold that edge's OWN sender row —
        # before the fix fs[0] landed on the group-0 filler (sender 0)
        np.testing.assert_array_equal(s_all[fs[:e]], s)

    def test_den_backward_dw_with_uncovered_group(self):
        from fitgnn_tpu.ops.pallas.coo_segmm import segmm_weighted_spmm_den
        n, e, s, r, w = self._uncovered_group0(seed=5)
        f = 8
        rng = np.random.default_rng(11)
        order_t = np.argsort(s, kind="stable")
        m = build_segmm(s, r, w, n, group=1)
        mt = build_segmm(r[order_t], s[order_t], w[order_t], n, group=1,
                         edge_perm=order_t)
        x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
        wd = jnp.asarray(rng.random(e).astype(np.float32))
        rj = jnp.asarray(r, dtype=jnp.int32)
        sj = jnp.asarray(s, dtype=jnp.int32)

        def loss_k(wv, xx):
            num, den = segmm_weighted_spmm_den(m, mt, rj, wv, xx)
            return jnp.sum(num ** 2) + jnp.sum(den ** 2)

        def loss_ref(wv, xx):
            num = jax.ops.segment_sum(xx[sj] * wv[:, None], rj,
                                      num_segments=n,
                                      indices_are_sorted=True)
            den = jax.ops.segment_sum(wv, rj, num_segments=n,
                                      indices_are_sorted=True)
            return jnp.sum(num ** 2) + jnp.sum(den ** 2)

        np.testing.assert_allclose(np.asarray(loss_k(wd, x)),
                                   np.asarray(loss_ref(wd, x)),
                                   rtol=1e-5)
        dw_k, dx_k = jax.grad(loss_k, argnums=(0, 1))(wd, x)
        dw_r, dx_r = jax.grad(loss_ref, argnums=(0, 1))(wd, x)
        # dw[0] was silently wrong whenever senders[0] != 0 pre-fix
        np.testing.assert_allclose(np.asarray(dw_k), np.asarray(dw_r),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dx_k), np.asarray(dx_r),
                                   rtol=1e-4, atol=1e-5)
