"""Kernel-vs-dense-oracle tests for segment ops, SpMM, SDDMM (SURVEY §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fitgnn_tpu.ops import (
    segment_sum, segment_mean, segment_max, segment_softmax,
    spmm_coo, sddmm_dot, gather_concat_score,
)
from fitgnn_tpu.ops.pallas.bsr_spmm import build_bsr, bsr_spmm


def random_coo(rng, n, e):
    senders = rng.integers(0, n, size=e).astype(np.int32)
    receivers = np.sort(rng.integers(0, n, size=e).astype(np.int32))
    weight = rng.normal(size=e).astype(np.float32)
    return senders, receivers, weight


def dense_adj(senders, receivers, weight, n):
    a = np.zeros((n, n), dtype=np.float32)
    np.add.at(a, (receivers, senders), weight)
    return a


class TestSegmentOps:
    def test_segment_sum_matches_numpy(self, rng):
        ids = np.sort(rng.integers(0, 10, size=100).astype(np.int32))
        data = rng.normal(size=(100, 4)).astype(np.float32)
        out = segment_sum(jnp.asarray(data), jnp.asarray(ids), 10)
        expect = np.zeros((10, 4), dtype=np.float32)
        np.add.at(expect, ids, data)
        np.testing.assert_allclose(out, expect, rtol=1e-5)

    def test_segment_mean_with_mask(self, rng):
        ids = np.sort(rng.integers(0, 5, size=50).astype(np.int32))
        data = rng.normal(size=(50, 3)).astype(np.float32)
        mask = rng.random(50) > 0.3
        out = np.asarray(segment_mean(jnp.asarray(data), jnp.asarray(ids), 5,
                                      mask=jnp.asarray(mask)))
        for s in range(5):
            sel = (ids == s) & mask
            if sel.sum():
                np.testing.assert_allclose(out[s], data[sel].mean(0),
                                           rtol=1e-4, atol=1e-5)

    def test_segment_max_empty_segment_is_zero(self):
        ids = jnp.asarray(np.array([0, 0, 2], dtype=np.int32))
        data = jnp.asarray(np.array([[1.0], [5.0], [-2.0]], dtype=np.float32))
        out = np.asarray(segment_max(data, ids, 4))
        np.testing.assert_allclose(out[:, 0], [5.0, 0.0, -2.0, 0.0])

    def test_segment_softmax_sums_to_one(self, rng):
        ids = np.sort(rng.integers(0, 8, size=64).astype(np.int32))
        logits = rng.normal(size=64).astype(np.float32)
        mask = np.arange(64) < 60
        p = np.asarray(segment_softmax(jnp.asarray(logits), jnp.asarray(ids), 8,
                                       mask=jnp.asarray(mask)))
        assert np.all(p[~mask] == 0)
        for s in np.unique(ids[mask]):
            np.testing.assert_allclose(p[(ids == s) & mask].sum(), 1.0, rtol=1e-5)

    def test_segment_softmax_matches_dense(self, rng):
        ids = np.sort(rng.integers(0, 4, size=32).astype(np.int32))
        logits = rng.normal(size=32).astype(np.float32) * 10
        p = np.asarray(segment_softmax(jnp.asarray(logits), jnp.asarray(ids), 4))
        for s in np.unique(ids):
            sel = ids == s
            expect = np.exp(logits[sel] - logits[sel].max())
            expect /= expect.sum()
            np.testing.assert_allclose(p[sel], expect, rtol=1e-5)


class TestSpMM:
    def test_spmm_coo_matches_dense(self, rng):
        n, e, f = 50, 200, 16
        s, r, w = random_coo(rng, n, e)
        x = rng.normal(size=(n, f)).astype(np.float32)
        out = np.asarray(spmm_coo(jnp.asarray(w), jnp.asarray(s), jnp.asarray(r),
                                  jnp.asarray(x), n))
        expect = dense_adj(s, r, w, n) @ x
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)

    def test_spmm_grad_matches_dense(self, rng):
        n, e, f = 20, 60, 8
        s, r, w = random_coo(rng, n, e)
        x = rng.normal(size=(n, f)).astype(np.float32)
        a = dense_adj(s, r, w, n)

        def loss_sparse(xx):
            return jnp.sum(spmm_coo(jnp.asarray(w), jnp.asarray(s),
                                    jnp.asarray(r), xx, n) ** 2)

        def loss_dense(xx):
            return jnp.sum((jnp.asarray(a) @ xx) ** 2)

        g1 = jax.grad(loss_sparse)(jnp.asarray(x))
        g2 = jax.grad(loss_dense)(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-4)


class TestBsrSpMM:
    @pytest.mark.parametrize("n,e,f", [(256, 2000, 128), (384, 5000, 256)])
    def test_bsr_matches_dense(self, rng, n, e, f):
        s, r, w = random_coo(rng, n, e)
        x = rng.normal(size=(n, f)).astype(np.float32)
        bsr = build_bsr(s, r, w, n)
        out = np.asarray(bsr_spmm(bsr, jnp.asarray(x)))
        expect = dense_adj(s, r, w, n) @ x
        np.testing.assert_allclose(out, expect, rtol=1e-3, atol=1e-3)

    def test_bsr_grad_matches_dense(self, rng):
        n, e, f = 256, 1500, 128
        s, r, w = random_coo(rng, n, e)
        x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
        a = jnp.asarray(dense_adj(s, r, w, n))
        bsr = build_bsr(s, r, w, n)
        g1 = jax.grad(lambda xx: jnp.sum(bsr_spmm(bsr, xx) ** 2))(x)
        g2 = jax.grad(lambda xx: jnp.sum((a @ xx) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-3, atol=1e-3)


class TestSDDMM:
    def test_sddmm_dot_matches_dense(self, rng):
        n, e, f = 30, 100, 12
        s, r, _ = random_coo(rng, n, e)
        a = rng.normal(size=(n, f)).astype(np.float32)
        b = rng.normal(size=(n, f)).astype(np.float32)
        out = np.asarray(sddmm_dot(jnp.asarray(s), jnp.asarray(r),
                                   jnp.asarray(a), jnp.asarray(b)))
        expect = (a[s] * b[r]).sum(-1)
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)

    def test_gather_concat_score(self, rng):
        n, e, h = 10, 40, 4
        s, r, _ = random_coo(rng, n, e)
        sa = rng.normal(size=(n, h)).astype(np.float32)
        sb = rng.normal(size=(n, h)).astype(np.float32)
        out = np.asarray(gather_concat_score(jnp.asarray(s), jnp.asarray(r),
                                             jnp.asarray(sa), jnp.asarray(sb)))
        np.testing.assert_allclose(out, sa[s] + sb[r], rtol=1e-5)


class TestDenseSmallSpmm:
    """The N<=FITGNN_DENSE_SPMM_N dense-adjacency branch of spmm_coo must
    be exactly the segment path's math (flagship small-bucket Gs shapes)."""

    def test_dense_branch_matches_segment_path(self, rng):
        import importlib
        spmm_mod = importlib.import_module("fitgnn_tpu.ops.spmm")
        n, e, f = 40, 256, 32
        s, r, w = random_coo(rng, n, e)
        x = rng.normal(size=(n, f)).astype(np.float32)
        args = (jnp.asarray(w), jnp.asarray(s), jnp.asarray(r),
                jnp.asarray(x), n)
        old = spmm_mod.DENSE_SPMM_MAX_N
        try:
            spmm_mod.DENSE_SPMM_MAX_N = 128
            dense = np.asarray(spmm_coo(*args))
            spmm_mod.DENSE_SPMM_MAX_N = 0
            seg = np.asarray(spmm_coo(*args))
        finally:
            spmm_mod.DENSE_SPMM_MAX_N = old
        np.testing.assert_allclose(dense, seg, rtol=1e-4, atol=1e-4)

    def test_dense_branch_under_vmap(self, rng):
        """Batched subgraphs (the vmapped Gs forward) hit the same branch
        and batch the adjacency build + matmul."""
        S, n, e, f = 5, 24, 64, 8
        xs, ss, rs_, ws = [], [], [], []
        for _ in range(S):
            s, r, w = random_coo(rng, n, e)
            ss.append(s); rs_.append(r); ws.append(w)
            xs.append(rng.normal(size=(n, f)).astype(np.float32))
        ss, rs_, ws, xs = map(np.stack, (ss, rs_, ws, xs))
        out = jax.vmap(lambda w, s, r, x: spmm_coo(w, s, r, x, n))(
            jnp.asarray(ws), jnp.asarray(ss), jnp.asarray(rs_),
            jnp.asarray(xs))
        for i in range(S):
            expect = dense_adj(ss[i], rs_[i], ws[i], n) @ xs[i]
            np.testing.assert_allclose(np.asarray(out)[i], expect,
                                       rtol=1e-4, atol=1e-4)
