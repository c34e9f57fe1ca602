"""Hybrid BCSR+COO SpMM correctness + sparsifier/quality additions."""

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

from fitgnn_tpu.ops.hybrid_spmm import build_hybrid, hybrid_spmm
from fitgnn_tpu.coarsen.sparsify import graph_sparsify
from fitgnn_tpu.coarsen.quality import subspace_angles
from fitgnn_tpu.coarsen import coarsen, LapGraph


def community_coo(rng, n=512, deg=12, block=128, internal=0.8):
    e = n * deg
    receivers = np.sort(rng.integers(0, n, e).astype(np.int64))
    comm = receivers // block
    s_in = comm * block + rng.integers(0, block, e)
    s_out = rng.integers(0, n, e)
    senders = np.where(rng.random(e) < internal, s_in, s_out).astype(np.int64)
    w = rng.normal(size=e).astype(np.float32)
    return senders, receivers, w


class TestHybrid:
    def test_matches_dense(self, rng):
        n, f = 512, 128
        s, r, w = community_coo(rng, n)
        x = rng.normal(size=(n, f)).astype(np.float32)
        h = build_hybrid(s, r, w, n, min_block_edges=50)
        assert h.bsr is not None, "expected dense tiles with internal=0.8"
        assert h.num_coo_edges < len(s)
        out = np.asarray(hybrid_spmm(h, jnp.asarray(x)))
        a = np.zeros((n, n), dtype=np.float32)
        np.add.at(a, (r, s), w)
        np.testing.assert_allclose(out, a @ x, rtol=1e-3, atol=1e-3)

    def test_all_coo_when_sparse(self, rng):
        n, f = 512, 64
        s = rng.integers(0, n, 600).astype(np.int64)
        r = np.sort(rng.integers(0, n, 600).astype(np.int64))
        w = rng.normal(size=600).astype(np.float32)
        h = build_hybrid(s, r, w, n, min_block_edges=150)
        assert h.bsr is None
        out = np.asarray(hybrid_spmm(h, jnp.asarray(
            rng.normal(size=(n, f)).astype(np.float32))))
        assert out.shape == (n, f)

    def test_gradient_matches_dense(self, rng):
        n, f = 256, 128
        s, r, w = community_coo(rng, n, deg=10, internal=0.9)
        x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
        h = build_hybrid(s, r, w, n, min_block_edges=30)
        assert h.bsr is not None
        a = np.zeros((n, n), dtype=np.float32)
        np.add.at(a, (r, s), w)
        a = jnp.asarray(a)
        g1 = jax.grad(lambda xx: jnp.sum(hybrid_spmm(h, xx) ** 2))(x)
        g2 = jax.grad(lambda xx: jnp.sum((a @ xx) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-3, atol=1e-2)

    def test_gcnconv_uses_hybrid(self, rng):
        """GCNConv with g.aux set must equal GCNConv without it."""
        from fitgnn_tpu.graph import build_graph
        from fitgnn_tpu.models import GCNConv
        n = 256
        s, r, w = community_coo(rng, n, deg=8)
        x = rng.normal(size=(n, 128)).astype(np.float32)
        g = build_graph(x, s.astype(np.int32), r.astype(np.int32),
                        node_pad_to=128)
        h = build_hybrid(np.asarray(g.senders), np.asarray(g.receivers),
                         np.asarray(g.edge_weight), g.num_nodes_padded,
                         min_block_edges=20)
        g_aux = g._replace(aux=h)
        layer = GCNConv(features=64)
        params = layer.init(jax.random.PRNGKey(0), g.x, g)
        out_plain = np.asarray(layer.apply(params, g.x, g))
        out_hybrid = np.asarray(layer.apply(params, g_aux.x, g_aux))
        np.testing.assert_allclose(out_hybrid, out_plain, rtol=1e-3,
                                   atol=1e-3)


class TestSparsify:
    def test_reduces_edges_keeps_spectrum(self, rng):
        # dense random graph (sparsification only pays when m >> n log n)
        n = 200
        a = (rng.random((n, n)) < 0.5).astype(np.float64)
        W = sp.csr_matrix(np.triu(a, 1))
        W = W + W.T
        Ws = graph_sparsify(W, epsilon=1.0, seed=0)
        assert Ws.nnz < W.nnz
        l1 = np.linalg.eigvalsh(sp.csgraph.laplacian(W).toarray())
        l2 = np.linalg.eigvalsh(sp.csgraph.laplacian(Ws).toarray())
        # leading eigenvalues preserved within 50% (loose JL sketch)
        sel = l1 > 1e-8
        rel = np.abs(l1[sel] - l2[sel]) / l1[sel]
        assert np.median(rel) < 0.5


class TestSubspaceAngles:
    def test_zero_for_identity_coarsening(self):
        W = sp.csr_matrix(
            (np.ones(3), ([0, 1, 2], [1, 2, 3])), shape=(4, 4))
        W = W + W.T
        from fitgnn_tpu.coarsen import coarsening_matrix
        C = coarsening_matrix(np.arange(4))
        errs = subspace_angles(W, C, kmax=3)
        np.testing.assert_allclose(errs, 0.0, atol=1e-8)


class TestTileGroup:
    """Grouped BSR kernel (multiple tiles per grid step) must be exact."""

    def test_grouped_matches_dense(self, rng):
        n, f = 512, 128
        s, r, w = community_coo(rng, n)
        x = rng.normal(size=(n, f)).astype(np.float32)
        a = np.zeros((n, n), dtype=np.float32)
        np.add.at(a, (r, s), w)
        want = a @ x
        for group in (2, 4):
            h = build_hybrid(s, r, w, n, min_block_edges=50,
                             tile_group=group)
            assert h.bsr is not None
            assert h.bsr.group == group
            assert h.bsr.blocks.shape[0] % group == 0
            out = np.asarray(hybrid_spmm(h, jnp.asarray(x)))
            np.testing.assert_allclose(out, want, rtol=1e-3, atol=1e-3)

    def test_grouped_gradient(self, rng):
        n, f = 256, 128
        s, r, w = community_coo(rng, n, deg=10, internal=0.9)
        x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
        h = build_hybrid(s, r, w, n, min_block_edges=30, tile_group=2)
        assert h.bsr is not None
        a = np.zeros((n, n), dtype=np.float32)
        np.add.at(a, (r, s), w)
        a = jnp.asarray(a)
        g1 = jax.grad(lambda xx: jnp.sum(hybrid_spmm(h, xx) ** 2))(x)
        g2 = jax.grad(lambda xx: jnp.sum((a @ xx) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=2e-3, atol=2e-3)

    def test_grouped_uneven_rows(self, rng):
        # rows with 1 tile force zero-padding; empty block-rows force fillers
        n, f = 1024, 64
        s = rng.integers(0, 256, 4000).astype(np.int64)   # only rows 0-1 busy
        r = rng.integers(0, 256, 4000).astype(np.int64)
        w = rng.normal(size=4000).astype(np.float32)
        x = rng.normal(size=(n, f)).astype(np.float32)
        a = np.zeros((n, n), dtype=np.float32)
        np.add.at(a, (r, s), w)
        h = build_hybrid(s, r, w, n, min_block_edges=10, tile_group=4)
        assert h.bsr is not None
        out = np.asarray(hybrid_spmm(h, jnp.asarray(x)))
        np.testing.assert_allclose(out, a @ x, rtol=1e-3, atol=1e-3)


class TestTileBlockSize:
    """256-edge tiles (multi-MXU-tile blocks) must be exact, alone and
    combined with grouping."""

    def test_block256_matches_dense(self, rng):
        n, f = 1024, 128
        s, r, w = community_coo(rng, n, block=256, internal=0.85)
        x = rng.normal(size=(n, f)).astype(np.float32)
        a = np.zeros((n, n), dtype=np.float32)
        np.add.at(a, (r, s), w)
        h = build_hybrid(s, r, w, n, min_block_edges=50, block=256)
        assert h.bsr is not None and h.bsr.block == 256
        out = np.asarray(hybrid_spmm(h, jnp.asarray(x)))
        np.testing.assert_allclose(out, a @ x, rtol=1e-3, atol=1e-3)
        g1 = jax.grad(lambda xx: jnp.sum(hybrid_spmm(h, xx) ** 2))(
            jnp.asarray(x))
        g2 = jax.grad(lambda xx: jnp.sum((jnp.asarray(a) @ xx) ** 2))(
            jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=2e-3, atol=2e-3)

    def test_block256_grouped(self, rng):
        n, f = 1024, 64
        s, r, w = community_coo(rng, n, block=256, internal=0.85)
        x = rng.normal(size=(n, f)).astype(np.float32)
        a = np.zeros((n, n), dtype=np.float32)
        np.add.at(a, (r, s), w)
        h = build_hybrid(s, r, w, n, min_block_edges=50, block=256,
                         tile_group=2)
        assert h.bsr is not None
        out = np.asarray(hybrid_spmm(h, jnp.asarray(x)))
        np.testing.assert_allclose(out, a @ x, rtol=1e-3, atol=1e-3)


class TestEinsumTiles:
    """XLA batched-einsum tile path must be exact, incl. gradients and
    empty block-rows (no filler tiles in this mode)."""

    def test_einsum_matches_dense(self, rng):
        n, f = 512, 128
        s, r, w = community_coo(rng, n)
        x = rng.normal(size=(n, f)).astype(np.float32)
        a = np.zeros((n, n), dtype=np.float32)
        np.add.at(a, (r, s), w)
        h = build_hybrid(s, r, w, n, min_block_edges=4,
                         use_einsum_tiles=True)
        assert h.bsr is not None and h.bsr.einsum
        out = np.asarray(hybrid_spmm(h, jnp.asarray(x)))
        np.testing.assert_allclose(out, a @ x, rtol=1e-3, atol=1e-3)

    def test_einsum_gradient(self, rng):
        n, f = 256, 128
        s, r, w = community_coo(rng, n, deg=10, internal=0.9)
        x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
        h = build_hybrid(s, r, w, n, min_block_edges=4,
                         use_einsum_tiles=True)
        assert h.bsr is not None
        a = np.zeros((n, n), dtype=np.float32)
        np.add.at(a, (r, s), w)
        a = jnp.asarray(a)
        g1 = jax.grad(lambda xx: jnp.sum(hybrid_spmm(h, xx) ** 2))(x)
        g2 = jax.grad(lambda xx: jnp.sum((a @ xx) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=2e-3, atol=2e-3)

    def test_einsum_empty_rows(self, rng):
        # busy rows 0-1 only: empty block-rows must come out exactly zero
        n, f = 1024, 64
        s = rng.integers(0, 256, 4000).astype(np.int64)
        r = rng.integers(0, 256, 4000).astype(np.int64)
        w = rng.normal(size=4000).astype(np.float32)
        x = rng.normal(size=(n, f)).astype(np.float32)
        a = np.zeros((n, n), dtype=np.float32)
        np.add.at(a, (r, s), w)
        h = build_hybrid(s, r, w, n, min_block_edges=10,
                         use_einsum_tiles=True)
        assert h.bsr is not None
        out = np.asarray(hybrid_spmm(h, jnp.asarray(x)))
        np.testing.assert_allclose(out, a @ x, rtol=1e-3, atol=1e-3)
        assert np.all(out[256:] == 0.0)


class TestDiagKernel:
    """The Pallas diag-run split (use_diag + diag_r): forward and gradient
    must match the single-structure hybrid (round-3 roofline attack —
    R contiguous diagonal blocks per grid step, fused init-accumulate)."""

    def _build(self, rng, diag_r):
        n, f = 512, 64
        s, r, w = community_coo(rng, n)
        x = rng.normal(size=(n, f)).astype(np.float32)
        h = build_hybrid(s, r, w, n, min_block_edges=50, use_diag=True,
                         diag_r=diag_r)
        assert h.diag_blocks is not None
        return h, s, r, w, x

    def test_diag_kernel_matches_dense(self, rng):
        h, s, r, w, x = self._build(rng, diag_r=2)
        assert h.diag_r == 2
        out = np.asarray(hybrid_spmm(h, jnp.asarray(x)))
        a = np.zeros((512, 512), dtype=np.float32)
        np.add.at(a, (r, s), w)
        np.testing.assert_allclose(out, a @ x, rtol=1e-3, atol=1e-3)

    def test_diag_kernel_gradient_matches_einsum_path(self, rng):
        h2, s, r, w, x = self._build(rng, diag_r=2)
        h0 = build_hybrid(s, r, w, 512, min_block_edges=50, use_diag=True,
                          diag_r=0)  # XLA einsum diag path
        xj = jnp.asarray(x)

        def loss(hh, v):
            return jnp.sum(hybrid_spmm(hh, v) ** 2)

        g2 = np.asarray(jax.grad(lambda v: loss(h2, v))(xj))
        g0 = np.asarray(jax.grad(lambda v: loss(h0, v))(xj))
        np.testing.assert_allclose(g2, g0, rtol=1e-3, atol=1e-3)

    def test_auto_run_length(self, rng):
        h, *_ = self._build(rng, diag_r=None)
        assert h.diag_r >= 1 and (512 // 128) % h.diag_r == 0
