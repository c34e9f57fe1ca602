"""Coarsening stack tests: partition invariants, algebra, spectral quality."""

import numpy as np
import scipy.sparse as sp
import pytest

from fitgnn_tpu.coarsen import (
    coarsen, METHODS, LapGraph, connected_components,
    coarsening_matrix, coarsen_weights, coarsen_features,
    coarse_labels_and_masks, partition_from_contractions, compose_partitions,
    eigenvalue_errors, rayleigh_preservation,
)
from fitgnn_tpu.data.synthetic import sbm_graph


def sbm_W(n=200, seed=0):
    x, s, r, y = sbm_graph(num_nodes=n, num_classes=4, num_features=8,
                           p_in=0.08, p_out=0.004, seed=seed)
    W = sp.csr_matrix((np.ones(len(s)), (s, r)), shape=(n, n))
    W = W + W.T
    W.data[:] = 1.0
    return W, y


def grid_W(side=12):
    n = side * side
    rows, cols = [], []
    for i in range(side):
        for j in range(side):
            u = i * side + j
            if j + 1 < side:
                rows.append(u), cols.append(u + 1)
            if i + 1 < side:
                rows.append(u), cols.append(u + side)
    W = sp.csr_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    return W + W.T


class TestPartitionAlgebra:
    def test_partition_from_contractions(self):
        parent = partition_from_contractions(6, [np.array([0, 1]),
                                                 np.array([3, 4, 5])])
        # groups by min-representative: {0,1}->0, {2}->1, {3,4,5}->2
        np.testing.assert_array_equal(parent, [0, 0, 1, 2, 2, 2])

    def test_coarsening_matrix_is_partial_isometry(self):
        parent = np.array([0, 0, 1, 2, 2, 2])
        C = coarsening_matrix(parent)
        ctc = (C @ C.T).toarray()
        np.testing.assert_allclose(ctc, np.eye(3), atol=1e-12)

    def test_coarsen_weights_sums_cross_edges(self):
        # path 0-1-2-3; contract {0,1} and {2,3}: one cross edge 1-2
        W = sp.csr_matrix((np.ones(3), ([0, 1, 2], [1, 2, 3])), shape=(4, 4))
        W = W + W.T
        parent = np.array([0, 0, 1, 1])
        Wc = coarsen_weights(W, parent).toarray()
        np.testing.assert_allclose(Wc, [[0, 1], [1, 0]])

    def test_coarsen_features_scaling(self):
        parent = np.array([0, 0, 1])
        X = np.array([[2.0], [4.0], [6.0]])
        Xc = coarsen_features(X, parent)
        np.testing.assert_allclose(Xc, [[6.0 / np.sqrt(2)], [6.0]])

    def test_compose_partitions(self):
        p1 = np.array([0, 0, 1, 2])
        p2 = np.array([0, 0, 1])
        np.testing.assert_array_equal(compose_partitions([p1, p2]),
                                      [0, 0, 0, 1])

    def test_coarse_labels_mixed_dropped(self):
        parent = np.array([0, 0, 1, 1])
        labels = np.array([0, 1, 2, 2])
        mask = np.array([True, True, True, False])
        lab, m = coarse_labels_and_masks(parent, labels, mask, 3)
        assert not m[0]        # mixed classes 0,1 -> dropped
        assert m[1] and lab[1] == 2


class TestCoarsenDriver:
    @pytest.mark.parametrize("method", METHODS)
    def test_reduction_reached_and_partition_valid(self, method):
        W, _ = sbm_W(150)
        res = coarsen(W, r=0.5, method=method, K=8)
        n = res.num_coarse
        assert res.parent.shape == (150,)
        assert res.parent.min() == 0 and res.parent.max() == n - 1
        # every metanode non-empty (exact cover)
        assert len(np.unique(res.parent)) == n
        # reduction should be close to requested (within a level granularity)
        assert n <= 0.7 * 150, f"{method}: only reduced to {n}"
        assert n >= 5

    def test_coarse_graph_connected_on_connected_input(self):
        W = grid_W(10)
        res = coarsen(W, r=0.5, method="variation_neighborhoods", K=8)
        ncomp, _ = sp.csgraph.connected_components(res.Wc, directed=False)
        assert ncomp == 1

    @pytest.mark.parametrize("method", ["variation_neighborhoods",
                                        "heavy_edge", "kron"])
    def test_spectral_quality(self, method):
        W = grid_W(12)
        res = coarsen(W, r=0.5, method=method, K=10)
        err = eigenvalue_errors(W, res.C, kmax=6)
        # bottom nonzero eigenvalues preserved within 80% rel error
        # (greedy 50% reduction; variation methods should be much tighter)
        assert np.all(err[1:] < 0.8), f"{method}: {err}"

    def test_variation_beats_random_partition(self):
        W = grid_W(12)
        n = W.shape[0]
        res = coarsen(W, r=0.5, method="variation_neighborhoods", K=10)
        rng = np.random.default_rng(0)
        # random partition of same size
        rand_parent = rng.integers(0, res.num_coarse, size=n)
        # ensure surjective
        rand_parent[: res.num_coarse] = np.arange(res.num_coarse)
        C_r = coarsening_matrix(rand_parent)
        W_r = coarsen_weights(W, rand_parent)
        err_v = rayleigh_preservation(W, res.C, res.Wc, kmax=6)[1:].mean()
        err_r = rayleigh_preservation(W, C_r, W_r, kmax=6)[1:].mean()
        assert err_v < err_r, (err_v, err_r)

    def test_wc_symmetric_zero_diag(self):
        W, _ = sbm_W(100)
        res = coarsen(W, r=0.4, method="variation_neighborhoods")
        Wc = res.Wc
        assert np.all(Wc.diagonal() == 0)
        assert (Wc != Wc.T).nnz == 0

    def test_connected_components_sorted(self):
        # two components: sizes 3 and 2
        W = sp.csr_matrix(
            (np.ones(3), ([0, 1, 3, ], [1, 2, 4])), shape=(5, 5))
        W = W + W.T
        comps = connected_components(W)
        assert [len(c) for c in comps] == [3, 2]


class TestOptimalMatching:
    def test_optimal_matching_runs(self):
        W = grid_W(6)
        res = coarsen(W, r=0.4, method="heavy_edge", algorithm="optimal")
        assert res.num_coarse < 36


class TestChebyshevSmoother:
    def test_low_pass_property(self):
        """Chebyshev-filtered random vectors concentrate in the low part of
        the spectrum: Rayleigh quotients fall well below the random mean."""
        import scipy.sparse as sp
        from fitgnn_tpu.coarsen.spectral import smoothed_vectors
        rng = np.random.default_rng(0)
        n = 300
        r = rng.integers(0, n, n * 6)
        s = np.where(rng.random(n * 6) < 0.8,
                     (r // 30) * 30 + rng.integers(0, 30, n * 6),
                     rng.integers(0, n, n * 6))
        keep = s != r
        W = sp.csr_matrix((np.ones(keep.sum()), (s[keep], r[keep])),
                          shape=(n, n))
        W = W + W.T
        W.data[:] = 1.0
        g = LapGraph(W)
        lam, _ = np.linalg.eigh(g.L.toarray()), None
        lam = lam[0]
        cut = lam[10]
        X = smoothed_vectors(g, 6, method="Chebychev", lambda_cut=float(cut),
                             seed=0)
        ray = np.einsum("nk,nk->k", X, g.L @ X) / np.maximum(
            np.einsum("nk,nk->k", X, X), 1e-30)
        raw = np.random.default_rng(0).standard_normal((n, 6)) / np.sqrt(n)
        ray_raw = np.einsum("nk,nk->k", raw, g.L @ raw) / np.einsum(
            "nk,nk->k", raw, raw)
        assert ray.mean() < 0.25 * ray_raw.mean()
        assert ray.mean() < 2.5 * cut
