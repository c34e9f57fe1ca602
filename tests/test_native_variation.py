"""C++ variation-coarsening core vs the Python oracle."""

import time

import numpy as np
import scipy.sparse as sp
import pytest

from fitgnn_tpu.coarsen import (
    coarsen, LapGraph, coarsening_matrix, eigenvalue_errors,
    partition_from_contractions,
)
from fitgnn_tpu.coarsen.spectral import variation_basis
from fitgnn_tpu.coarsen.variation import contract_variation_linear
from fitgnn_tpu.coarsen.native_variation import (
    native_available, variation_neighborhoods_native,
)


def random_W(n, deg, seed=0):
    rng = np.random.default_rng(seed)
    e = n * deg
    s, r = rng.integers(0, n, e), rng.integers(0, n, e)
    keep = s != r
    W = sp.csr_matrix((np.ones(keep.sum()), (s[keep], r[keep])),
                      shape=(n, n))
    W = W + W.T
    W.data[:] = 1.0
    return W


@pytest.mark.skipif(not native_available(), reason="native build failed")
class TestNativeVariation:
    def test_partition_valid_and_reduces(self):
        W = random_W(800, 6)
        g = LapGraph(W)
        A = variation_basis(g, 10)
        parent = variation_neighborhoods_native(g, A, 0.5)
        assert parent is not None
        k = parent.max() + 1
        assert len(np.unique(parent)) == k
        assert k <= 0.62 * 800
        assert k >= 0.3 * 800

    def test_quality_matches_python(self):
        """Spectral quality of the native partition ≈ the Python oracle's."""
        W = random_W(600, 6)
        g = LapGraph(W)
        A = variation_basis(g, 10)
        parent_n = variation_neighborhoods_native(g, A, 0.5)
        sets_p = contract_variation_linear(g, A, 0.5, mode="neighborhoods")
        parent_p = partition_from_contractions(600, sets_p)
        err_n = eigenvalue_errors(W, coarsening_matrix(parent_n), kmax=6)
        err_p = eigenvalue_errors(W, coarsening_matrix(parent_p), kmax=6)
        # same algorithm, different float details: quality within 2x + slack
        assert err_n[1:].mean() < max(2.0 * err_p[1:].mean(), 0.3), \
            (err_n, err_p)

    def test_speedup_over_python(self):
        W = random_W(4000, 6)
        g = LapGraph(W)
        A = variation_basis(g, 10)
        t0 = time.perf_counter()
        variation_neighborhoods_native(g, A, 0.5)
        t_native = time.perf_counter() - t0
        t0 = time.perf_counter()
        contract_variation_linear(g, A, 0.5, mode="neighborhoods")
        t_py = time.perf_counter() - t0
        assert t_native < t_py, (t_native, t_py)

    def test_driver_uses_native_for_large(self):
        W = random_W(5000, 5, seed=1)
        res = coarsen(W, r=0.5, method="variation_neighborhoods", K=8)
        assert res.num_coarse <= 0.62 * 5000
        assert len(np.unique(res.parent)) == res.num_coarse
