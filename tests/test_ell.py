"""ELL SpMM correctness vs dense oracle + gradient."""

import numpy as np
import jax
import jax.numpy as jnp

from fitgnn_tpu.ops.ell_spmm import build_ell, ell_spmm


def random_coo(rng, n, e):
    s = rng.integers(0, n, e).astype(np.int64)
    r = rng.integers(0, n, e).astype(np.int64)
    w = rng.normal(size=e).astype(np.float32)
    return s, r, w


def dense(s, r, w, n):
    a = np.zeros((n, n), dtype=np.float32)
    np.add.at(a, (r, s), w)
    return a


class TestEll:
    def test_matches_dense(self, rng):
        n, e, f = 300, 2500, 32
        s, r, w = random_coo(rng, n, e)
        x = rng.normal(size=(n, f)).astype(np.float32)
        m = build_ell(s, r, w, n)
        out = np.asarray(ell_spmm(m, jnp.asarray(x)))
        np.testing.assert_allclose(out, dense(s, r, w, n) @ x,
                                   rtol=1e-3, atol=1e-3)

    def test_power_law_degrees(self, rng):
        # skewed degrees exercise multiple buckets
        n, f = 200, 16
        hubs = rng.integers(0, 5, 3000)          # 5 hub receivers
        tail = rng.integers(0, n, 1000)
        r = np.concatenate([hubs, tail]).astype(np.int64)
        s = rng.integers(0, n, len(r)).astype(np.int64)
        w = rng.normal(size=len(r)).astype(np.float32)
        x = rng.normal(size=(n, f)).astype(np.float32)
        m = build_ell(s, r, w, n)
        assert len(m.buckets) >= 3
        out = np.asarray(ell_spmm(m, jnp.asarray(x)))
        np.testing.assert_allclose(out, dense(s, r, w, n) @ x,
                                   rtol=1e-3, atol=1e-2)

    def test_gradient(self, rng):
        n, e, f = 100, 600, 8
        s, r, w = random_coo(rng, n, e)
        x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
        m = build_ell(s, r, w, n)
        a = jnp.asarray(dense(s, r, w, n))
        g1 = jax.grad(lambda xx: jnp.sum(ell_spmm(m, xx) ** 2))(x)
        g2 = jax.grad(lambda xx: jnp.sum((a @ xx) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-3, atol=1e-3)

    def test_isolated_nodes_zero(self, rng):
        n, f = 50, 4
        s = np.array([0, 1], dtype=np.int64)
        r = np.array([2, 2], dtype=np.int64)
        w = np.ones(2, dtype=np.float32)
        m = build_ell(s, r, w, n)
        out = np.asarray(ell_spmm(m, jnp.asarray(
            np.ones((n, f), dtype=np.float32))))
        assert np.allclose(out[2], 2.0)
        assert np.allclose(out[3:], 0.0)
