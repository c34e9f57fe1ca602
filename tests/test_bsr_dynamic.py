"""Dynamic-block BSR apply: forward/grad parity vs the dense einsum +
segment-sum reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from fitgnn_tpu.ops.pallas.bsr_dynamic import build_dyn_plan, bsr_spmm_dyn


def _setup(seed=0, nb=5, k=11, b=128, f=64):
    rng = np.random.default_rng(seed)
    # random tile list sorted by row, with every row covered
    rows = np.sort(np.concatenate([np.arange(nb),
                                   rng.integers(0, nb, k - nb)]))
    cols = rng.integers(0, nb, k)
    plan = build_dyn_plan(rows, cols, nb)
    blocks = jnp.asarray(rng.standard_normal((k, b, b)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((nb * b, f)).astype(np.float32))
    return (jnp.asarray(rows, dtype=jnp.int32),
            jnp.asarray(cols, dtype=jnp.int32), plan, blocks, x, nb, b)


def _ref(rows, cols, blocks, x, nb, b):
    xb = x.reshape(nb, b, -1)[cols]
    prod = jnp.einsum("kij,kjf->kif", blocks, xb)
    return jax.ops.segment_sum(prod, rows, num_segments=nb,
                               indices_are_sorted=True).reshape(x.shape)


def test_forward_matches_einsum():
    rows, cols, plan, blocks, x, nb, b = _setup()
    out = bsr_spmm_dyn(rows, cols, plan, blocks, x)
    ref = _ref(rows, cols, blocks, x, nb, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_grads_match_autodiff():
    rows, cols, plan, blocks, x, nb, b = _setup(seed=3)
    tgt = jnp.asarray(np.random.default_rng(4).standard_normal(
        x.shape).astype(np.float32))

    def loss_k(bl, xx):
        return jnp.sum((bsr_spmm_dyn(rows, cols, plan, bl, xx) - tgt) ** 2)

    def loss_r(bl, xx):
        return jnp.sum((_ref(rows, cols, bl, xx, nb, b) - tgt) ** 2)

    db_k, dx_k = jax.grad(loss_k, argnums=(0, 1))(blocks, x)
    db_r, dx_r = jax.grad(loss_r, argnums=(0, 1))(blocks, x)
    np.testing.assert_allclose(np.asarray(db_k), np.asarray(db_r),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dx_k), np.asarray(dx_r),
                               rtol=1e-4, atol=1e-3)


def test_uncovered_transpose_blocks_are_zero():
    # a column block that never appears must come back zero in dx
    rng = np.random.default_rng(7)
    nb, b, f = 4, 128, 32
    rows = np.array([0, 1, 2, 3])
    cols = np.array([0, 0, 1, 2])        # col block 3 never referenced
    plan = build_dyn_plan(rows, cols, nb)
    blocks = jnp.asarray(rng.standard_normal((4, b, b)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((nb * b, f)).astype(np.float32))

    def loss(xx):
        return jnp.sum(bsr_spmm_dyn(jnp.asarray(rows, dtype=jnp.int32),
                                    jnp.asarray(cols, dtype=jnp.int32),
                                    plan, blocks, xx))

    dx = jax.grad(loss)(x)
    assert float(jnp.abs(dx[3 * b:]).sum()) == 0.0
