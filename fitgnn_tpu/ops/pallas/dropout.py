"""Fused dropout on the TPU PRNG.

`nn.Dropout` generates its mask with a counter-based PRNG in HBM (mask
materialized, multiple passes); this kernel generates the random bits
in-VMEM with the core's hardware PRNG (`pltpu.prng_random_bits`) and applies
keep/scale in the same pass — one stream over the tensor.  The backward pass
REGENERATES the identical bits from the same seed (deterministic per seed +
grid position), so no mask is stored.

Semantics: keep probability ``1-rate``; kept entries scaled by
``1/(1-rate)`` (inverted dropout, matching `nn.Dropout`).  The random
stream differs from flax's — dropout only needs iid Bernoulli noise, not a
particular stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 2048   # rows per grid step (large blocks amortize per-step cost;
              # 2048·512·2 B = 2 MB in + 2 MB out, double-buffered ≈ 8 MB)


def _kernel(seed_ref, x_ref, o_ref, *, rate: float):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bits = pltpu.prng_random_bits(x_ref.shape)          # uint32
    thresh = jnp.uint32(int(rate * (2 ** 32)))
    keep = pltpu.bitcast(bits, jnp.uint32) >= thresh
    scale = jnp.asarray(1.0 / (1.0 - rate), dtype=x_ref.dtype)
    o_ref[:] = jnp.where(keep, x_ref[:] * scale,
                         jnp.zeros_like(x_ref[:]))


@functools.partial(jax.jit, static_argnames=("rate", "interpret"))
def _apply(seed, x, rate, interpret=False):
    if interpret:
        # CPU fallback with identical semantics (deterministic per seed,
        # same keep/scale rule) — the interpret emulation of the TPU PRNG
        # returns zero bits, so the kernel itself is TPU-only
        key = jax.random.PRNGKey(seed[0].astype(jnp.uint32))
        keep = jax.random.uniform(key, x.shape) >= rate
        return jnp.where(keep, x / jnp.asarray(1.0 - rate, x.dtype),
                         jnp.zeros_like(x))
    n, f = x.shape
    rows = min(ROWS, n)
    grid = (pl.cdiv(n, rows),)
    return pl.pallas_call(
        functools.partial(_kernel, rate=rate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec((rows, f), lambda i, seed: (i, 0))],
            out_specs=pl.BlockSpec((rows, f), lambda i, seed: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n, f), x.dtype),
        interpret=False,
    )(seed, x)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_dropout(x: jnp.ndarray, seed: jnp.ndarray, rate: float):
    """x: (N, F); seed: (1,) int32; returns dropped-out x."""
    return _apply(seed, x, rate, interpret=_use_interpret())


def _fwd(x, seed, rate):
    return fused_dropout(x, seed, rate), seed


def _bwd(rate, seed, g):
    # same seed + grid → identical bits; dropout is linear in x given the
    # mask, so the VJP is the same masked scale applied to g — one pass
    return _apply(seed, g, rate, interpret=_use_interpret()), None


fused_dropout.defvjp(_fwd, _bwd)


def seed_from_rng(rng) -> jnp.ndarray:
    """Derive a (1,) int32 kernel seed from a JAX PRNG key (cheap: one
    scalar draw)."""
    return jax.random.randint(rng, (1,), 0, 2 ** 31 - 1, dtype=jnp.int32)
