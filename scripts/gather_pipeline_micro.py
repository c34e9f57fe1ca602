"""Can a Pallas L-deep async-DMA pipeline beat XLA's random row gather?

The straggler path is gather-bound (~24 ns/row bf16, ~28 f32 — row-rate,
not byte, limited).  This micro issues per-row HBM→VMEM DMAs with an
L-slot semaphore ring and measures achieved rows/s vs the XLA gather on
the same indices.  Reps run inside one program (fori_loop) — the tunnel
adds ~2-3 ms per dispatch.
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 169_472
E = 32_768          # SMEM-friendly index count (128 KB int32)
F = 512
C = 2048            # rows per grid step
L = 16              # DMA pipeline depth
REPS = 24


def _kernel(idx_ref, x_ref, o_ref, sem):
    k = pl.program_id(0)

    def copy(j):
        row = idx_ref[k * C + j]
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(row, 1), :],
            o_ref.at[pl.ds(j, 1), :],
            sem.at[j % L])

    def body(j, _):
        @pl.when(j >= L)
        def _():
            copy(j - L).wait()
        copy(j).start()
        return 0

    jax.lax.fori_loop(0, C, body, 0)

    def tail(t, _):
        copy(C - L + t).wait()
        return 0

    jax.lax.fori_loop(0, L, tail, 0)


@jax.jit
def pallas_gather(idx, x):
    return pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(E // C,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((C, F), lambda k, idx: (k, 0)),
            scratch_shapes=[pltpu.SemaphoreType.DMA((L,))],
        ),
        out_shape=jax.ShapeDtypeStruct((E, F), x.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, x)


def timed_loop(step, x):
    @jax.jit
    def loop(x_):
        return jax.lax.fori_loop(0, REPS, lambda i, v: step(v), x_)

    out = loop(x)
    _ = float(out.reshape(-1)[0])
    t0 = time.perf_counter()
    out = loop(out)
    _ = float(out.reshape(-1)[0])
    return (time.perf_counter() - t0) / REPS


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, E, dtype=np.int32))
    for dt in (jnp.bfloat16, jnp.float32):
        x = jnp.asarray(rng.standard_normal((N, F)), dtype=dt)

        def xla_step(x_):
            y = x_[idx]
            return x_ + (1e-20 * jnp.sum(y[:1])).astype(x_.dtype)

        def pallas_step(x_):
            y = pallas_gather(idx, x_)
            return x_ + (1e-20 * jnp.sum(y[:1])).astype(x_.dtype)

        t = timed_loop(xla_step, x)
        print(f"{dt.__name__:8s} XLA gather   : {t*1e3:6.2f} ms  "
              f"{t/E*1e9:5.1f} ns/row  {E*F*x.dtype.itemsize/t/1e9:6.0f} GB/s",
              flush=True)
        t = timed_loop(pallas_step, x)
        print(f"{dt.__name__:8s} pallas L={L:2d}  : {t*1e3:6.2f} ms  "
              f"{t/E*1e9:5.1f} ns/row  {E*F*x.dtype.itemsize/t/1e9:6.0f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
