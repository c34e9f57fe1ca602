"""Split gather vs scatter bandwidth measurement (honest under the axon
tunnel: scalar-fetch sync + perturbed inputs between calls)."""

import time
import numpy as np
import jax
import jax.numpy as jnp

N = 131_072
DEG = 8
F = 512
REPS = 50
E = N * DEG


def measure(fn, *arrays):
    """arrays[-1] is perturbed between warm-up and the timed call."""
    v = float(fn(*arrays))
    perturbed = arrays[:-1] + (arrays[-1] * 1.0009,)
    t0 = time.perf_counter()
    v = float(fn(*perturbed))
    return (time.perf_counter() - t0) / REPS, v


def main():
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.integers(0, N, E, dtype=np.int32))
    r = jnp.asarray(np.sort(rng.integers(0, N, E, dtype=np.int32)))
    x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
    msgs = jnp.asarray(rng.standard_normal((E, F)).astype(np.float32))

    @jax.jit
    def gather_loop(s_, x_):
        def body(i, carry):
            xc, acc = carry
            g = xc[s_]
            return (xc + acc * 1e-30, acc + jnp.sum(g))
        _, acc = jax.lax.fori_loop(0, REPS, body, (x_, 0.0))
        return acc

    @jax.jit
    def scatter_sorted(r_, m_):
        def body(i, carry):
            mc, acc = carry
            o = jax.ops.segment_sum(mc, r_, num_segments=N,
                                    indices_are_sorted=True)
            return (mc + acc * 1e-30, acc + jnp.sum(o))
        _, acc = jax.lax.fori_loop(0, REPS, body, (m_, 0.0))
        return acc

    @jax.jit
    def scatter_unsorted(r_, m_):
        def body(i, carry):
            mc, acc = carry
            o = jax.ops.segment_sum(mc, r_, num_segments=N,
                                    indices_are_sorted=False)
            return (mc + acc * 1e-30, acc + jnp.sum(o))
        _, acc = jax.lax.fori_loop(0, REPS, body, (m_, 0.0))
        return acc

    @jax.jit
    def copy_stream(x_):
        def body(i, carry):
            xc, acc = carry
            y = xc * 1.0000001
            return (y, acc + y[0, 0])
        _, acc = jax.lax.fori_loop(0, REPS, body, (x_, 0.0))
        return acc

    for name, fn, args, nbytes in [
            ("stream copy (N,F)", copy_stream, (x,), N * F * 4 * 2),
            ("gather (E,F)", gather_loop, (s, x), E * F * 4),
            ("scatter sorted", scatter_sorted, (r, msgs), E * F * 4),
            ("scatter unsorted", scatter_unsorted, (r, msgs), E * F * 4)]:
        per, v = measure(fn, *args)
        print(f"{name:18s}: {per*1e3:7.2f} ms -> {nbytes/per/1e9:7.1f} GB/s")


if __name__ == "__main__":
    main()
