"""Micro: decompose the straggler COO SpMM cost on the current device.

Measures, at bench-like straggler scale (E=229k, N=169k, F=512):
  a) fused  segment_sum(x[s]*w)              — the production path
  b) gather y=x[s]*w alone
  c) sorted segment_sum(y) on materialized y — the scatter share
for f32 and bf16 activations.  Protocol: K sequential dispatches of one
small jitted op with chained inputs + a final host scalar fetch (honest
under the tunnel's (program, inputs) result cache; no fori_loop — large
fused programs take ~10 min to remote-compile).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

N = 169_472
E = 228_762
F = 512
REPS = 10


def timed(fn, chain_idx, *args):
    """Run fn REPS times, feeding the output back into position chain_idx."""
    args = list(args)
    out = fn(*args)
    _ = float(out.reshape(-1)[0])            # drain queue
    t0 = time.perf_counter()
    for _i in range(REPS):
        args[chain_idx] = out
        out = fn(*args)
    _ = float(out.reshape(-1)[0])
    return (time.perf_counter() - t0) / REPS


def main():
    rng = np.random.default_rng(0)
    s = rng.integers(0, N, E, dtype=np.int32)
    r = np.sort(rng.integers(0, N, E, dtype=np.int32))
    w = rng.random(E).astype(np.float32) * 0.1

    for dt in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.standard_normal((N, F)), dtype=dt)
        s_d, r_d = jnp.asarray(s), jnp.asarray(r)
        w_d = jnp.asarray(w, dtype=dt)

        @jax.jit
        def fused(w_, s_, r_, x_):
            out = jax.ops.segment_sum(x_[s_] * w_[:, None], r_,
                                      num_segments=N,
                                      indices_are_sorted=True)
            return (out * 0.35).astype(x_.dtype)

        @jax.jit
        def gather_only(w_, s_, x_):
            y = x_[s_] * w_[:, None]
            return (x_ + 1e-12 * jnp.sum(y)).astype(x_.dtype)

        @jax.jit
        def scatter_only(r_, y_):
            out = jax.ops.segment_sum(y_, r_, num_segments=N,
                                      indices_are_sorted=True)
            return (y_ + 1e-12 * jnp.sum(out)).astype(y_.dtype)

        y0 = (x[s_d] * w_d[:, None]).block_until_ready()

        t = timed(fused, 3, w_d, s_d, r_d, x)
        print(f"{dt.__name__:8s} fused gather+scatter : {t*1e3:7.2f} ms "
              f"({t/E*1e9:5.1f} ns/edge)", flush=True)
        t = timed(gather_only, 2, w_d, s_d, x)
        print(f"{dt.__name__:8s} gather only          : {t*1e3:7.2f} ms "
              f"({t/E*1e9:5.1f} ns/edge)", flush=True)
        t = timed(scatter_only, 1, r_d, y0)
        print(f"{dt.__name__:8s} scatter only         : {t*1e3:7.2f} ms "
              f"({t/E*1e9:5.1f} ns/edge)", flush=True)

    # int8 straggler stream (VERDICT r2 #8): quantized activations with f32
    # accumulation — tests whether cutting gathered-stream bytes below bf16
    # buys anything, given the measured row-rate bound (bf16 gather is only
    # ~1.16x faster than f32 at equal rows)
    x8 = jnp.asarray((rng.standard_normal((N, F)) * 30).astype(np.int8))
    s_d, r_d = jnp.asarray(s), jnp.asarray(r)
    w_d = jnp.asarray(w)

    @jax.jit
    def fused_int8(w_, s_, r_, x8_):
        y = x8_[s_].astype(jnp.float32) * w_[:, None]   # dequant on the fly
        out = jax.ops.segment_sum(y, r_, num_segments=N,
                                  indices_are_sorted=True)
        return (x8_ + (1e-12 * jnp.sum(out)).astype(jnp.int8))

    t = timed(fused_int8, 3, w_d, s_d, r_d, x8)
    print(f"int8     fused gather+scatter : {t*1e3:7.2f} ms "
          f"({t/E*1e9:5.1f} ns/edge)", flush=True)


if __name__ == "__main__":
    main()
