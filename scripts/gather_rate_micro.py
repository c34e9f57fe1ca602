"""Micro: XLA random row gather / scatter-add rate vs SOURCE SIZE and width.

vmem_rmw_micro measured 7.0 ns/edge for a random gather whose source was a
4096×128 (2 MB) array — 3× the ~20-24 ns/edge previously measured on the
169k-row bench source at F=512.  If the row rate is a function of the
random-access working-set size (source rows fitting in cache/CMEM), the
straggler path can be restructured around slab-local access.  This micro
maps the surface:

  gather:  y = x[idx]                  (idx unsorted, E=1M)
  scatter: out = segment_sum(y, idx)   (idx unsorted, dest = source size)

for source rows ∈ {4k, 16k, 64k, 169k} × F ∈ {128, 512}, f32.
Protocol: K=6 chained dispatches per config (inputs chain through a decay
multiply so the tunnel result cache cannot serve repeats).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

E = 1_048_576
REPS = 6
SIZES = [4096, 16_384, 65_536, 169_472]
WIDTHS = [128, 512]


def timed(fn, x, idx):
    out = fn(x, idx)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(REPS):
        x = (x * 0.999).astype(x.dtype)
        out = fn(x, idx)
    _ = float(out.reshape(-1)[0])
    return (time.perf_counter() - t0) / REPS


def main():
    rng = np.random.default_rng(int(time.time()) % 99991)
    for f in WIDTHS:
        for n in SIZES:
            x = jnp.asarray(rng.standard_normal((n, f)), jnp.float32)
            idx = jnp.asarray(rng.integers(0, n, E, dtype=np.int32))

            g = jax.jit(lambda x, i: x.at[i].get(mode="promise_in_bounds"))
            dt = timed(g, x, idx)
            print(f"gather  n={n:7d} F={f:3d}: {dt*1e3:7.2f} ms "
                  f"{dt/E*1e9:6.2f} ns/edge", flush=True)

            s = jax.jit(lambda y, i, n=n: jax.ops.segment_sum(
                y, i, num_segments=n))
            y = jnp.asarray(rng.standard_normal((E, f)), jnp.float32)
            out = s(y, idx)
            out.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(REPS):
                y = (y * 0.999).astype(y.dtype)
                out = s(y, idx)
            _ = float(out.reshape(-1)[0])
            dt = (time.perf_counter() - t0) / REPS
            print(f"scatter n={n:7d} F={f:3d}: {dt*1e3:7.2f} ms "
                  f"{dt/E*1e9:6.2f} ns/edge", flush=True)


if __name__ == "__main__":
    main()
