"""Micro: XLA gather MODE comparison — plain ``x[idx]`` vs
``x.at[idx].get(mode='promise_in_bounds')`` vs the sorted-indices hint.

gather_rate_micro showed promise_in_bounds gathers at 74-337 ns/edge on
small sources where a plain ``slab[idx]`` measured 7 ns/edge
(vmem_rmw_micro) — if that holds at production scale the ``_take_rows``
helper in the GAT straggler path is pessimizing the hot loop it was
meant to speed up.  This micro times the same (source, idx) under each
mode at n ∈ {4096, 169472} × F ∈ {128, 512}, unsorted and sorted idx.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

E = 1_048_576
REPS = 6


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
    modes = {
        "plain       ": jax.jit(lambda x, i: x[i]),
        "promise     ": jax.jit(lambda x, i: x.at[i].get(
            mode="promise_in_bounds")),
        "promise+sort": jax.jit(lambda x, i: x.at[i].get(
            mode="promise_in_bounds", indices_are_sorted=True)),
        "take/clip   ": jax.jit(lambda x, i: jnp.take(x, i, axis=0,
                                                      mode="clip")),
    }
    for f in (128, 512):
        for n in (4096, 169_472):
            x = jnp.asarray(rng.standard_normal((n, f)), jnp.float32)
            idx_u = jnp.asarray(rng.integers(0, n, E, dtype=np.int32))
            idx_s = jnp.sort(idx_u)
            for name, fn in modes.items():
                srt = name == "promise+sort"
                dt = timed(fn, x, idx_s if srt else idx_u)
                print(f"{name} n={n:7d} F={f:3d}: {dt*1e3:7.2f} ms "
                      f"{dt/E*1e9:7.2f} ns/edge", flush=True)


if __name__ == "__main__":
    main()
