"""Micro: per-edge dynamic-row VMEM ops inside a Pallas kernel.

The straggler SpMM floor is the XLA random row gather (~20-24 ns/row,
row-rate-bound, width-independent).  A slab-streaming redesign would
replace HBM-random access with sequential slab DMAs plus PER-EDGE dynamic
row reads/writes against VMEM-resident slabs.  Whether that wins hinges on
one number this micro measures: the sustained rate of

  a) emit:  out[j, :]      = slab[idx[j], :]  (dynamic VMEM read, seq write)
  b) rmw :  acc[idx[j], :] += msg[j, :]       (dynamic VMEM read-modify-write)

for F=128 f32 rows, idx random within a 4096-row VMEM slab, driven by a
fori_loop over SMEM-prefetched indices.  If either op sustains ≲8 ns/edge
the two-pass design (stream X by sender-slab → emit messages; stream
messages by receiver-bucket → RMW-accumulate) beats the gather floor;
at ≳20 ns/edge it is dead and the gather stands.

Protocol: chunks of 1024 edges per grid step, E=1M edges per dispatch,
K=8 chained dispatches (the tunnel adds ~2-3 ms/dispatch and caches
(program, input) results — the float inputs chain through the output).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SLAB = 4096          # VMEM-resident rows (4096 x 128 f32 = 2 MB)
F = 128
CHUNK = 1024         # edges per grid step (4 KB SMEM indices)
E = 1_048_576 if "--interpret" not in sys.argv else 4096   # interpret is slow
REPS = 8
INTERPRET = "--interpret" in sys.argv
GRID = E // CHUNK


def _emit_kernel(idx_ref, slab_ref, out_ref):
    def body(j, _):
        row = idx_ref[j]
        out_ref[pl.ds(j, 1), :] = slab_ref[pl.ds(row, 1), :]
        return 0

    jax.lax.fori_loop(0, CHUNK, body, 0)


def _rmw_kernel(idx_ref, slab_ref, msg_ref, acc_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[...] = slab_ref[...]

    def body(j, _):
        row = idx_ref[j]
        acc_ref[pl.ds(row, 1), :] = (acc_ref[pl.ds(row, 1), :]
                                     + msg_ref[pl.ds(j, 1), :])
        return 0

    jax.lax.fori_loop(0, CHUNK, body, 0)


def build_emit():
    return pl.pallas_call(
        _emit_kernel,
        grid=GRID,
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((SLAB, F), lambda i: (0, 0)),     # resident slab
        ],
        out_specs=pl.BlockSpec((CHUNK, F), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((E, F), jnp.float32),
        interpret=INTERPRET,
    )


def build_rmw():
    return pl.pallas_call(
        _rmw_kernel,
        grid=GRID,
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((SLAB, F), lambda i: (0, 0)),
            pl.BlockSpec((CHUNK, F), lambda i: (i, 0)),    # streamed msgs
        ],
        out_specs=pl.BlockSpec((SLAB, F), lambda i: (0, 0)),  # resident acc
        out_shape=jax.ShapeDtypeStruct((SLAB, F), jnp.float32),
        interpret=INTERPRET,
    )


def timed(fn, args, chain_arg, chain_slice):
    """Time REPS dispatches, chaining part of the output into one input so
    the tunnel's result cache never serves a repeat."""
    args = list(args)
    out = fn(*args)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(REPS):
        args[chain_arg] = (args[chain_arg] * 0.999
                           + 1e-6 * out[chain_slice]).astype(jnp.float32)
        out = fn(*args)
    _ = float(out.reshape(-1)[0])
    dt = (time.perf_counter() - t0) / REPS
    return dt


def main():
    rng = np.random.default_rng(int(time.time()) % 99991)
    idx = rng.integers(0, SLAB, E, dtype=np.int32)
    slab = jnp.asarray(rng.standard_normal((SLAB, F)), jnp.float32)
    msg = jnp.asarray(rng.standard_normal((E, F)), jnp.float32)
    idxj = jnp.asarray(idx)

    emit = jax.jit(build_emit())
    out = emit(idxj, slab)
    ok = np.allclose(np.asarray(out[:CHUNK]), np.asarray(slab)[idx[:CHUNK]])
    dt = timed(emit, (idxj, slab), 1, slice(0, SLAB))
    print(f"emit : {dt*1e3:8.2f} ms  {dt/E*1e9:6.2f} ns/edge  correct={ok}",
          flush=True)

    rmw = jax.jit(build_rmw())
    out = rmw(idxj, slab, msg)
    ref = np.asarray(slab).copy()
    np.add.at(ref, idx, np.asarray(msg))
    ok = np.allclose(np.asarray(out), ref, atol=1e-2)
    dt = timed(rmw, (idxj, slab, msg), 1, slice(0, SLAB))
    print(f"rmw  : {dt*1e3:8.2f} ms  {dt/E*1e9:6.2f} ns/edge  correct={ok}",
          flush=True)

    @jax.jit
    def xg(slab, idxj):
        return slab[idxj]

    _ = xg(slab, idxj).block_until_ready()
    t0 = time.perf_counter()
    o = None
    s = slab
    for _ in range(REPS):
        s = (s * 0.999).astype(jnp.float32)
        o = xg(s, idxj)
    _ = float(o.reshape(-1)[0])
    dt = (time.perf_counter() - t0) / REPS
    print(f"xla gather (slab-local source): {dt*1e3:8.2f} ms  "
          f"{dt/E*1e9:6.2f} ns/edge", flush=True)


if __name__ == "__main__":
    main()
