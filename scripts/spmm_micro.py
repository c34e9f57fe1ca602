"""Micro-benchmark: SpMM variants on the current JAX device.

Times K repetitions inside one jitted fori_loop with a *data dependency
between iterations* (each iteration consumes the previous output), so XLA
cannot slice, hoist, or dead-code-eliminate the work.  Compares:

  1. gather+segment_sum COO SpMM (sorted receivers)
  2. pure gather (read cost only; forced via full-tensor reduction)
  3. dense matmul of comparable footprint (MXU ceiling reference)
  4. BCSR Pallas kernel on a community-structured graph
"""

import time
import numpy as np
import jax
import jax.numpy as jnp

N = 131_072          # nodes (multiple of 128)
DEG = 8
F = 512
REPS = 20


def timed(fn, *args):
    """Time fn with the LAST positional arg replaced by fn's own warm-up
    output (remote-execution layers may cache identical (program, inputs)
    pairs; chaining defeats that)."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args[:-1], out)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def main():
    rng = np.random.default_rng(0)
    e = N * DEG
    senders = rng.integers(0, N, size=e, dtype=np.int32)
    receivers = np.sort(rng.integers(0, N, size=e, dtype=np.int32))
    w = (rng.random(e).astype(np.float32)) * 0.1
    x = rng.standard_normal((N, F)).astype(np.float32)

    s_d, r_d, w_d, x_d = map(jnp.asarray, (senders, receivers, w, x))

    @jax.jit
    def spmm_loop(w_, s_, r_, x_):
        def body(i, xc):
            out = jax.ops.segment_sum(
                xc[s_] * w_[:, None], r_, num_segments=N,
                indices_are_sorted=True)
            return out * 0.35  # keep magnitudes bounded; full dependency
        return jax.lax.fori_loop(0, REPS, body, x_)

    @jax.jit
    def gather_loop(s_, x_):
        def body(i, xc):
            g = xc[s_]                       # (E, F) read
            return xc + jnp.sum(g) * 1e-12   # forces the full gather
        return jax.lax.fori_loop(0, REPS, body, x_)

    @jax.jit
    def dense_loop(a, b):
        def body(i, bc):
            c = jnp.dot(a, bc, preferred_element_type=jnp.float32)
            return c * (1.0 / 64.0)
        return jax.lax.fori_loop(0, REPS, body, b)

    t = timed(spmm_loop, w_d, s_d, r_d, x_d) / REPS
    print(f"spmm_coo       : {t*1e3:8.2f} ms  -> {e/t/1e6:9.1f} M edges/s  "
          f"({(e*F*4*2)/t/1e9:7.1f} GB/s eff)")

    t = timed(gather_loop, s_d, x_d) / REPS
    print(f"gather only    : {t*1e3:8.2f} ms  -> {e/t/1e6:9.1f} M edges/s  "
          f"({(e*F*4)/t/1e9:7.1f} GB/s)")

    a = jnp.asarray(rng.standard_normal((4096, 4096)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((4096, 4096)).astype(np.float32))
    t = timed(dense_loop, a, b) / REPS
    print(f"dense 4k matmul: {t*1e3:8.2f} ms  -> {2*4096**3/t/1e12:6.1f} TFLOP/s")

    # BCSR on community-structured graph (90% of edges inside 128-blocks)
    from fitgnn_tpu.ops.pallas.bsr_spmm import build_bsr, _bsr_spmm_fwd
    comm = np.arange(N) // 128
    internal = rng.random(e) < 0.9
    s2 = np.where(internal,
                  comm[receivers] * 128 + rng.integers(0, 128, e),
                  senders).astype(np.int32)
    bsr = build_bsr(s2, receivers, w, N, with_transpose=False)
    print(f"bsr blocks: {bsr.nnz_blocks} ({bsr.density*100:.3f}% of dense, "
          f"{bsr.nnz_blocks*128*128*4/1e9:.2f} GB block storage)")

    @jax.jit
    def bsr_loop(blocks, rows, cols, x_):
        def body(i, xc):
            out = _bsr_spmm_fwd(blocks, rows, cols, xc)
            return out * 0.35
        return jax.lax.fori_loop(0, REPS, body, x_)

    t = timed(bsr_loop, bsr.blocks, bsr.rows, bsr.cols, x_d) / REPS
    blk_bytes = bsr.nnz_blocks * (128 * 128 * 4 + 128 * F * 4 * 2)
    print(f"bsr_spmm       : {t*1e3:8.2f} ms  -> {e/t/1e6:9.1f} M edges/s  "
          f"({blk_bytes/t/1e9:7.1f} GB/s tile traffic)")


if __name__ == "__main__":
    main()
