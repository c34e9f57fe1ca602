"""Honest BCSR vs COO SpMM comparison on a community-structured graph
(scalar-fetch sync, perturbed inputs)."""

import time
import numpy as np
import jax
import jax.numpy as jnp

from fitgnn_tpu.ops.pallas.bsr_spmm import build_bsr, _bsr_spmm_fwd
from fitgnn_tpu.ops.hybrid_spmm import build_hybrid, hybrid_spmm

N = 131_072
DEG = 16
F = 512
REPS = 30
E = N * DEG


def measure(fn, x, *args):
    v = float(fn(x, *args))
    t0 = time.perf_counter()
    v = float(fn(x * 1.0007, *args))
    return (time.perf_counter() - t0) / REPS, v


def main():
    rng = np.random.default_rng(0)
    # 85% of edges inside 128-node communities, 15% global tail
    receivers = np.sort(rng.integers(0, N, E).astype(np.int64))
    comm = receivers // 128
    s_in = comm * 128 + rng.integers(0, 128, E)
    s_out = rng.integers(0, N, E)
    senders = np.where(rng.random(E) < 0.85, s_in, s_out).astype(np.int64)
    w = (rng.random(E).astype(np.float32)) * 0.1
    x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))

    order = np.argsort(receivers, kind="stable")
    senders, receivers, w = senders[order], receivers[order], w[order]

    # --- pure COO -----------------------------------------------------------
    s_d = jnp.asarray(senders.astype(np.int32))
    r_d = jnp.asarray(receivers.astype(np.int32))
    w_d = jnp.asarray(w)

    @jax.jit
    def coo_loop(x_):
        def body(i, carry):
            xc, acc = carry
            o = jax.ops.segment_sum(xc[s_d] * w_d[:, None], r_d,
                                    num_segments=N, indices_are_sorted=True)
            return (xc + acc * 1e-30, acc + jnp.sum(o))
        _, acc = jax.lax.fori_loop(0, REPS, body, (x_, 0.0))
        return acc

    per, _ = measure(coo_loop, x)
    print(f"coo            : {per*1e3:7.2f} ms -> {E/per/1e6:8.1f} M edges/s")

    # --- hybrid -------------------------------------------------------------
    for thresh, tile_dtype in ((150, None), (150, jnp.bfloat16)):
        h = build_hybrid(senders, receivers, w, N, min_block_edges=thresh,
                         tile_dtype=tile_dtype)
        nb = 0 if h.bsr is None else h.bsr.nnz_blocks
        dense_edges = E - h.num_coo_edges

        @jax.jit
        def hyb_loop(x_):
            def body(i, carry):
                xc, acc = carry
                o = hybrid_spmm(h, xc)
                return (xc + acc * 1e-30, acc + jnp.sum(o))
            _, acc = jax.lax.fori_loop(0, REPS, body, (x_, 0.0))
            return acc

        per, _ = measure(hyb_loop, x)
        tag = "bf16" if tile_dtype is not None else "f32 "
        print(f"hybrid {tag} t={thresh:4d}: {per*1e3:7.2f} ms -> "
              f"{E/per/1e6:8.1f} M edges/s   "
              f"[{nb} tiles, {dense_edges/E*100:.0f}% edges dense, "
              f"coo rest {h.num_coo_edges/1e3:.0f}k]")

    # --- pure BSR on the dense part only (kernel ceiling) -------------------
    h = build_hybrid(senders, receivers, w, N, min_block_edges=150)
    bsr = h.bsr

    @jax.jit
    def bsr_loop(x_):
        def body(i, carry):
            xc, acc = carry
            o = _bsr_spmm_fwd(bsr.blocks, bsr.rows, bsr.cols, xc)
            return (xc + acc * 1e-30, acc + jnp.sum(o))
        _, acc = jax.lax.fori_loop(0, REPS, body, (x_, 0.0))
        return acc

    per, _ = measure(bsr_loop, x)
    de = E - h.num_coo_edges
    tile_bytes = bsr.nnz_blocks * (128 * 128 * 4 + 128 * F * 4 * 2)
    print(f"bsr-only       : {per*1e3:7.2f} ms -> {de/per/1e6:8.1f} M "
          f"dense-edges/s ({tile_bytes/per/1e9:.0f} GB/s tile traffic, "
          f"{bsr.nnz_blocks} tiles)")


if __name__ == "__main__":
    main()
