"""Dense-tile-path roofline on the bench graph (production config: bf16
tiles + activations, threshold 48).

The hybrid's dense tiles split into the block-DIAGONAL batched matmul
(~90 % of dense edges after community ordering) and the off-diagonal BSR
kernel walk; each is timed separately.  Traffic model per block: A tile
(128·128·2 B) + X block (128·F·2 B) + out (128·F·2 B).  Roofline: 819 GB/s
(v5e HBM).  Protocol: K chained dispatches + final scalar fetch.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

HBM_PEAK = 819e9
REPS = int(os.environ.get("ROOFLINE_REPS", "128"))
# >1: time the grouped BSR kernel (build_bsr group=N) instead of the
# per-tile kernel; zero-padding tiles are fetched but not useful — both
# fetched-GB/s and useful-GB/s are printed
GROUP = int(os.environ.get("ROOFLINE_GROUP", "1"))
# tile edge length for the off-diag BSR timing (rebuilds the tile set)
RBLOCK = int(os.environ.get("ROOFLINE_BLOCK", "128"))
RTHRESH = int(os.environ.get("ROOFLINE_THRESHOLD", "0"))  # 0 = scale 48


def timed(fn, x):
    """Dispatch-latency-FREE per-op time: time a REPS-iteration and a
    2·REPS-iteration fori_loop program and report (t_hi − t_lo)/REPS.

    The tunnel adds ~40 ms of FIXED latency per dispatch; dividing one
    dispatch by its rep count leaves 40 ms/REPS of bias per op (at the old
    REPS=24 that bias was ~1.7 ms — large enough to make every kernel read
    as ~200 GB/s regardless of its true rate).  The two-length difference
    cancels the constant exactly; median of 3 pairs rejects jitter."""
    import jax

    def make(reps):
        @jax.jit
        def loop(x_):
            return jax.lax.fori_loop(0, reps, lambda i, v: fn(v), x_)
        return loop

    lo, hi = make(REPS), make(2 * REPS)
    out = lo(x)
    _ = float(out.reshape(-1)[0])          # compile + warm lo
    out = hi(out)
    _ = float(out.reshape(-1)[0])          # compile + warm hi
    diffs = []
    for _i in range(3):
        t0 = time.perf_counter()
        out = lo(out)                      # fresh input each call: the
        _ = float(out.reshape(-1)[0])      # tunnel result cache can't serve
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = hi(out)
        _ = float(out.reshape(-1)[0])
        t_hi = time.perf_counter() - t0
        diffs.append((t_hi - t_lo) / REPS)
    return float(np.median(diffs))


def main():
    import importlib.util
    spec = importlib.util.spec_from_file_location("bench", "bench.py")
    b = importlib.util.module_from_spec(spec)
    sys.argv = ["bench"]
    spec.loader.exec_module(b)
    from fitgnn_tpu.ops.pallas.bsr_spmm import _bsr_spmm_fwd
    from fitgnn_tpu.ops.hybrid_spmm import build_hybrid
    from fitgnn_tpu.partition.community import hierarchical_community_order
    from fitgnn_tpu.graph import build_graph

    x, senders, receivers, y, train = b.make_graph()
    order = hierarchical_community_order(senders, receivers, b.NUM_NODES,
                                         seed=0)
    inv = np.empty(b.NUM_NODES, dtype=np.int64)
    inv[order] = np.arange(b.NUM_NODES)
    senders, receivers = inv[senders], inv[receivers]
    g = build_graph(x[order], senders.astype(np.int32),
                    receivers.astype(np.int32), node_pad_to=RBLOCK)
    hyb = build_hybrid(np.asarray(g.senders, np.int64),
                       np.asarray(g.receivers, np.int64),
                       np.asarray(g.edge_weight), g.num_nodes_padded,
                       min_block_edges=48, tile_dtype=jnp.bfloat16,
                       use_diag=True)
    F = 512
    h = jnp.asarray(np.random.default_rng(0).standard_normal(
        (g.num_nodes_padded, F)), dtype=jnp.bfloat16)

    # --- diagonal batched matmul ---------------------------------------
    db = hyb.diag_blocks
    nb = db.shape[0]

    def run_diag(h_):
        xb = h_.reshape(nb, 128, F)
        o = jnp.einsum("bij,bjf->bif", db, xb)   # matches the production
        return (o.reshape(h_.shape) * 0.05).astype(h_.dtype)  # hybrid path

    per = timed(run_diag, h)
    t_bytes = nb * (128 * 128 * 2 + 2 * 128 * F * 2)
    print(f"diag einsum ({nb} blocks): {per*1e3:.2f} ms  "
          f"{t_bytes/per/1e9:.0f} GB/s = {t_bytes/per/HBM_PEAK*100:.0f}% "
          f"of HBM roofline")

    # --- Pallas diag-run kernel (R contiguous blocks per grid step) -----
    from fitgnn_tpu.ops.pallas.diag_spmm import diag_spmm_raw, pick_run_length
    rr = int(os.environ.get("ROOFLINE_DIAG_R", "0")) or pick_run_length(nb)
    if nb % rr == 0:
        def run_diag_k(h_):
            o = diag_spmm_raw(db, h_, rr)
            return (o * 0.05).astype(h_.dtype)

        per = timed(run_diag_k, h)
        print(f"diag pallas r={rr} ({nb} blocks): {per*1e3:.2f} ms  "
              f"{t_bytes/per/1e9:.0f} GB/s = "
              f"{t_bytes/per/HBM_PEAK*100:.0f}% of HBM roofline")

    # --- off-diagonal BSR kernel ---------------------------------------
    bsr = hyb.bsr
    K_useful = bsr.nnz_blocks
    if GROUP > 1 or RBLOCK != 128:
        from fitgnn_tpu.ops.pallas.bsr_spmm import (_bsr_spmm_fwd_grouped,
                                                    build_bsr)
        # rebuild the SAME off-diag tile set with group padding
        s64 = np.asarray(g.senders, np.int64)
        r64 = np.asarray(g.receivers, np.int64)
        w = np.asarray(g.edge_weight)
        nb_ = g.num_nodes_padded // RBLOCK
        tile = (r64 // RBLOCK) * nb_ + (s64 // RBLOCK)
        uniq, invt, counts = np.unique(tile, return_inverse=True,
                                       return_counts=True)
        thresh = RTHRESH or 48 * (RBLOCK // 128) ** 2
        dense = counts[invt] >= thresh
        ondiag = dense & (r64 // RBLOCK == s64 // RBLOCK)
        m = dense & ~ondiag
        k_real = len(np.unique(tile[m]))   # tiles BEFORE group/row padding
        bsr = build_bsr(s64[m], r64[m], w[m], g.num_nodes_padded,
                        block=RBLOCK,
                        tile_dtype=jnp.bfloat16, with_transpose=False,
                        group=GROUP)

        from fitgnn_tpu.ops.pallas.bsr_spmm import _use_interpret

        def run_bsr(h_):
            if GROUP > 1:
                o = _bsr_spmm_fwd_grouped(bsr.blocks, bsr.rows, bsr.cols,
                                          h_, GROUP, block=RBLOCK,
                                          interpret=_use_interpret())
            else:
                o = _bsr_spmm_fwd(bsr.blocks, bsr.rows, bsr.cols, h_,
                                  block=RBLOCK,
                                  interpret=_use_interpret())
            return (o * 0.05).astype(h_.dtype)
    else:
        from fitgnn_tpu.ops.pallas.bsr_spmm import _use_interpret

        def run_bsr(h_):
            o = _bsr_spmm_fwd(bsr.blocks, bsr.rows, bsr.cols, h_,
                              interpret=_use_interpret())
            return (o * 0.05).astype(h_.dtype)

    K = bsr.nnz_blocks
    B_ = bsr.block
    if B_ != 128 or GROUP > 1:
        K_useful = k_real     # real tiles of the rebuilt set (no padding)
    nrows = len(np.unique(np.asarray(bsr.rows)))
    per = timed(run_bsr, h)
    f_bytes = K * (B_ * B_ * 2 + B_ * F * 2) + nrows * B_ * F * 2
    u_bytes = K_useful * (B_ * B_ * 2 + B_ * F * 2) + nrows * B_ * F * 2
    print(f"off-diag BSR ({K} tiles, block={B_}, group={GROUP}):  "
          f"{per*1e3:.2f} ms  "
          f"fetched {f_bytes/per/1e9:.0f} GB/s "
          f"({f_bytes/per/HBM_PEAK*100:.0f}% roofline), useful "
          f"{u_bytes/per/1e9:.0f} GB/s "
          f"({u_bytes/per/HBM_PEAK*100:.0f}%)")


if __name__ == "__main__":
    main()
