"""Sweep hybrid tile thresholds on the bench graph (SpMM-only programs)."""

import time
import numpy as np
import jax
import jax.numpy as jnp

from fitgnn_tpu.graph import build_graph
from fitgnn_tpu.ops.hybrid_spmm import build_hybrid, hybrid_spmm
from fitgnn_tpu.partition.community import hierarchical_community_order

N = 169_344
COMM = 128
DEG = 7
F = 512
REPS = 30


def main():
    rng = np.random.default_rng(0)
    e = N * DEG // 2
    receivers = rng.integers(0, N, e, dtype=np.int64)
    comm = receivers // COMM
    s_in = comm * COMM + rng.integers(0, COMM, e)
    senders = np.where(rng.random(e) < 0.85, s_in,
                       rng.integers(0, N, e))
    keep = senders != receivers
    senders, receivers = senders[keep], receivers[keep]
    perm = rng.permutation(N)
    senders, receivers = perm[senders], perm[receivers]

    order = hierarchical_community_order(senders, receivers, N, seed=0)
    inv = np.empty(N, dtype=np.int64)
    inv[order] = np.arange(N)
    senders, receivers = inv[senders], inv[receivers]

    x = rng.standard_normal((N, F)).astype(np.float32)
    g = build_graph(x[:, :8], senders.astype(np.int32),
                    receivers.astype(np.int32), node_pad_to=128)
    xd = jnp.asarray(np.pad(x, ((0, g.num_nodes_padded - N), (0, 0))))
    gs = np.asarray(g.senders, dtype=np.int64)
    gr = np.asarray(g.receivers, dtype=np.int64)
    gw = np.asarray(g.edge_weight)

    for thresh in (80, 100, 150, 250):
        h = build_hybrid(gs, gr, gw, g.num_nodes_padded,
                         min_block_edges=thresh)
        nb = 0 if h.bsr is None else h.bsr.nnz_blocks

        @jax.jit
        def loop(x_):
            def body(i, xc):
                o = hybrid_spmm(h, xc)
                return o / (jnp.abs(o).max() + 1e-9)
            out = jax.lax.fori_loop(0, REPS, body, x_)
            return jnp.sum(out)

        v = float(loop(xd))
        t0 = time.perf_counter()
        v = float(loop(xd * 1.0007))
        per = (time.perf_counter() - t0) / REPS
        ne = int(g.n_edge)
        print(f"t={thresh:4d}: {per*1e3:7.2f} ms/spmm -> "
              f"{ne/per/1e6:7.1f} M edges/s  [{nb} tiles, "
              f"{h.num_coo_edges/1e3:.0f}k stragglers]", flush=True)


if __name__ == "__main__":
    main()
