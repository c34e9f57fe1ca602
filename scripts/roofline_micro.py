"""Dense-tile-path roofline: achieved HBM bandwidth of the BCSR kernel on
the bench graph's dense tiles (bf16 tiles + activations, the production
config).  Protocol: K chained dispatches + final scalar fetch.

Traffic model per grid step: A-tile (128·128·2 B) + X block (128·F·2 B);
output blocks are written once per block-row (VMEM-resident revisit).
Roofline: 819 GB/s (v5e HBM).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

HBM_PEAK = 819e9
REPS = 12


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
                    receivers.astype(np.int32), node_pad_to=128)
    hyb = build_hybrid(np.asarray(g.senders, np.int64),
                       np.asarray(g.receivers, np.int64),
                       np.asarray(g.edge_weight), g.num_nodes_padded,
                       min_block_edges=48, tile_dtype=jnp.bfloat16)
    bsr = hyb.bsr
    K = bsr.nnz_blocks
    nrows = len(np.unique(np.asarray(bsr.rows)))
    F = 512
    h = jnp.asarray(np.random.default_rng(0).standard_normal(
        (g.num_nodes_padded, F)), dtype=jnp.bfloat16)

    @jax.jit
    def run(h_):
        o = _bsr_spmm_fwd(bsr.blocks, bsr.rows, bsr.cols, h_)
        return (o * 0.05).astype(h_.dtype)

    out = run(h)
    _ = float(out.reshape(-1)[0])
    t0 = time.perf_counter()
    for _i in range(REPS):
        out = run(out)
    _ = float(out.reshape(-1)[0])
    per = (time.perf_counter() - t0) / REPS

    dense_edges = int(g.n_edge) - hyb.num_coo_edges
    a_bytes = K * 128 * 128 * 2
    x_bytes = K * 128 * F * 2
    o_bytes = nrows * 128 * F * 2
    total = a_bytes + x_bytes + o_bytes
    bw = total / per
    print(f"tiles={K} block-rows={nrows} dense_edges={dense_edges}")
    print(f"bsr bf16: {per*1e3:.2f} ms  {dense_edges/per/1e6:.0f} M "
          f"dense-edges/s")
    print(f"traffic {total/1e6:.0f} MB -> {bw/1e9:.0f} GB/s = "
          f"{bw/HBM_PEAK*100:.0f}% of HBM roofline")


if __name__ == "__main__":
    main()
