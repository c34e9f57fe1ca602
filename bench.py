"""Benchmark: full-batch GCN training throughput (edges/sec/chip).

Workload: the reference's training hot loop (2-layer GCN, hidden=512,
full-batch, Adam) on an ogbn-arxiv-scale synthetic community graph — real
datasets cannot be downloaded in this environment, and community structure
matches the real ogbn graphs this pipeline targets.

The graph goes through the framework's production path: C++ Leiden community
detection → community-contiguous reorder → hybrid BCSR(MXU)+COO operator →
jitted train step.  Timing: K sequential dispatches with state chaining and
a final scalar fetch (honest under remote-execution result caching).

Baseline constant: the reference is single-GPU PyTorch-Geometric with no
recorded hardware (SURVEY §6), so the baseline is OUR estimate, carried
with explicit error bars.  Provenance chain:
  measured — the torch edge-scatter oracle (the computational structure
  PyG convs lower to) runs THIS bench graph at 0.18 M edges/s fwd+bwd+SGD
  on the quiet 4-thread host CPU (scripts/torch_gat_ratio.py, round 4:
  GCN 16.2 s/step, GAT/GCN cost ratio 3.69x).  This anchors the RATIO
  between layers and floors the absolute; it does NOT extrapolate to a
  GPU by bandwidth scaling (that would need a ~300x factor to reach 5e7 —
  GPU scatter efficiency differs too much from torch-CPU index_add);
  assumed  — published PyG full-batch 2-layer GCN epoch times on
  arxiv-scale graphs on datacenter GPUs cluster around 15-45 ms
  => 3e7-8e7 edges/s; 5e7 is the center of that band.  The JSON carries
  the whole band: `vs_baseline` uses 5e7, `vs_baseline_range` =
  [vs 8e7, vs 3e7].

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"vs_baseline_range", "baseline_note"}.
"""

import json
import os
import sys
import time

import numpy as np

REF_EDGES_PER_SEC = 5.0e7
# defaults = the tuned production config (PERFORMANCE.md round-2 sweep):
# tile threshold 48, bf16 conv stack + tiles, rbg dropout PRNG, MXU
# selector-matmul straggler scatter.  Env knobs ablate each.
BENCH_DTYPE = os.environ.get("FITGNN_BENCH_DTYPE", "bfloat16")
BENCH_LAYER = os.environ.get("FITGNN_BENCH_LAYER", "GCNConv")
# GAT cluster-factorized attention (APPROXIMATE — a different model, the
# reference's cluster_node idea): straggler edges attend to their sender's
# cluster-summary row via a dense (N, C) MXU block. Value = nodes per
# cluster (multiple of 128), 0 = off. GATConv only.
BENCH_CLUSTER_ATT = int(os.environ.get("FITGNN_BENCH_CLUSTER_ATT", "0"))
# static-semantics analog (GCN/SAGE/GIN, APPROXIMATE): straggler edges
# aggregate their sender's cluster-mean row via one (N, C) @ (C, F) MXU
# matmul — the per-edge straggler path disappears. Value = nodes per
# cluster (multiple of 128), 0 = off.
BENCH_CLUSTER_SUM = int(os.environ.get("FITGNN_BENCH_CLUSTER_SUM", "0"))
# hybrid split: top-k straggler senders stay on the exact per-edge path,
# the tail collapses onto summaries (accuracy/latency frontier knob)
BENCH_CLUSTER_EXACT = int(os.environ.get("FITGNN_BENCH_CLUSTER_EXACT", "0"))
# per-layer tuned tile threshold: after the dB Pallas kernel + den-column
# changes the GAT curve is a flat ~46.5±1 ms plateau over t8-t48 with the
# best point at 32 (t8 46.7 / t16 47.2 / t32 46.1 / t48 46.5);
# GCN/SAGE/GIN break even at 48.  Under EITHER cluster collapse the
# threshold retunes upward to 192 (collapsed stragglers are nearly free,
# so marginal tiles stop paying for their grid steps): GAT t32→t192
# (round 3), GCN 10.4→9.7 ms t48→t192 with t384 flat (round 4).
_DEFAULT_THRESHOLD = ("192" if (BENCH_CLUSTER_ATT or BENCH_CLUSTER_SUM)
                      else "32" if BENCH_LAYER == "GATConv" else "48")
BENCH_TILE_THRESHOLD = int(os.environ.get("FITGNN_BENCH_THRESHOLD",
                                          _DEFAULT_THRESHOLD))
BENCH_DROPOUT = float(os.environ.get("FITGNN_BENCH_DROPOUT", "0.5"))
BENCH_PRNG = os.environ.get("FITGNN_BENCH_PRNG", "rbg")
BENCH_SEGMM = os.environ.get("FITGNN_BENCH_SEGMM", "1") == "1"
# vary param/dropout seeds WITHOUT changing the compiled program: re-runs of
# a fully deterministic bench replay identical (program, input) dispatches,
# which the tunnel's result cache would serve without re-executing — the
# default seed is time-derived so every run executes fresh
BENCH_SEED = int(os.environ.get("FITGNN_BENCH_SEED",
                                str(int(time.time()) % 999983)))
BENCH_FUSED_DROPOUT = os.environ.get("FITGNN_BENCH_FUSED_DROPOUT", "0") == "1"
# p=0.5 dropout from one random byte per element (4x less PRNG traffic;
# default on — A/B 22.1 -> 20.8 ms/step)
BENCH_BIT_DROPOUT = os.environ.get("FITGNN_BENCH_BITDROP", "1") == "1"
BENCH_ROWWALK = os.environ.get("FITGNN_BENCH_ROWWALK", "0") == "1"
# XLA batched-einsum tile path (slab gather + batched MXU matmul + sorted
# segment-sum): no Pallas per-grid-step overhead, so pair it with a LOW
# tile threshold (break-even ~4 edges/tile at F<=128)
BENCH_EINSUM_TILES = os.environ.get("FITGNN_BENCH_EINSUM", "0") == "1"
# BENCH_LAYER (set above): GCNConv (default, hybrid BCSR operator +
# layer-0 preagg) or GATConv / SAGEConv / GINConv (segment-op paths —
# diagnostic rows for PERFORMANCE.md, the headline metric stays GCN)
# 1 (default) = time the STEPS steps as ONE jitted lax.scan program (the
# production fused-epochs path, train/steps.py:gc_train_epochs_scan,
# CLI --fused_epochs) instead of STEPS chained dispatches — the way
# full-batch epochs actually run in production, and free of the tunnel's
# per-dispatch host overhead (~2-3 ms).  0 = chained dispatches.
BENCH_SCAN = os.environ.get("FITGNN_BENCH_SCAN", "1") == "1"
# tiles per BSR grid step (build_bsr group=): >1 amortizes per-grid-step
# overhead at the cost of zero-tile padding in short block-rows
BENCH_TILE_GROUP = int(os.environ.get("FITGNN_BENCH_TILE_GROUP", "1"))
# split block-diagonal dense tiles onto the Pallas diag-run kernel
# (R contiguous blocks per grid step; ops/pallas/diag_spmm.py)
BENCH_DIAG = os.environ.get("FITGNN_BENCH_DIAG", "0") == "1"
BENCH_DIAG_R = int(os.environ.get("FITGNN_BENCH_DIAG_R", "0")) or None
# tile edge length (multiple of 128): larger tiles cut Pallas grid steps on
# block-diagonal-dominant adjacency; retune FITGNN_BENCH_THRESHOLD with it
# (break-even edges/tile scales ~quadratically with the edge length)
BENCH_BLOCK = int(os.environ.get("FITGNN_BENCH_BLOCK", "128"))
# component ablations (diagnostics only — vs_baseline is not honest then):
#   no_coo  — drop the straggler COO edges from the hybrid operator
#   no_spmm — drop the whole aggregation (dense path floor)
BENCH_ABLATE = os.environ.get("FITGNN_BENCH_ABLATE", "")
# graph size is overridable for CPU smoke tests of bench code paths only —
# the headline metric is defined at the default (arxiv-scale) size
NUM_NODES = int(os.environ.get("FITGNN_BENCH_NODES",
                               "169344"))  # 1323 x 128 — ogbn-arxiv scale
COMM = 128
AVG_DEGREE = 7
NUM_FEATURES = 128
HIDDEN = 512
NUM_CLASSES = 40
# 128-step timing window: the scan is ONE program either way (state chains,
# fresh dropout seeds), but the window carries ~40 ms of fixed one-dispatch
# tunnel/host latency that an 8-step window spreads as +5 ms/step (device
# trace: 128 ms busy vs 168 ms wall at 8 steps; 32-step 14.5 ms, 128-step
# 13.6 ms ≈ the device rate).  16-step windows measured anomalously slow
# twice (21.0/21.6 ms) — an XLA scan-length quirk, avoided.
STEPS = int(os.environ.get("FITGNN_BENCH_STEPS", "128"))
INTERNAL = 0.85              # fraction of edges inside a community


def make_graph():
    rng = np.random.default_rng(0)
    e = NUM_NODES * AVG_DEGREE // 2
    receivers = rng.integers(0, NUM_NODES, e, dtype=np.int64)
    comm = receivers // COMM
    s_in = comm * COMM + rng.integers(0, COMM, e)
    s_out = rng.integers(0, NUM_NODES, e)
    senders = np.where(rng.random(e) < INTERNAL, s_in, s_out)
    keep = senders != receivers
    senders, receivers = senders[keep], receivers[keep]
    # shuffle node ids: real graphs arrive without community-contiguous
    # ordering — recovering it is the ingest pipeline's job
    perm = rng.permutation(NUM_NODES)
    senders, receivers = perm[senders], perm[receivers]
    x = rng.standard_normal((NUM_NODES, NUM_FEATURES)).astype(np.float32)
    y = rng.integers(0, NUM_CLASSES, NUM_NODES).astype(np.int32)
    train = rng.random(NUM_NODES) < 0.5
    return x, senders, receivers, y, train


def main():
    import jax
    if BENCH_PRNG:
        jax.config.update("jax_default_prng_impl", BENCH_PRNG)
    from fitgnn_tpu.graph import build_graph
    from fitgnn_tpu.models import NodeModel
    from fitgnn_tpu.ops.hybrid_spmm import build_hybrid
    from fitgnn_tpu.partition.community import hierarchical_community_order
    from fitgnn_tpu.train.steps import create_state, gc_train_step

    x, senders, receivers, y, train = make_graph()

    # production ingest: two-level Leiden -> tile-dense contiguous node order
    t0 = time.perf_counter()
    order = hierarchical_community_order(senders, receivers, NUM_NODES,
                                         seed=0)
    print(f"hierarchical leiden order in "
          f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
    inv = np.empty(NUM_NODES, dtype=np.int64)
    inv[order] = np.arange(NUM_NODES)
    x, y, train = x[order], y[order], train[order]
    senders, receivers = inv[senders], inv[receivers]

    g = build_graph(x, senders.astype(np.int32), receivers.astype(np.int32),
                    y=y, train_mask=train,
                    # cluster summaries reduce over contiguous equal-size
                    # node groups: pad the node space to a whole cluster
                    node_pad_to=BENCH_CLUSTER_ATT or BENCH_CLUSTER_SUM
                    or BENCH_BLOCK)
    num_edges = int(g.n_edge)
    import jax.numpy as _jnp
    tile_dtype = _jnp.bfloat16 if BENCH_DTYPE == "bfloat16" else None
    from fitgnn_tpu.graph.optimize import _LAYER_SEMANTICS, _operator_weights
    semantics = _LAYER_SEMANTICS.get(BENCH_LAYER, "gcn_norm")
    w_op = _operator_weights(g.senders, g.receivers, g.edge_weight,
                             g.num_nodes_padded, semantics)
    hyb = build_hybrid(np.asarray(g.senders, dtype=np.int64),
                       np.asarray(g.receivers, dtype=np.int64),
                       w_op, g.num_nodes_padded,
                       min_block_edges=BENCH_TILE_THRESHOLD,
                       block=BENCH_BLOCK,
                       tile_dtype=tile_dtype, use_segmm=BENCH_SEGMM,
                       use_diag=BENCH_DIAG, diag_r=BENCH_DIAG_R,
                       use_rowwalk=BENCH_ROWWALK,
                       tile_group=BENCH_TILE_GROUP,
                       use_einsum_tiles=BENCH_EINSUM_TILES,
                       semantics=semantics,
                       cluster_att=BENCH_CLUSTER_ATT,
                       cluster_att_exact=(BENCH_CLUSTER_EXACT
                                          if BENCH_CLUSTER_ATT else 0),
                       cluster_agg=BENCH_CLUSTER_SUM,
                       cluster_agg_exact=(BENCH_CLUSTER_EXACT
                                          if BENCH_CLUSTER_SUM else 0),
                       real_nodes=NUM_NODES)
    nb = 0 if hyb.bsr is None else hyb.bsr.nnz_blocks
    nd = 0 if hyb.diag_blocks is None else hyb.diag_blocks.shape[0]
    nc = (0 if hyb.cluster_count is None
          else int((np.asarray(hyb.cluster_count) > 0).sum()))
    print(f"hybrid: {nb} dense tiles"
          + (f" + {nd} diag blocks (r={hyb.diag_r})" if nd else "")
          + (f" + {nc} cluster-"
             f"{'att' if BENCH_CLUSTER_ATT else 'agg'} entries "
             f"(K={hyb.cluster_size}, approximate)" if nc else "")
          + f", {hyb.num_coo_edges} coo edges of {num_edges}",
          file=sys.stderr)
    if BENCH_ABLATE:
        one = lambda a: a[:1]  # noqa: E731
        hyb = hyb.replace(
            senders=one(hyb.senders), receivers=one(hyb.receivers),
            weights=0.0 * one(hyb.weights), t_senders=one(hyb.t_senders),
            t_receivers=one(hyb.t_receivers),
            t_weights=0.0 * one(hyb.t_weights),
            segmm=None, t_segmm=None,  # the MXU straggler path must be
                                       # ablated too, not just the edge lists
            bsr=None if BENCH_ABLATE == "no_spmm" else hyb.bsr)
        print(f"ABLATION {BENCH_ABLATE}: timing is diagnostic only",
              file=sys.stderr)
    g = g._replace(aux=hyb)

    import jax.numpy as jnp
    from fitgnn_tpu.models.models import preaggregate_input
    dtype = jnp.bfloat16 if BENCH_DTYPE == "bfloat16" else None
    preagg = BENCH_LAYER in ("GCNConv", "SAGEConv", "GINConv")
    model = NodeModel(layer_name=BENCH_LAYER, hidden=HIDDEN, num_layers=2,
                      out_dim=NUM_CLASSES, dtype=dtype,
                      first_layer_preaggregated=preagg,
                      dropout_rate=BENCH_DROPOUT,
                      fused_dropout=BENCH_FUSED_DROPOUT,
                      bit_dropout=BENCH_BIT_DROPOUT)
    if preagg:
        # layer-0 aggregation folds into ingest: computed once (exact —
        # input features are constant).  GCN gets x̃ = Â·X; SAGE/GIN get
        # concat([X, their neighbor mean/sum]) for the lin_r/ε terms.
        x_pre = preaggregate_input(g, BENCH_LAYER)
        if dtype is not None:
            x_pre = x_pre.astype(dtype)  # the bf16 stack consumes it
        x_pre.block_until_ready()
        g = g._replace(x=x_pre)
    state = create_state(model, jax.random.PRNGKey(BENCH_SEED), g.x, g)
    yv, mv = g.y, g.train_mask
    key = jax.random.PRNGKey(BENCH_SEED + 1)

    if BENCH_SCAN:
        # g/yv/mv ride as jit OPERANDS, not closure constants: baked-in
        # constants ship inside the remote-compile payload, and the
        # cluster-attention (N, C) count table alone blows the ~100 MB
        # limit at K=512 (round-3 HTTP 413) — as runtime inputs they cost
        # one upload instead
        @jax.jit
        def run_steps(st, k, gg, yy, mm):
            def body(st, r):
                return gc_train_step(st, gg, yy, mm, r, "classification")

            return jax.lax.scan(body, st, jax.random.split(k, STEPS))

        # warm-up / compile (advances the state — the timed program re-runs
        # on fresh inputs, so the tunnel result cache cannot serve it)
        g = jax.device_put(g)
        yv, mv = jax.device_put((yv, mv))
        state, losses = run_steps(state, key, g, yv, mv)
        _ = float(losses[-1])
        print("compiled; timing...", file=sys.stderr)
        trace_dir = os.environ.get("FITGNN_BENCH_TRACE", "")
        if trace_dir:
            jax.profiler.start_trace(trace_dir)
        t0 = time.perf_counter()
        state, losses = run_steps(state, jax.random.fold_in(key, 1), g, yv,
                                  mv)
        _ = float(losses[-1])  # scalar fetch drains the dispatch queue
        elapsed = time.perf_counter() - t0
        if trace_dir:
            jax.profiler.stop_trace()
    else:
        # warm-up / compile
        state, loss = gc_train_step(state, g, yv, mv, key, "classification")
        _ = float(loss)
        print("compiled; timing...", file=sys.stderr)

        t0 = time.perf_counter()
        for i in range(STEPS):
            state, loss = gc_train_step(state, g, yv, mv,
                                        jax.random.fold_in(key, i),
                                        "classification")
        _ = float(loss)  # scalar fetch drains the dispatch queue
        elapsed = time.perf_counter() - t0

    step_time = elapsed / STEPS
    edges_per_sec = num_edges / step_time
    print(f"step {step_time*1e3:.1f} ms", file=sys.stderr)
    tag = BENCH_LAYER.replace("Conv", "").lower()
    print(json.dumps({
        "metric": f"{tag}_train_edges_per_sec_per_chip",
        "value": round(edges_per_sec, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_sec / REF_EDGES_PER_SEC, 4),
        # the baseline constant is OUR estimate (the reference publishes no
        # numbers): 3e7-8e7 edges/s spans published PyG full-batch GCN
        # epoch times on arxiv-scale graphs on datacenter GPUs; the torch
        # CPU oracle (0.18 M edges/s here) anchors the layer-cost ratios
        # and the floor.  Range = [pessimistic vs 8e7, optimistic vs 3e7]
        "vs_baseline_range": [round(edges_per_sec / 8.0e7, 4),
                              round(edges_per_sec / 3.0e7, 4)],
        "baseline_note": "5e7 edges/s assumed PyG datacenter-GPU rate "
                         "(published-range center; CPU oracle 0.18M "
                         "anchors ratios/floor)",
    }))


if __name__ == "__main__":
    main()
