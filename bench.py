"""Benchmark: full-batch GCN training throughput (edges/sec/chip).

Runs on whatever JAX device is available (real TPU under the driver).  The
workload mirrors the reference's training hot loop (2-layer GCN, hidden=512,
full-batch, Adam) on an ogbn-arxiv-scale synthetic graph, since the real
datasets cannot be downloaded in this environment.

Baseline constant: the reference is single-GPU PyTorch-Geometric with no
recorded hardware (SURVEY §6); 5e7 edges/s is the ballpark for a PyG
full-batch 2-layer GCN epoch on arxiv-scale graphs on one datacenter GPU,
used here as the vs_baseline denominator until a measured reference exists.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

REF_EDGES_PER_SEC = 5.0e7

NUM_NODES = 169_343          # ogbn-arxiv scale
AVG_DEGREE = 7
NUM_FEATURES = 128
HIDDEN = 512
NUM_CLASSES = 40
STEPS = 10


def main():
    import jax
    import jax.numpy as jnp
    from fitgnn_tpu.graph import build_graph
    from fitgnn_tpu.models import NodeModel
    from fitgnn_tpu.train.steps import create_state, gc_train_step

    rng = np.random.default_rng(0)
    senders = rng.integers(0, NUM_NODES, size=NUM_NODES * AVG_DEGREE // 2,
                           dtype=np.int64)
    receivers = rng.integers(0, NUM_NODES, size=NUM_NODES * AVG_DEGREE // 2,
                             dtype=np.int64)
    keep = senders != receivers
    senders, receivers = senders[keep], receivers[keep]
    x = rng.standard_normal((NUM_NODES, NUM_FEATURES)).astype(np.float32)
    y = rng.integers(0, NUM_CLASSES, size=NUM_NODES).astype(np.int32)
    train_mask = rng.random(NUM_NODES) < 0.5

    g = build_graph(x, senders, receivers, y=y, train_mask=train_mask)
    num_edges = int(g.n_edge)  # undirected + self loops, the aggregated count

    model = NodeModel(layer_name="GCNConv", hidden=HIDDEN, num_layers=2,
                      out_dim=NUM_CLASSES)
    state = create_state(model, jax.random.PRNGKey(0), g.x, g)
    yv = g.y
    mv = g.train_mask
    key = jax.random.PRNGKey(1)

    # run STEPS optimizer steps inside ONE jitted scan: a single dispatch, so
    # host/tunnel latency does not pollute the device-time measurement
    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch_block(state, keys):
        def body(st, k):
            st, loss = gc_train_step(st, g, yv, mv, k, "classification")
            return st, loss

        return jax.lax.scan(body, state, keys)

    keys = jax.random.split(key, STEPS)
    state, losses = epoch_block(state, keys)       # compile + warm-up
    losses.block_until_ready()
    keys = jax.random.split(jax.random.PRNGKey(2), STEPS)
    t0 = time.perf_counter()
    state, losses = epoch_block(state, keys)
    losses.block_until_ready()
    elapsed = time.perf_counter() - t0

    step_time = elapsed / STEPS
    edges_per_sec = num_edges / step_time
    print(json.dumps({
        "metric": "gcn_train_edges_per_sec_per_chip",
        "value": round(edges_per_sec, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_sec / REF_EDGES_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
