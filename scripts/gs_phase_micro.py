"""Gs-phase (subgraph training) throughput on the current device.

The bench covers the Gc full-batch hot loop; this times the OTHER phase —
the vmapped subgraph-batch GD step (what the reference streams through a
Python loop with per-batch H2D copies, ``run.py:177-253``) — on a mid-size
partitioned SBM.  Protocol: K chained dispatches + scalar fetch.
"""

import time

import numpy as np


def main():
    import jax
    from fitgnn_tpu.data.synthetic import sbm_graph
    from fitgnn_tpu.models import NodeModel
    from fitgnn_tpu.partition import coarsen_and_partition
    from fitgnn_tpu.train import steps

    n = 40_000
    t0 = time.time()
    x, s, r, y = sbm_graph(num_nodes=n, num_classes=8, num_features=64,
                           p_in=0.004, p_out=0.0003, seed=0)
    train = np.random.default_rng(0).random(n) < 0.3
    part = coarsen_and_partition(
        x, s, r, y, reduction=0.5, num_classes=8, train_mask=train,
        val_mask=~train, test_mask=~train, seed=0)
    print(f"partitioned {n} nodes -> {part.subgraphs.num_subgraphs} "
          f"subgraphs in {time.time()-t0:.1f}s", flush=True)
    batches = [part.subgraphs]
    sizes = [(b.num_subgraphs, b.num_nodes_padded, b.senders.shape[-1])
             for b in batches]
    print(f"batch (S, N_pad, E_pad): {sizes}", flush=True)

    model = NodeModel(layer_name="GCNConv", hidden=512, num_layers=2,
                      out_dim=8)
    g0 = batches[0].subgraph(0)
    state = steps.create_state(model, jax.random.PRNGKey(0), g0.x, g0)
    key = jax.random.PRNGKey(1)
    bt = tuple(batches)

    state, loss = steps.gs_train_step_gd_multi(state, bt, key, "classification")
    _ = float(loss)
    print("compiled; timing...", flush=True)
    REPS = 8
    t0 = time.perf_counter()
    for i in range(REPS):
        state, loss = steps.gs_train_step_gd_multi(
            state, bt, jax.random.fold_in(key, i), "classification")
    _ = float(loss)
    dt = (time.perf_counter() - t0) / REPS
    total_nodes = sum(int(b.n_node.sum()) for b in batches)
    total_sub = sum(b.num_subgraphs for b in batches)
    print(f"Gs GD epoch (all {total_sub} subgraphs, one update): "
          f"{dt*1e3:.1f} ms  -> {total_nodes/dt/1e6:.1f} M consumed-nodes/s",
          flush=True)


if __name__ == "__main__":
    main()
