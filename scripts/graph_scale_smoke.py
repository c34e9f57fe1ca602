"""QM9-scale graph-task rehearsal: 10k synthetic molecules through the
chunked graph-level pipeline — per-graph coarsening, shape-stable chunk
collation at --batch_size, and one training epoch of per-chunk optimizer
steps, with the per-chunk device footprint printed against what a
single-batch collation of the whole split would need (the reference's
QM9 run streams T_DataLoader batches, run.py:577-580; a whole-split
collation at 130k graphs is infeasible).

Usage: python scripts/graph_scale_smoke.py [--graphs 10000] [--batch_size 128]
"""

import argparse
import time

import numpy as np


def tree_bytes(t):
    import jax
    return sum(a.size * a.dtype.itemsize
               for a in jax.tree_util.tree_leaves(t)
               if hasattr(a, "size"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", type=int, default=10_000)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=64)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from fitgnn_tpu.data.graph_level import (collate_graph_level_batches,
                                             prepare_graph_sample)
    from fitgnn_tpu.data.synthetic import random_graph_dataset
    from fitgnn_tpu.train.graph_loop import graph_train_step

    t0 = time.time()
    graphs, y = random_graph_dataset(num_graphs=args.graphs, seed=0)
    y = np.random.default_rng(0).standard_normal(args.graphs).astype(
        np.float32)  # regression targets (QM9-like)
    print(f"synthesized {args.graphs} graphs in {time.time()-t0:.1f}s",
          flush=True)

    t0 = time.time()
    samples = [prepare_graph_sample(x, s, r, y_)
               for (x, s, r), y_ in zip(graphs, y)]
    print(f"coarsened+partitioned {len(samples)} graphs in "
          f"{time.time()-t0:.1f}s "
          f"({(time.time()-t0)/len(samples)*1e3:.1f} ms/graph)", flush=True)

    t0 = time.time()
    chunks = collate_graph_level_batches(samples, args.batch_size)
    print(f"collated {len(chunks)} shape-stable chunks in "
          f"{time.time()-t0:.1f}s", flush=True)
    shapes = {tuple(jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda a: a.shape, c))[0] for c in chunks)}
    chunk_mb = tree_bytes(chunks[0]) / 1e6
    est_single_mb = chunk_mb * len(chunks)  # same pad dims scale ~linearly
    print(f"device footprint per optimizer step: {chunk_mb:.1f} MB "
          f"(single-batch collation would hold ~{est_single_mb:.0f} MB)",
          flush=True)
    assert chunk_mb < 600, "per-chunk footprint must stay bounded"

    # one epoch of per-chunk optimizer steps (regression, gs view is the
    # expensive one — use gc here to bound the smoke's runtime on CPU)
    from fitgnn_tpu.models.models import GraphModel
    from fitgnn_tpu.train.steps import TrainState, adam_l2
    model = GraphModel(layer_name="GCNConv", hidden=args.hidden, num_layers=2,
                       out_dim=1, classify=False)
    b0 = chunks[0]
    params = model.init(jax.random.PRNGKey(0), b0.gc.x, b0.gc,
                        b0.gc_graph_ids, b0.num_graphs)
    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=adam_l2(0.01, 0.0))
    t0 = time.time()
    loss = 0.0
    for i, ch in enumerate(chunks):
        state, l_ = graph_train_step(state, ch, jax.random.PRNGKey(i),
                                     False, None, "gc")
        loss += float(l_)
    print(f"1 epoch = {len(chunks)} chunked optimizer steps in "
          f"{time.time()-t0:.1f}s (mean chunk loss "
          f"{loss/len(chunks):.4f})", flush=True)
    print("graph-scale smoke OK")


if __name__ == "__main__":
    main()
