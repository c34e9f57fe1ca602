"""Scaling-efficiency benchmark: distributed edges/s on 1..P devices.

Measures the shard_map training step on a community-placed sharded graph at
each device count, reporting edges/s and parallel efficiency vs 1 device —
the BASELINE north-star "≥75 % scaling efficiency" metric.  On a CPU host
mesh this validates logic and load balance (not bandwidth); run on a real
multi-chip slice for hardware numbers.

Usage: python scripts/scaling_bench.py [--nodes N] [--devices 1 2 4 8]
"""

import argparse
import time
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=65536)
    ap.add_argument("--degree", type=int, default=8)
    ap.add_argument("--features", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    import jax
    from fitgnn_tpu.data.synthetic import sbm_graph
    from fitgnn_tpu.data.splits import splits_classification
    from fitgnn_tpu.parallel import (
        make_mesh, shard_graph, DistNodeModel, create_dist_state,
        make_dist_train_step,
    )
    from fitgnn_tpu.partition.community import (leiden_communities,
                                                community_order)
    from fitgnn_tpu.parallel.multihost import placement_by_community

    n = args.nodes
    x, s, r, y = sbm_graph(num_nodes=n, num_classes=8,
                           num_features=args.features, p_in=0.0,
                           p_out=0.0, seed=0)
    # build edges directly (sbm_graph's sampler is slow at this scale)
    rng = np.random.default_rng(0)
    e = n * args.degree // 2
    rcv = rng.integers(0, n, e)
    comm = rcv // 256
    snd = np.where(rng.random(e) < 0.85,
                   comm * 256 + rng.integers(0, 256, e),
                   rng.integers(0, n, e))
    keep = snd != rcv
    snd, rcv = snd[keep], rcv[keep]
    train, val, test = splits_classification(y, 8, "ogbn_split", seed=0)

    labels = leiden_communities(snd, rcv, n, seed=0)
    base = None
    for p in args.devices:
        if p > len(jax.devices()):
            print(f"skip P={p}: only {len(jax.devices())} devices",
                  file=sys.stderr)
            continue
        order, _ = placement_by_community(labels, p)
        mesh = make_mesh(p)
        sg = shard_graph(x, snd, rcv, y, p, train_mask=train, order=order)
        model = DistNodeModel(hidden=args.hidden, num_layers=2, out_dim=8)
        state = create_dist_state(model, jax.random.PRNGKey(0), sg)
        step = make_dist_train_step(mesh, model)
        with mesh:
            state, loss = step(state, sg, jax.random.PRNGKey(1))
            _ = float(loss)
            t0 = time.perf_counter()
            for i in range(args.steps):
                state, loss = step(state, sg, jax.random.PRNGKey(2 + i))
            _ = float(loss)
            dt = (time.perf_counter() - t0) / args.steps
        eps = len(snd) * 2 / dt
        if base is None:
            base = eps
        eff = eps / (base * p)
        print(f"P={p}: {dt*1e3:8.1f} ms/step  {eps/1e6:8.2f} M edges/s  "
              f"efficiency {eff*100:5.1f}%")


if __name__ == "__main__":
    main()
