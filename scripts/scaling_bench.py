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

    from fitgnn_tpu.parallel import (DistNodeModelHalo, build_halo_plan,
                                     make_halo_train_step)

    labels = leiden_communities(snd, rcv, n, seed=0)
    base = {}
    print("per-layer collective traffic per device (the scaling-relevant "
          "quantity; CPU-mesh wall-clock is core-contention-bound):")
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
        plan = build_halo_plan(np.asarray(sg.senders),
                               np.asarray(sg.receivers),
                               np.asarray(sg.edge_weight), p,
                               sg.nodes_per_shard)
        halo_model = DistNodeModelHalo(hidden=args.hidden, num_layers=2,
                                       out_dim=8)

        gather_mb = sg.num_nodes_global * args.hidden * 4 / 1e6
        halo_mb = p * plan.k * args.hidden * 4 / 1e6
        cut = float(np.asarray(plan.send_mask).sum())

        rows = {}
        for name, st in (
            ("all-gather", make_dist_train_step(mesh, model)),
            ("halo", make_halo_train_step(mesh, halo_model, plan)),
        ):
            with mesh:
                if name == "all-gather":
                    args_ = (sg, )
                    run = lambda key: st(state, sg, key)  # noqa: E731
                else:
                    run = lambda key: st(state, sg.x, sg.y,  # noqa: E731
                                         sg.train_mask, plan, key)
                _, loss = run(jax.random.PRNGKey(1))
                _ = float(loss)
                t0 = time.perf_counter()
                for i in range(args.steps):
                    _, loss = run(jax.random.PRNGKey(2 + i))
                _ = float(loss)
                dt = (time.perf_counter() - t0) / args.steps
            eps = len(snd) * 2 / dt
            base.setdefault(name, eps)
            eff = eps / (base[name] * p)
            rows[name] = (dt, eps, eff)
        ag = rows["all-gather"]
        ha = rows["halo"]
        print(f"P={p}: all-gather {ag[0]*1e3:7.1f} ms  {ag[1]/1e6:7.2f} Me/s "
              f"(recv {gather_mb:7.2f} MB/dev/layer) | "
              f"halo {ha[0]*1e3:7.1f} ms  {ha[1]/1e6:7.2f} Me/s "
              f"(recv {halo_mb:7.2f} MB/dev/layer, {int(cut)} boundary rows)")


if __name__ == "__main__":
    main()
