"""Products-scale ingest rehearsal: the full proxy pipeline on a synthetic
2.4M-node graph (ogbn-products is 2,449,029 nodes / 61.9M undirected edges;
real files cannot be downloaded in this environment).

Stages timed (the reference's ogbn path, ``main.py:247-267``):
  1. C++ Leiden community detection on the full graph
  2. merge_communities → ≤165k-node proxy selection + induced subgraph
  3. variation-basis eigensolve (LOBPCG path) + coarsening on the proxy
  4. metanode partition (subgraph extraction)

Usage: python scripts/products_proxy.py [--nodes 2449029] [--degree 25]
"""

import argparse
import time

import numpy as np


def stage(name, t0):
    dt = time.time() - t0
    print(f"  {name:<42s} {dt:8.1f} s", flush=True)
    return time.time()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=2_449_029)
    ap.add_argument("--degree", type=int, default=25)
    ap.add_argument("--cap", type=int, default=165_000)
    ap.add_argument("--features", type=int, default=100)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from fitgnn_tpu.partition.community import (leiden_communities,
                                                merge_communities)
    from fitgnn_tpu.partition import coarsen_and_partition

    n = args.nodes
    rng = np.random.default_rng(0)
    print(f"synthesizing {n} nodes, ~{n*args.degree//2} edges ...",
          flush=True)
    t0 = time.time()
    e = n * args.degree // 2
    rcv = rng.integers(0, n, e, dtype=np.int64)
    comm = rcv // 512
    snd = np.where(rng.random(e) < 0.85,
                   np.minimum(comm * 512 + rng.integers(0, 512, e), n - 1),
                   rng.integers(0, n, e, dtype=np.int64))
    keep = snd != rcv
    snd, rcv = snd[keep], rcv[keep]
    t0 = stage("synthesize edges", t0)

    labels = leiden_communities(snd, rcv, n, seed=0)
    t0 = stage(f"C++ Leiden ({labels.max()+1} communities)", t0)

    keep_nodes = merge_communities(labels, args.cap)
    lookup = np.full(n, -1, dtype=np.int64)
    lookup[keep_nodes] = np.arange(len(keep_nodes))
    sel = (lookup[snd] >= 0) & (lookup[rcv] >= 0)
    ps, pr = lookup[snd[sel]], lookup[rcv[sel]]
    pn = len(keep_nodes)
    t0 = stage(f"community merge -> proxy ({pn} nodes, {len(ps)} edges)", t0)

    x = rng.standard_normal((pn, args.features)).astype(np.float32)
    y = rng.integers(0, 47, pn).astype(np.int64)
    train = rng.random(pn) < 0.08
    part = coarsen_and_partition(
        x, ps, pr, y, reduction=0.5, method="variation_neighborhoods",
        num_classes=47, train_mask=train, val_mask=~train, test_mask=~train,
        seed=0)
    t0 = stage(f"coarsen + partition ({part.num_metanodes} metanodes, "
               f"{part.subgraphs.num_subgraphs} subgraphs)", t0)
    print("products-proxy pipeline complete")


if __name__ == "__main__":
    main()
