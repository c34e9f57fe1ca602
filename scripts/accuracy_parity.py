"""Accuracy parity: FIT-GNN setups vs the full-graph baseline on a
synthetic SBM (real datasets cannot be downloaded here; the north-star
metric is "test-accuracy delta vs the full-graph reference ≈ 0",
BASELINE.json).  Runs the actual CLI entry points end to end.

Usage: python scripts/accuracy_parity.py [--nodes 5000] [--runs 5]
"""

import argparse
import os
import tempfile
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=5000)
    ap.add_argument("--classes", type=int, default=5)
    ap.add_argument("--features", type=int, default=64)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--epochs1", type=int, default=60)
    ap.add_argument("--epochs2", type=int, default=60)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--layer", default="GCNConv",
                    help="conv layer for all runs (GCNConv/GATConv/...)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from fitgnn_tpu.cli.main import main as cli
    from fitgnn_tpu.data.datasets import NodeDataset, save_npz_cache
    from fitgnn_tpu.data.synthetic import sbm_graph

    x, s, r, y = sbm_graph(num_nodes=args.nodes, num_classes=args.classes,
                           num_features=args.features, p_in=0.01,
                           p_out=0.0008, seed=0)
    work = tempfile.mkdtemp(prefix="parity_")
    os.makedirs(os.path.join(work, "dataset", "sbm"), exist_ok=True)
    save_npz_cache(os.path.join(work, "dataset", "sbm", "sbm.npz"),
                   NodeDataset("sbm", x, s, r, y))
    os.chdir(work)

    common = ["--dataset", "sbm", "--data_root", "dataset",
              "--experiment", "random", "--hidden", str(args.hidden),
              "--runs", str(args.runs), "--epochs1", str(args.epochs1),
              "--epochs2", str(args.epochs2), "--layer_name", args.layer]

    def parse_last_acc(baseline: bool):
        import csv
        p = os.path.join("results", "baseline" if baseline else "",
                         "sbm.csv")
        with open(p) as f:
            rows = list(csv.DictReader(f))
        return rows[-1]["ave_acc"]

    results = {}
    t0 = time.time()
    cli(["train", *common, "--baseline"])
    results["full-graph baseline"] = parse_last_acc(True)
    for setup in ("Gc_train_2_Gs_infer", "Gs_train_2_Gs_infer",
                  "Gc_train_2_Gs_train"):
        cli(["train", *common, "--train_fitgnn", "--exp_setup", setup])
        results[setup + " (plain)"] = parse_last_acc(False)
    for setup in ("Gs_train_2_Gs_infer", "Gc_train_2_Gs_train"):
        cli(["train", *common, "--train_fitgnn", "--exp_setup", setup,
             "--extra_node"])
        results[setup + " (extra_node halo)"] = parse_last_acc(False)
    for setup in ("Gs_train_2_Gs_infer", "Gc_train_2_Gs_train"):
        # cluster_node: coarse-cluster summary nodes + inter-cluster edges
        # (reference utils.py:191-267 — one of its three headline node modes)
        cli(["train", *common, "--train_fitgnn", "--exp_setup", setup,
             "--cluster_node"])
        results[setup + " (cluster_node)"] = parse_last_acc(False)
    print(f"\n=== accuracy parity (SBM n={args.nodes}, {args.runs} runs, "
          f"{time.time()-t0:.0f}s) ===")
    for k, v in results.items():
        print(f"  {k:<24s} {v}")


if __name__ == "__main__":
    main()
