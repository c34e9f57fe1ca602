"""Regression parity: FIT-GNN node_reg setups vs the full-graph baseline on
a synthetic smooth-target SBM (reference runs all exp setups for node
regression too, run.py:508).  Metric is the reference's std-normalized L1
test loss (run.py:110,168) — lower is better; parity means the subgraph
pipeline reaches the baseline's loss.

Usage: python scripts/regression_parity.py [--nodes 3000] [--runs 3]
"""

import argparse
import csv
import os
import tempfile
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=3000)
    ap.add_argument("--features", type=int, default=32)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--epochs1", type=int, default=40)
    ap.add_argument("--epochs2", type=int, default=40)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--layer", default="GCNConv")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from fitgnn_tpu.cli.main import main as cli
    from fitgnn_tpu.data.datasets import NodeDataset, save_npz_cache
    from fitgnn_tpu.data.synthetic import random_regression_graph

    x, s, r, y = random_regression_graph(num_nodes=args.nodes,
                                         num_features=args.features, seed=0)
    work = tempfile.mkdtemp(prefix="regparity_")
    os.makedirs(os.path.join(work, "dataset", "sbmreg"), exist_ok=True)
    save_npz_cache(os.path.join(work, "dataset", "sbmreg", "sbmreg.npz"),
                   NodeDataset("sbmreg", x, s, r, y))
    os.chdir(work)

    common = ["--dataset", "sbmreg", "--data_root", "dataset",
              "--task", "node_reg", "--experiment", "random",
              "--hidden", str(args.hidden),
              "--runs", str(args.runs), "--epochs1", str(args.epochs1),
              "--epochs2", str(args.epochs2), "--layer_name", args.layer]

    def parse_last_loss(baseline: bool):
        p = os.path.join("results", "baseline" if baseline else "",
                         "sbmreg.csv")
        with open(p) as f:
            rows = list(csv.DictReader(f))
        return rows[-1]["top_10_loss"]

    results = {}
    t0 = time.time()
    cli(["train", *common, "--baseline"])
    results["full-graph baseline"] = parse_last_loss(True)
    for setup in ("Gc_train_2_Gs_infer", "Gs_train_2_Gs_infer",
                  "Gc_train_2_Gs_train"):
        cli(["train", *common, "--train_fitgnn", "--exp_setup", setup])
        results[setup + " (plain)"] = parse_last_loss(False)
    for setup in ("Gs_train_2_Gs_infer", "Gc_train_2_Gs_train"):
        cli(["train", *common, "--train_fitgnn", "--exp_setup", setup,
             "--extra_node"])
        results[setup + " (extra_node halo)"] = parse_last_loss(False)
    print(f"\n=== regression parity (n={args.nodes}, {args.runs} runs, "
          f"{time.time()-t0:.0f}s; std-normalized L1, lower=better) ===")
    for k, v in results.items():
        print(f"  {k:<40s} {v}")


if __name__ == "__main__":
    main()
