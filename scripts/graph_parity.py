"""Graph-task parity: graph_cls + graph_reg across all four graph-level
experiment setups (reference ``run.py:575,707``: Gc_train_2_Gc_infer,
Gc_train_2_Gs_infer, Gs_train_2_Gs_infer, Gc_train_2_Gs_train) on synthetic
datasets, judged against chance (real TU/QM9 files cannot be downloaded
here — zero egress).

* graph_cls: structure+feature-separable 2-class set
  (``synthetic.random_graph_dataset``); chance = majority-class frequency.
* graph_reg: same graphs with a continuous structural target
  (edge density + feature mean); "chance" = predicting the target mean,
  whose std-normalized L1 is ≈ 0.80 for a centered Gaussian-ish target —
  parity means losses WELL below that.

Runs the real CLI entry points end to end.
Usage: python scripts/graph_parity.py [--graphs 60] [--epochs 30]
"""

import argparse
import csv
import os
import tempfile
import time

import numpy as np

SETUPS = ("Gc_train_2_Gc_infer", "Gc_train_2_Gs_infer",
          "Gs_train_2_Gs_infer", "Gc_train_2_Gs_train")


def save_graph_npz(path, graphs, y):
    arr = np.empty(len(graphs), dtype=object)
    for i, g in enumerate(graphs):
        arr[i] = g
    np.savez(path, graphs=arr, y=y, allow_pickle=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", type=int, default=60)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--layer", default="GCNConv")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from fitgnn_tpu.cli.main import main as cli
    from fitgnn_tpu.data.synthetic import random_graph_dataset

    graphs, y_cls = random_graph_dataset(num_graphs=args.graphs,
                                         min_nodes=12, max_nodes=30, seed=0)
    # continuous structural target: edge density + mean feature level
    y_reg = np.asarray([len(s) / len(x) + x.mean()
                        for (x, s, r) in graphs], dtype=np.float32)

    work = tempfile.mkdtemp(prefix="graphparity_")
    for name, y in (("sgc", y_cls), ("sgr", y_reg)):
        os.makedirs(os.path.join(work, "dataset", name), exist_ok=True)
        save_graph_npz(os.path.join(work, "dataset", name,
                                    f"{name}_graphs.npz"), graphs, y)
    os.chdir(work)

    def last_row(name):
        with open(os.path.join("results", f"{name}.csv")) as f:
            return list(csv.DictReader(f))[-1]

    results = {}
    t0 = time.time()
    for task, name in (("graph_cls", "sgc"), ("graph_reg", "sgr")):
        for setup in SETUPS:
            variants = [[]]
            if setup != "Gc_train_2_Gc_infer":
                variants.append(["--extra_node"])
            for extra in variants:
                cli(["train", "--dataset", name, "--data_root", "dataset",
                     "--task", task, "--experiment", "random",
                     "--hidden", str(args.hidden),
                     "--epochs1", str(args.epochs), "--epochs2",
                     str(args.epochs), "--layer_name", args.layer,
                     "--train_fitgnn", "--exp_setup", setup, *extra])
                row = last_row(name)
                tag = f"{task} {setup}" + (" (extra_node)" if extra else "")
                results[tag] = (row["best_test_acc"], row["best_test_loss"])

    counts = np.bincount(y_cls)
    chance = counts.max() / counts.sum()
    print(f"\n=== graph-task parity ({args.graphs} graphs, "
          f"{time.time()-t0:.0f}s) ===")
    print(f"  graph_cls chance (majority class): {chance:.3f}")
    print("  graph_reg 'predict the mean' std-normalized L1: ~0.80")
    print(f"  {'setup':<44s} {'best_acc/metric':>16s} {'best_loss':>12s}")
    for k, (a, l) in results.items():
        print(f"  {k:<44s} {float(a):>16.4f} {float(l):>12.4f}")


if __name__ == "__main__":
    main()
