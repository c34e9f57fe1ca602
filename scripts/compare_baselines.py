"""Format this framework's results next to the committed comparison-baseline
numbers (SGGC / GCond / DosCond / KIDD / BONSAI — the accuracy CSVs those
vendored repos ship, recorded in BASELINE.md; SURVEY §2.5 scopes them as
benchmark targets, not reimplementations).

Reads our ``results/{dataset}.csv`` / ``results/baseline/{dataset}.csv``
(written by ``fitgnn-tpu train``) from --results_root and prints a
side-by-side table per (dataset, layer); rows we have no run for yet show
"-".  Usage:

    python scripts/compare_baselines.py --results_root .
"""

from __future__ import annotations

import argparse
import csv
import os

# committed baseline accuracy rows (method, dataset, layer, setting, acc, std)
# — transcribed from the vendored repos' result CSVs via BASELINE.md
BASELINES = [
    ("SGGC (KDD'21)", "physics", "GAT", "r=0.3", 0.8705, 0.0169),
    ("SGGC (KDD'21)", "physics", "GAT", "r=0.5", 0.8429, 0.0180),
    ("GCond (ICLR'22)", "cora", "GCN", "rr=0.5", 0.8083, 0.0050),
    ("GCond (ICLR'22)", "citeseer", "GCN", "rr=0.3", 0.7227, 0.0012),
    ("DosCond (KDD'22)", "proteins", "GCN", "ipc=50", 0.6559, 0.0205),
    ("KIDD (KDD'23)", "proteins", "GCN", "gpc=50", 0.6714, 0.0017),
    ("BONSAI", "cora", "GCN", "r=0.1", 0.7298, 0.0082),
    ("BONSAI", "citeseer", "GCN", "r=0.1", 0.5768, 0.0068),
]


def _parse_acc(cell: str):
    """'0.81 +/- 0.02' → (0.81, 0.02)."""
    try:
        if "+/-" in cell:
            m, s = cell.split("+/-")
            return float(m), float(s)
        return float(cell), 0.0
    except ValueError:
        return None


def load_our_results(results_root: str, dataset: str):
    """Best (acc, std, tag) over our results CSVs for a dataset, per layer."""
    out = {}
    for sub, tag in (("", "fitgnn"), ("baseline", "full-graph")):
        path = os.path.join(results_root, "results", sub, f"{dataset}.csv")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            for row in csv.DictReader(f):
                layer = row.get("layer_name", "?").replace("Conv", "")
                acc = _parse_acc(row.get("ave_acc", ""))
                if acc is None:
                    continue
                setting = (f"{tag} r={row.get('coarsening_ratio', '?')} "
                           f"{row.get('exp_setup', '')}").strip()
                cur = out.get(layer)
                if cur is None or acc[0] > cur[0]:
                    out[layer] = (acc[0], acc[1], setting)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results_root", default=".")
    args = ap.parse_args()

    print(f"{'method':<18} {'dataset':<10} {'layer':<5} {'setting':<8} "
          f"{'baseline acc':<16} {'ours (best)':<20} ours setting")
    print("-" * 110)
    for method, ds, layer, setting, acc, std in BASELINES:
        ours = load_our_results(args.results_root, ds).get(layer)
        ours_s = "-" if ours is None else f"{ours[0]:.4f} ± {ours[1]:.4f}"
        ours_tag = "" if ours is None else ours[2]
        print(f"{method:<18} {ds:<10} {layer:<5} {setting:<8} "
              f"{acc:.4f} ± {std:.4f}  {ours_s:<20} {ours_tag}")


if __name__ == "__main__":
    main()
