"""Graph-level flagship session — the last reference workload family
(graph_cls / graph_reg, ``run.py:575,707``, per-graph inference timing
``inference.py:22-116``) ON THE CHIP at QM9 scale (130 831 molecules,
``dataset_info.csv:13``), through this framework's CLI (VERDICT r4 ask #5).

Stages (each timed, wall-clock):
  synth       host: 130k QM9-like molecules (data.synthetic.qm9_like_dataset
              — learnable regression target, 2-class structural label),
              written in the documented <name>_graphs.npz format for BOTH
              tasks (qm9proxy = graph_reg targets, qm9proxycls = labels)
  train-reg   CLI train --task graph_reg Gc_train_2_Gs_train, chunked
              minibatches (reference T_DataLoader batching, run.py:577-580)
  train-cls   CLI train --task graph_cls, same path
  infer       CLI infer --task graph_reg: per-graph latency, Gs + Gc views,
              wall-clock AND device-time columns
  memory      CLI memory --task graph_reg: chunk_gs / chunk_gc / max_graph

Run on the chip:  python scripts/graph_flagship.py --workspace /tmp/graphflag
Small rehearsal:  FITGNN_GRAPHFLAG_GRAPHS=5000 ... --platform cpu
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

N_GRAPHS = int(os.environ.get("FITGNN_GRAPHFLAG_GRAPHS", 130_831))

# flags shared by EVERY subcommand (the `common` argparse group)
BASE = ["--data_root", "dataset", "--coarsening_ratio", "0.5",
        "--coarsening_method", "variation_neighborhoods", "--extra_node"]
# model flags — train/infer only (memory/stats do not define them)
COMMON = [*BASE, "--layer_name", "GCNConv", "--hidden", "64",
          "--num_layers1", "2"]


def synth(ws: str):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from fitgnn_tpu.data.synthetic import qm9_like_dataset

    graphs, y_reg, y_cls = qm9_like_dataset(N_GRAPHS, seed=0)
    arr = np.empty(len(graphs), dtype=object)
    for i, g in enumerate(graphs):
        arr[i] = g
    for name, y in (("qm9proxy", y_reg), ("qm9proxycls", y_cls)):
        d = os.path.join(ws, "dataset", name)
        os.makedirs(d, exist_ok=True)
        np.savez(os.path.join(d, f"{name}_graphs.npz"), graphs=arr, y=y)
    nn = [g[0].shape[0] for g in graphs]
    print(f"synth: {len(graphs)} molecules, {min(nn)}-{max(nn)} atoms, "
          f"reg target std={y_reg.std():.3f}", flush=True)


def cli(ws: str, argv, platform=None, tee="cli.log"):
    env = dict(os.environ)
    parts = [REPO] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                      if p]
    axon = "/root/.axon_site"
    if platform == "cpu":                   # plugin overrides JAX_PLATFORMS
        parts = [p for p in parts if p != axon]
    elif os.path.isdir(axon) and axon not in parts:
        parts.append(axon)
    env["PYTHONPATH"] = os.pathsep.join(parts)
    if platform:
        env["JAX_PLATFORMS"] = platform
    print(f"$ fitgnn-tpu {' '.join(argv)}", flush=True)
    log_path = os.path.join(ws, tee)
    with open(log_path, "a") as f:
        f.write(f"\n$ fitgnn-tpu {' '.join(argv)}\n")
        f.flush()
        start = f.tell()
        p = subprocess.run([sys.executable, "-m", "fitgnn_tpu.cli.main"]
                           + argv, cwd=ws, env=env, stdout=f,
                           stderr=subprocess.STDOUT, text=True)
    with open(log_path) as f:
        f.seek(start)
        out = f.read()
    sys.stdout.write(out[-6000:])
    if p.returncode:
        raise SystemExit(f"CLI failed ({p.returncode})")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", default="/tmp/graphflag")
    ap.add_argument("--stage", default="all",
                    choices=["all", "synth", "train-reg", "train-cls",
                             "infer", "memory"])
    ap.add_argument("--epochs1", type=int, default=5)
    ap.add_argument("--epochs2", type=int, default=5)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=0.002,
                    help="chunked graph-level training takes "
                         "~graphs/batch_size optimizer steps per epoch "
                         "(511 at QM9 scale) — the full-batch default "
                         "0.01 destabilizes graph_cls (round-5 session)")
    ap.add_argument("--num_test_samples", type=int, default=64)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    ws = args.workspace
    os.makedirs(ws, exist_ok=True)
    timings = {}

    def tic(name, fn):
        t0 = time.time()
        fn()
        timings[name] = time.time() - t0
        print(f"[{name}] {timings[name]:.1f} s", flush=True)

    stages = ([args.stage] if args.stage != "all"
              else ["synth", "train-reg", "train-cls", "infer", "memory"])

    if "synth" in stages:
        if os.path.exists(os.path.join(ws, "dataset", "qm9proxy",
                                       "qm9proxy_graphs.npz")):
            print("synth: npz exists, skipping", flush=True)
        else:
            tic("synth", lambda: synth(ws))

    train_common = [*COMMON, "--exp_setup", "Gc_train_2_Gs_train",
                    "--epochs1", str(args.epochs1),
                    "--epochs2", str(args.epochs2),
                    "--lr", str(args.lr),
                    "--batch_size", str(args.batch_size), "--runs", "1",
                    "--train_fitgnn"]
    if "train-reg" in stages:
        tic("train-reg", lambda: cli(
            ws, ["train", "--task", "graph_reg", "--dataset", "qm9proxy",
                 *train_common], platform=args.platform, tee="train_reg.log"))
    if "train-cls" in stages:
        tic("train-cls", lambda: cli(
            ws, ["train", "--task", "graph_cls", "--dataset", "qm9proxycls",
                 *train_common], platform=args.platform, tee="train_cls.log"))

    if "infer" in stages:
        tic("infer", lambda: cli(
            ws, ["infer", "--task", "graph_reg", "--dataset", "qm9proxy",
                 *COMMON, "--num_test_samples", str(args.num_test_samples),
                 "--checkpoint", "save/graph_reg/out/model"],
            platform=args.platform, tee="infer.log"))

    if "memory" in stages:
        tic("memory", lambda: cli(
            ws, ["memory", "--task", "graph_reg", "--dataset", "qm9proxy",
                 *BASE], platform="cpu", tee="memory.log"))

    out = os.path.join(ws, "timings.json")
    existing = {}
    if os.path.exists(out):
        existing = json.load(open(out))
    existing.update(timings)
    json.dump(existing, open(out, "w"), indent=1)
    print("\n=== graph flagship wall-clock ===")
    for k, v in existing.items():
        print(f"  {k:<12s} {v:9.1f} s")


if __name__ == "__main__":
    main()
