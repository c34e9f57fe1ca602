"""Flagship end-to-end products-proxy run — the reference's headline
workload (``main.py:247-267`` ogbn-products → Leiden proxy → coarsen →
``run.py:329`` curriculum train → ``inference.py`` timing → memory rows)
through THIS framework's CLI, as one recorded session.

Stages (each timed, wall-clock):
  synth   host: synthesize the 2.45M-node products-scale graph (real ogbn
          files cannot be downloaded here — zero egress), labels/features
          community-correlated so accuracy is meaningful, saved in the
          documented npz-cache format
  ingest  CLI save-graphs: auto community proxy (>170k nodes → Leiden →
          165k cap) + coarsen + partition, cached content-hashed
  train   CLI train --train_fitgnn Gc_train_2_Gs_train (Gc full-graph on
          the hybrid MXU operator + Gs over subgraphs, MB gradient mode)
  infer   CLI infer (FIT-GNN subgraph inference) + infer-baseline
  memory  CLI memory — full-graph vs max-subgraph rows
  stats   CLI stats — dataset_info row

Run it ON THE CHIP (default platform = the tunnel):
  python scripts/flagship_e2e.py --workspace /tmp/flagship [--stage all]
Host-only stages force JAX_PLATFORMS=cpu themselves; device stages run on
whatever platform jax selects (the TPU under axon).
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_NODES = 2_449_029          # ogbn-products node count
DEGREE = 25                  # ~30.6M directed edges (disk/RAM-bounded proxy
                             # of products' 61.9M undirected)
N_CLASSES = 47               # ogbn-products classes
N_FEATURES = 100             # ogbn-products feature dim
COMM = 512                   # planted community size
# flags every subcommand shares (the `common` argparse group)
COMMON_ARGS = [
    "--dataset", "productsproxy", "--data_root", "dataset",
    "--experiment", "random",
    "--coarsening_ratio", "0.5",
    "--coarsening_method", "variation_neighborhoods",
    "--extra_node", "--use_community_detection", "--bucket_sizes",
    # 2 buckets = 2 MB-train + 2 eval executables instead of 5+5: every
    # extra GB-workspace program raises the tunnel worker's crash odds
    "--max_buckets", "2",
]
MODEL_ARGS = ["--layer_name", "GCNConv", "--hidden", "512",
              "--num_layers1", "2"]
TRAIN_ARGS = [*COMMON_ARGS, *MODEL_ARGS, "--runs", "1"]


def synth(ws: str):
    """Products-scale synthetic graph with planted community structure:
    85% intra-community edges, labels = community class, features =
    class centroid + noise (so the task is learnable, like ogbn's)."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from fitgnn_tpu.data.datasets import NodeDataset, save_npz_cache

    rng = np.random.default_rng(0)
    n, e = N_NODES, N_NODES * DEGREE // 2
    rcv = rng.integers(0, n, e, dtype=np.int64)
    comm = rcv // COMM
    snd = np.where(rng.random(e) < 0.85,
                   np.minimum(comm * COMM + rng.integers(0, COMM, e), n - 1),
                   rng.integers(0, n, e, dtype=np.int64))
    keep = snd != rcv
    snd, rcv = snd[keep], rcv[keep]
    y = ((np.arange(n) // COMM) % N_CLASSES).astype(np.int64)
    centroids = rng.standard_normal((N_CLASSES, N_FEATURES)).astype(
        np.float32)
    x = centroids[y] + 1.5 * rng.standard_normal(
        (n, N_FEATURES)).astype(np.float32)
    d = os.path.join(ws, "dataset", "productsproxy")
    os.makedirs(d, exist_ok=True)
    save_npz_cache(os.path.join(d, "productsproxy.npz"),
                   NodeDataset("productsproxy", x, snd, rcv, y))
    print(f"synth: {n} nodes, {len(snd)} edges, {N_CLASSES} classes, "
          f"F={N_FEATURES}", flush=True)


def cli(ws: str, argv, platform=None, tee=None):
    env = dict(os.environ)
    parts = [REPO] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                      if p]
    # the TPU tunnel's PJRT plugin registers via sitecustomize on this path;
    # losing it silently downgrades the run to CPU-only backends
    axon = "/root/.axon_site"
    if os.path.isdir(axon) and axon not in parts:
        parts.append(axon)
    env["PYTHONPATH"] = os.pathsep.join(parts)
    if platform:
        env["JAX_PLATFORMS"] = platform
    print(f"$ fitgnn-tpu {' '.join(argv)}", flush=True)
    # stream stdout+stderr LIVE into the tee file (a buffered subprocess
    # hides an hour of per-phase progress until exit — round-4 flagship)
    log_path = os.path.join(ws, tee or "cli.log")
    with open(log_path, "a") as f:
        f.write(f"\n$ fitgnn-tpu {' '.join(argv)}\n")
        f.flush()
        start = f.tell()
        p = subprocess.run([sys.executable, "-m", "fitgnn_tpu.cli.main"]
                           + argv, cwd=ws, env=env, stdout=f,
                           stderr=subprocess.STDOUT, text=True)
    # echo/return only THIS invocation's output (the tee file accumulates
    # across retries and stages sharing it)
    with open(log_path) as f:
        f.seek(start)
        out = f.read()
    sys.stdout.write(out[-8000:])
    if p.returncode:
        raise SystemExit(f"CLI failed ({p.returncode})")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", default="/tmp/flagship")
    ap.add_argument("--stage", default="all",
                    choices=["all", "synth", "ingest", "train",
                             "train-baseline", "infer", "memory"])
    ap.add_argument("--epochs1", type=int, default=40)
    ap.add_argument("--epochs2", type=int, default=20)
    ap.add_argument("--batch_size", type=int, default=512)
    ap.add_argument("--eval_chunk", type=int, default=8192)
    # ~256 MB per (chunk, E_pad, hidden) message buffer: the Gc program +
    # 5 MB-train + 5 eval executables must COEXIST on one chip; 1<<28
    # workspaces measured to crash the tunnel worker at program load
    ap.add_argument("--chunk_budget", type=int, default=1 << 26)
    ap.add_argument("--retries", type=int, default=2,
                    help="extra attempts for the train stage when the "
                         "tunnel worker dies mid-run")
    ap.add_argument("--platform", default=None,
                    help="override JAX_PLATFORMS for the device stages")
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
              else ["synth", "ingest", "train", "train-baseline", "infer",
                    "memory"])

    if "synth" in stages:
        npz = os.path.join(ws, "dataset", "productsproxy",
                           "productsproxy.npz")
        if os.path.exists(npz):
            print("synth: npz exists, skipping", flush=True)
        else:
            tic("synth", lambda: synth(ws))

    if "ingest" in stages:
        # host stage: Leiden proxy + coarsen + partition into the cache
        tic("ingest", lambda: cli(
            ws, ["save-graphs", *COMMON_ARGS], platform="cpu"))

    if "train" in stages:
        def train_once(resume):
            cli(ws, ["train", *TRAIN_ARGS, "--train_fitgnn",
                     "--exp_setup", "Gc_train_2_Gs_train",
                     "--epochs1", str(args.epochs1),
                     "--epochs2", str(args.epochs2),
                     "--gradient_method", "MB",
                     "--batch_size", str(args.batch_size),
                     "--eval_chunk", str(args.eval_chunk),
                     "--chunk_budget", str(args.chunk_budget),
                     "--checkpoint_every", "5",
                     *(["--resume"] if resume else []),
                     "--fused_epochs"],
                platform=args.platform, tee="train.log")

        def train_retry():
            # the tunnel's TPU worker intermittently dies mid-session under
            # many large resident executables; a fresh process recovers it
            # and --resume continues from the last 5-epoch checkpoint
            # instead of restarting the curriculum
            for attempt in range(args.retries):
                try:
                    return train_once(resume=attempt > 0)
                except SystemExit as e:
                    print(f"train attempt {attempt + 1} failed ({e}); "
                          f"resuming", flush=True)
            return train_once(resume=args.retries > 0)

        tic("train", train_retry)

    if "train-baseline" in stages:
        # full-graph training on the 165k community proxy (the reference
        # trains the products baseline on the same merged proxy,
        # main.py:247-267 -> run.py:832); supplies the checkpoint
        # infer-baseline's timed protocol loads
        tic("train-baseline", lambda: cli(
            ws, ["train", *TRAIN_ARGS, "--baseline",
                 "--epochs1", str(args.epochs1), "--fused_epochs"],
            platform=args.platform, tee="train_baseline.log"))

    if "infer" in stages:
        tic("infer", lambda: cli(
            ws, ["infer", *COMMON_ARGS, *MODEL_ARGS, "--num_test_samples", "64",
                 "--checkpoint", "save/node_cls/out/model"],
            platform=args.platform, tee="infer.log"))
        tic("infer-baseline", lambda: cli(
            ws, ["infer-baseline", *COMMON_ARGS, *MODEL_ARGS, "--num_test_samples", "64"],
            platform=args.platform, tee="infer.log"))

    if "memory" in stages:
        tic("memory", lambda: cli(ws, ["memory", *COMMON_ARGS],
                                  platform="cpu"))
        tic("stats", lambda: cli(ws, ["stats", "--dataset", "productsproxy",
                                      "--data_root", "dataset",
                                      "--use_community_detection"],
                                 platform="cpu"))

    out = os.path.join(ws, "timings.json")
    existing = {}
    if os.path.exists(out):
        existing = json.load(open(out))
    existing.update(timings)
    json.dump(existing, open(out, "w"), indent=1)
    print("\n=== flagship e2e wall-clock ===")
    for k, v in existing.items():
        print(f"  {k:<16s} {v:9.1f} s")


if __name__ == "__main__":
    main()
