"""Flagship end-to-end products-proxy run — the reference's headline
workload (``main.py:247-267`` ogbn-products → Leiden proxy → coarsen →
``run.py:329`` curriculum train → ``inference.py`` timing → memory rows)
through THIS framework's CLI, as one recorded session.

Stages (each timed, wall-clock):
  synth   host: synthesize the 2.45M-node products-scale graph (real ogbn
          files cannot be downloaded here — zero egress).  HARD MODE
          (round 5, VERDICT r4 ask #1): features are weakly informative
          (sigma=6 noise — a feature-only MLP lands ~0.16 at 50k-node
          calibration, scripts/hard_proxy_calibrate.py), labels require
          neighborhood structure (0.85 intra-community homophily) and
          carry a 10% annotation-noise fraction capping every method at
          ~0.902 — the regime where the reference's ogbn-products
          accuracy story lives and coarsening can actually hurt
  probe   feature-only MLP accuracy on the synthesized graph (the
          hard-mode evidence: must land well below the GNN numbers)
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
if REPO not in sys.path:                # in-process stages (synth/probe)
    sys.path.insert(0, REPO)

# env override supports small-scale CPU rehearsals of the whole session
N_NODES = int(os.environ.get("FITGNN_FLAGSHIP_NODES", 2_449_029))
DEGREE = 25                  # ~30.6M directed edges (disk/RAM-bounded proxy
                             # of products' 61.9M undirected)
N_CLASSES = 47               # ogbn-products classes
N_FEATURES = 100             # ogbn-products feature dim
COMM = 512                   # planted community size
FEATURE_SIGMA = 6.0          # calibrated: feature-only MLP ~0.16 at 50k
LABEL_NOISE = 0.1            # annotation noise: accuracy ceiling ~0.902
# flags every subcommand shares (the `common` argparse group); ogbn_split
# (8% train / 2% val / 90% test) is the reference's products protocol
COMMON_ARGS = [
    "--dataset", "productsproxy", "--data_root", "dataset",
    "--experiment", "ogbn_split",
    "--coarsening_ratio", "0.5",
    "--coarsening_method", "variation_neighborhoods",
    "--extra_node", "--use_community_detection", "--bucket_sizes",
    # round 5: the planner derives the operational knobs (bucket cap 2,
    # 1<<26 chunk budget at this scale, tile threshold from the coarse
    # graph's histogram) — no hand-tuned values in the driver
    "--auto_config",
]


def model_args(layer: str):
    # GAT: single-head attention at width 512 trains poorly in the hard
    # regime (20k calibration: h512 0.41-0.72 vs h256 0.89 at 100 epochs);
    # width 256 + feature normalization is the calibrated GAT config
    hidden = "256" if layer == "GATConv" else "512"
    return ["--layer_name", layer, "--hidden", hidden, "--num_layers1", "2"]


def synth(ws: str):
    """Hard-mode products-scale proxy (data.synthetic.planted_products_graph):
    planted communities, weak features, structure-dependent labels, 10%
    label noise — see the module docstring for the regime."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from fitgnn_tpu.data.datasets import NodeDataset, save_npz_cache
    from fitgnn_tpu.data.synthetic import planted_products_graph

    x, snd, rcv, y = planted_products_graph(
        N_NODES, degree=DEGREE, community_size=COMM, num_classes=N_CLASSES,
        num_features=N_FEATURES, feature_sigma=FEATURE_SIGMA,
        label_noise=LABEL_NOISE, seed=0)
    d = os.path.join(ws, "dataset", "productsproxy")
    os.makedirs(d, exist_ok=True)
    save_npz_cache(os.path.join(d, "productsproxy.npz"),
                   NodeDataset("productsproxy", x, snd, rcv, y))
    print(f"synth: {N_NODES} nodes, {len(snd)} edges, {N_CLASSES} classes, "
          f"F={N_FEATURES}, sigma={FEATURE_SIGMA}, "
          f"label_noise={LABEL_NOISE}", flush=True)


def probe(ws: str):
    """Feature-only MLP accuracy on the synthesized proxy (CPU): the
    hard-mode evidence row.  Uses the ogbn_split train/test protocol on a
    400k-node subsample (the probe sees features only, so a subsample is
    representative; full 2.45M MLP training adds nothing)."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from hard_proxy_calibrate import probe_accuracy
    from fitgnn_tpu.data.datasets import load_npz_cache
    from fitgnn_tpu.data.splits import splits_classification

    ds = load_npz_cache(os.path.join(ws, "dataset", "productsproxy",
                                     "productsproxy.npz"), "productsproxy")
    rng = np.random.default_rng(0)
    sub = rng.choice(len(ds.y), size=min(400_000, len(ds.y)), replace=False)
    x, y = ds.x[sub], np.asarray(ds.y)[sub]
    train, _, test = splits_classification(y, N_CLASSES, "ogbn_split", seed=0)
    acc_lin = probe_accuracy(x, y, train, test, hidden=0,
                             num_classes=N_CLASSES)
    acc_mlp = probe_accuracy(x, y, train, test, hidden=256,
                             num_classes=N_CLASSES)
    out = {"feature_only_linear_acc": acc_lin, "feature_only_mlp_acc": acc_mlp}
    json.dump(out, open(os.path.join(ws, "probe.json"), "w"))
    print(f"probe: linear={acc_lin:.4f} mlp={acc_mlp:.4f} "
          f"(47-class chance=0.021)", flush=True)


def cli(ws: str, argv, platform=None, tee=None):
    env = dict(os.environ)
    parts = [REPO] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                      if p]
    # the TPU tunnel's PJRT plugin registers via sitecustomize on this path;
    # losing it silently downgrades the run to CPU-only backends.  For an
    # EXPLICIT cpu run the opposite holds: the plugin overrides
    # JAX_PLATFORMS=cpu, so it must be dropped (round-5 rehearsal trap).
    axon = "/root/.axon_site"
    if platform == "cpu":
        parts = [p for p in parts if p != axon]
    elif os.path.isdir(axon) and axon not in parts:
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
                    choices=["all", "synth", "probe", "ingest", "train",
                             "train-baseline", "infer", "memory"])
    ap.add_argument("--layer_name", default="GCNConv",
                    choices=["GCNConv", "SAGEConv", "GINConv", "GATConv"])
    ap.add_argument("--cluster_attention", type=int, default=0,
                    help="GATConv Gc phase: cluster-collapse dial "
                         "(nodes per cluster; 0 = exact)")
    ap.add_argument("--cluster_attention_exact", type=int, default=0)
    ap.add_argument("--normalize_features", action="store_true",
                    help="row-L1 feature normalization on every "
                         "subcommand (required for the GAT sessions: "
                         "unnormalized sigma=6 features blow up the "
                         "attention scores at width 512)")
    ap.add_argument("--epochs1", type=int, default=40)
    ap.add_argument("--epochs2", type=int, default=20)
    ap.add_argument("--lr2", type=float, default=0.002,
                    help="Gs-phase (MB) learning rate: ~100 chunked "
                         "optimizer steps per epoch at products scale "
                         "destabilize at the full-batch default 0.01 "
                         "(round-5 hard-mode diagnosis)")
    ap.add_argument("--batch_size", type=int, default=512)
    ap.add_argument("--eval_chunk", type=int, default=8192)
    ap.add_argument("--chunk_budget", type=int, default=0,
                    help="0 = let --auto_config pick (1<<26 at this "
                         "scale — the round-4 tunnel-worker limit, now "
                         "encoded in graph/planner.py)")
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
              else ["synth", "probe", "ingest", "train", "train-baseline",
                    "infer", "memory"])
    if args.normalize_features or args.layer_name == "GATConv":
        if "--normalize_features" not in COMMON_ARGS:
            COMMON_ARGS.append("--normalize_features")
    MODEL_ARGS = model_args(args.layer_name)
    TRAIN_ARGS = [*COMMON_ARGS, *MODEL_ARGS, "--runs", "1"]
    cluster_args = (["--cluster_attention", str(args.cluster_attention)]
                    + (["--cluster_attention_exact",
                        str(args.cluster_attention_exact)]
                       if args.cluster_attention_exact else [])
                    if args.cluster_attention else [])

    if "synth" in stages:
        npz = os.path.join(ws, "dataset", "productsproxy",
                           "productsproxy.npz")
        if os.path.exists(npz):
            print("synth: npz exists, skipping", flush=True)
        else:
            tic("synth", lambda: synth(ws))

    if "probe" in stages:
        if os.path.exists(os.path.join(ws, "probe.json")):
            print("probe: probe.json exists, skipping", flush=True)
        else:
            tic("probe", lambda: probe(ws))

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
                     "--lr2", str(args.lr2),
                     "--batch_size", str(args.batch_size),
                     "--eval_chunk", str(args.eval_chunk),
                     *(["--chunk_budget", str(args.chunk_budget)]
                       if args.chunk_budget else []),
                     "--checkpoint_every", "5",
                     *cluster_args,
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
