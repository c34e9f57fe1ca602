"""CLI driver — the counterpart of the reference's five entry points
(``main.py``, ``inference.py``, ``inference_baseline.py``, ``memory.py``,
``save_graphs.py`` + ``dataset.py``) as subcommands of one typed interface:

    python -m fitgnn_tpu.cli.main train       --dataset cora --task node_cls ...
    python -m fitgnn_tpu.cli.main infer       --dataset cora ...
    python -m fitgnn_tpu.cli.main infer-baseline --dataset cora ...
    python -m fitgnn_tpu.cli.main memory      --dataset cora ...
    python -m fitgnn_tpu.cli.main stats       --dataset cora
    python -m fitgnn_tpu.cli.main save-graphs --dataset cora ...

Flag names and defaults follow the reference (``main.py:175-209``), including
the semantic normalization of ``arg_correction`` (``main.py:117-129``):
cluster/extra mutual exclusion, fixed→random remap for datasets without fixed
splits, fitgnn/baseline resolution.  Note the reference's CLI
``--coarsening_ratio`` is inverted before use (``coarsen(r=1-ratio)``,
``main.py:278``); this CLI keeps the user-facing semantics identical.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Optional

import numpy as np

FIXED_SPLIT_DATASETS = ("cora", "citeseer", "pubmed", "wikics")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="fitgnn-tpu")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--dataset", type=str, default="cora")
        sp.add_argument("--data_root", type=str, default="./dataset")
        sp.add_argument("--task", type=str, default="node_cls",
                        choices=["node_cls", "node_reg", "graph_cls",
                                 "graph_reg"])
        sp.add_argument("--coarsening_ratio", type=float, default=0.5)
        sp.add_argument("--coarsening_method", type=str,
                        default="variation_neighborhoods")
        sp.add_argument("--extra_node", action="store_true")
        sp.add_argument("--cluster_node", action="store_true")
        sp.add_argument("--use_community_detection", action="store_true")
        sp.add_argument("--experiment", type=str, default="fixed")
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--output_dir", type=str, default="out")
        sp.add_argument("--bucket_sizes", action="store_true",
                        help="size-bucket the subgraph batches (pad within "
                        "power-of-two node-count buckets): padding waste "
                        "bounded to 2x instead of max-size x count — "
                        "required at products scale, where the single-pad "
                        "batch is tens of GB of zeros")
        sp.add_argument("--max_buckets", type=int, default=0,
                        help="cap the bucket count (= compiled train/eval "
                        "programs) by merging adjacent size groups with "
                        "least added padding; 0 = one bucket per "
                        "power-of-two size")
        sp.add_argument("--normalize_features", action="store_true",
                        help="row-wise L1 feature normalization (the "
                        "reference's transform); on the COMMON group so "
                        "train and the timed infer/memory paths see the "
                        "same features (a checkpoint trained normalized "
                        "must never be timed on raw features)")
        sp.add_argument("--auto_config", action="store_true",
                        help="derive the hand-tuned knobs (hybrid tile "
                        "threshold, bucket cap, chunk budget) from the "
                        "graph's structure via the ingest-time cost model "
                        "(graph/planner.py); on every subcommand so the "
                        "partition cache key stays consistent")
        return sp

    t = common(sub.add_parser("train"))
    t.add_argument("--exp_setup", type=str, default="Gc_train_2_Gs_infer")
    t.add_argument("--runs", type=int, default=20)
    t.add_argument("--hidden", type=int, default=512)
    t.add_argument("--layer_name", type=str, default="GCNConv")
    t.add_argument("--epochs1", type=int, default=100)
    t.add_argument("--epochs2", type=int, default=300)
    t.add_argument("--num_layers1", type=int, default=2)
    t.add_argument("--num_layers2", type=int, default=2)
    t.add_argument("--batch_size", type=int, default=128)
    t.add_argument("--train_ratio", type=float, default=0.3)
    t.add_argument("--val_ratio", type=float, default=0.2)
    t.add_argument("--lr", type=float, default=0.01)
    t.add_argument("--lr2", type=float, default=None,
                   help="Gs-phase learning rate (default: --lr). MB mode "
                        "takes ~subgraphs/batch_size optimizer steps per "
                        "epoch; at products scale set ~lr/5 to keep the "
                        "chunked phase stable")
    t.add_argument("--weight_decay", type=float, default=5e-4)
    t.add_argument("--gradient_method", type=str, default="GD",
                   choices=["GD", "MB"])
    t.add_argument("--loss_reduction", type=str, default="mean",
                   choices=["mean", "sum"])
    t.add_argument("--multi_prop", action="store_true")
    t.add_argument("--property", type=int, default=0)
    t.add_argument("--train_fitgnn", action="store_true")
    t.add_argument("--baseline", action="store_true")
    t.add_argument("--run_intermediate_inference", action="store_true")
    t.add_argument("--intermediate_inference_freq", type=int, default=10)
    t.add_argument("--early_stopping", type=int, default=0,
                   help="patience in epochs on the val loss; 0 = off "
                        "(the reference parses this flag but never uses "
                        "it — here it actually stops)")
    t.add_argument("--hybrid_spmm", choices=("auto", "on", "off"),
                   default="auto",
                   help="attach the Leiden-reordered BCSR/COO hybrid "
                        "aggregation operator to full-graph training "
                        "(--baseline, and the Gc phase of --train_fitgnn); "
                        "auto = on for GCN/SAGE/GIN at >=65k nodes")
    t.add_argument("--hybrid_threshold", type=int, default=48,
                   help="min edges per 128x128 tile to densify it "
                        "(the tuned break-even from PERFORMANCE.md)")
    t.add_argument("--hybrid_bf16_tiles", action="store_true",
                   help="store the dense adjacency tiles in bfloat16 "
                        "(halves tile HBM traffic; f32 accumulation)")
    t.add_argument("--cluster_attention_exact", type=int, default=0,
                   help="with --cluster_attention: the top-k straggler "
                   "senders (by straggler out-degree) keep the exact "
                   "per-edge attention path; only the tail collapses onto "
                   "cluster summaries (the reference's extra_node + "
                   "cluster_node mechanisms composed per edge)")
    t.add_argument("--cluster_attention", type=int, default=0,
                   help="GATConv full-graph training: collapse straggler "
                        "edges onto their sender's cluster-summary row "
                        "(APPROXIMATE — the reference's cluster_node idea "
                        "applied to attention; dense MXU block instead of "
                        "per-edge softmax). Value = nodes per cluster, "
                        "multiple of 128; 0 = exact per-edge (default)")
    t.add_argument("--cluster_aggregation", type=int, default=0,
                   help="GCN/SAGE/GIN full-graph training: the static-"
                        "weight analog of --cluster_attention — straggler "
                        "edges aggregate their sender's cluster-mean row "
                        "via one (N, C) MXU matmul (APPROXIMATE — the "
                        "reference's cluster_node idea applied per edge). "
                        "Value = nodes per cluster, multiple of 128; "
                        "0 = exact per-edge (default)")
    t.add_argument("--cluster_aggregation_exact", type=int, default=0,
                   help="with --cluster_aggregation: the top-k straggler "
                   "senders (by straggler weight mass) keep the exact "
                   "per-edge path; only the tail collapses")
    t.add_argument("--preaggregate", action="store_true",
                   help="GCN/SAGE/GIN --baseline: fold layer-0 aggregation "
                        "into ingest (exact — input features are constant; "
                        "removes one SpMM from every step)")
    t.add_argument("--eval_chunk", type=int, default=0,
                   help="Gs eval scans subgraph-axis chunks of this size "
                   "(bounds activation memory at products scale); 0 = "
                   "whole-bucket vmap")
    t.add_argument("--chunk_budget", type=int, default=1 << 28,
                   help="static per-chunk activation budget in ELEMENTS "
                        "for MB batches and eval chunks (the vmapped convs "
                        "materialize (chunk, E_pad, hidden) messages); "
                        "lower it when many large programs must coexist "
                        "on one chip (products-scale curriculum)")
    t.add_argument("--checkpoint_every", type=int, default=0,
                   help="save a full resume checkpoint (params + opt state "
                        "+ rng + phase/epoch cursor) every N epochs; with "
                        "--resume a killed products-scale run continues "
                        "instead of restarting")
    t.add_argument("--resume", action="store_true",
                   help="load the resume checkpoint for this output_dir "
                        "if one exists and continue from its cursor")
    t.add_argument("--fused_epochs", action="store_true",
                   help="run the Gc phase as one jitted lax.scan over "
                        "epochs (one dispatch per phase; ignored when "
                        "--early_stopping is set)")
    t.add_argument("--num_devices", type=int, default=1,
                   help="shard node-task training over a device mesh "
                        "(1 = single-chip)")
    t.add_argument("--num_hosts", type=int, default=1,
                   help="with --num_devices N: arrange the mesh as "
                        "(num_hosts x N/num_hosts) and use the hierarchical "
                        "exchange (exact halo over the chip axis, cluster "
                        "summaries across hosts) — applies to --baseline "
                        "AND the Gc phase of --train_fitgnn")

    i = common(sub.add_parser("infer"))
    i.add_argument("--hidden", type=int, default=512)
    i.add_argument("--layer_name", type=str, default="GCNConv")
    i.add_argument("--num_layers1", type=int, default=2)
    i.add_argument("--num_layers2", type=int, default=None,
                   help="inference model depth (reference inference.py:668 "
                        "builds the timed model with num_layers2); defaults "
                        "to num_layers1")
    i.add_argument("--num_test_samples", type=int, default=100)
    i.add_argument("--checkpoint", type=str, default=None,
                   help="params checkpoint; defaults to the path `train` "
                        "saves for the same (task, output_dir)")

    ib = common(sub.add_parser("infer-baseline"))
    ib.add_argument("--hidden", type=int, default=512)
    ib.add_argument("--layer_name", type=str, default="GCNConv")
    ib.add_argument("--num_layers1", type=int, default=2)
    ib.add_argument("--num_layers2", type=int, default=None,
                   help="inference model depth; defaults to num_layers1")
    ib.add_argument("--num_test_samples", type=int, default=100)
    ib.add_argument("--checkpoint", type=str, default=None,
                   help="params checkpoint; defaults to the path the "
                        "baseline `train` saves")

    common(sub.add_parser("memory"))
    common(sub.add_parser("stats"))
    common(sub.add_parser("save-graphs"))
    return p


def arg_correction(args) -> argparse.Namespace:
    """Reference ``arg_correction`` semantics (``main.py:117-129``)."""
    if getattr(args, "cluster_node", False) and getattr(args, "extra_node",
                                                        False):
        print("warning: cluster_node and extra_node are mutually exclusive; "
              "using extra_node", file=sys.stderr)
        args.cluster_node = False
    if getattr(args, "experiment", None) == "fixed" and \
            args.dataset.lower() not in FIXED_SPLIT_DATASETS:
        print(f"warning: {args.dataset} has no fixed split; using random",
              file=sys.stderr)
        args.experiment = "random"
    if getattr(args, "train_fitgnn", False) and getattr(args, "baseline",
                                                        False):
        print("warning: train_fitgnn overrides baseline", file=sys.stderr)
        args.baseline = False
    return args


def _node_mode(args) -> str:
    if getattr(args, "extra_node", False):
        return "extra_node"
    if getattr(args, "cluster_node", False):
        return "cluster_node"
    return "plain"


COMMUNITY_NODE_CAP = 165_000   # reference main.py:264


AUTO_COMMUNITY_NODES = 170_000   # reference inference.py:264


def _load_node(args):
    from fitgnn_tpu.data.datasets import load_node_dataset
    ds = load_node_dataset(args.dataset, args.data_root)
    use_comm = getattr(args, "use_community_detection", False)
    if not use_comm and ds.num_nodes > AUTO_COMMUNITY_NODES:
        print(f"auto-enabling community detection "
              f"({ds.num_nodes} > {AUTO_COMMUNITY_NODES} nodes)",
              file=sys.stderr)
        use_comm = True
    if use_comm:
        ds = apply_community_proxy(ds, COMMUNITY_NODE_CAP, seed=args.seed)
    if getattr(args, "normalize_features", False):
        # one home for the transform: every subcommand that loads the
        # dataset (train, infer, memory, save-graphs, stats) must see the
        # SAME features, and ds.x feeds the partition cache key
        norms = np.abs(ds.x).sum(axis=1, keepdims=True)
        ds.x = (ds.x / np.maximum(norms, 1e-12)).astype(np.float32)
    return ds


def apply_community_proxy(ds, cap: int, seed: int = 0):
    """Leiden → keep the largest communities up to ``cap`` nodes → induced
    subgraph (the reference's ogbn-products proxy, ``main.py:247-267``)."""
    import dataclasses as _dc
    from fitgnn_tpu.partition.community import (leiden_communities,
                                                merge_communities)
    labels = leiden_communities(ds.senders, ds.receivers, ds.num_nodes,
                                seed=seed)
    keep = merge_communities(labels, cap)
    lookup = np.full(ds.num_nodes, -1, dtype=np.int64)
    lookup[keep] = np.arange(len(keep))
    sel = (lookup[ds.senders] >= 0) & (lookup[ds.receivers] >= 0)

    def sub(a):
        return None if a is None else np.asarray(a)[keep]

    return _dc.replace(
        ds, x=ds.x[keep], y=np.asarray(ds.y)[keep],
        senders=lookup[ds.senders[sel]], receivers=lookup[ds.receivers[sel]],
        train_mask=sub(ds.train_mask), val_mask=sub(ds.val_mask),
        test_mask=sub(ds.test_mask))


def _splits(args, ds, num_classes):
    from fitgnn_tpu.data.splits import (splits_classification,
                                        splits_regression)
    if args.task == "node_reg":
        return splits_regression(ds.num_nodes,
                                 getattr(args, "train_ratio", 0.3),
                                 getattr(args, "val_ratio", 0.2),
                                 seed=args.seed)
    if getattr(args, "experiment", "fixed") == "fixed":
        if ds.train_mask is None:
            raise SystemExit(f"{args.dataset} provides no fixed split")
        return ds.train_mask, ds.val_mask, ds.test_mask
    return splits_classification(ds.y, num_classes, args.experiment,
                                 seed=args.seed)


def _partition(args, ds, train, val, test, num_classes):
    """Load-or-compute the partitioned dataset through the content-hashed
    artifact cache (reference caches at every entry point, main.py:270-279)."""
    from fitgnn_tpu.partition import coarsen_and_partition
    from fitgnn_tpu.utils.cache import ArtifactCache, content_key

    task = "classification" if args.task.endswith("cls") else "regression"

    def compute():
        return coarsen_and_partition(
            ds.x, ds.senders, ds.receivers, ds.y,
            reduction=1.0 - args.coarsening_ratio,  # reference ratio semantics
            method=args.coarsening_method, mode=_node_mode(args), task=task,
            num_classes=num_classes, train_mask=train, val_mask=val,
            test_mask=test, seed=args.seed,
            bucket=getattr(args, "bucket_sizes", False),
            max_buckets=getattr(args, "max_buckets", 0))

    cache = ArtifactCache(os.path.join(args.data_root, args.dataset, "saved"))
    # the full split masks are baked into the cached SubgraphBatch, so they
    # must be part of the key — hashing only the train COUNT serves stale
    # val/test masks when split ratios change at equal train size
    def _mask_arr(m):
        return (np.asarray(m, dtype=np.uint8) if m is not None
                else np.asarray([-1], dtype=np.int64))

    key = content_key(
        {"x": ds.x[:1000], "senders": ds.senders, "receivers": ds.receivers,
         "y": np.asarray(ds.y)[:1000], "train_mask": _mask_arr(train),
         "val_mask": _mask_arr(val), "test_mask": _mask_arr(test)},
        {"ratio": args.coarsening_ratio, "method": args.coarsening_method,
         "mode": _node_mode(args), "task": args.task, "seed": args.seed,
         "bucket": getattr(args, "bucket_sizes", False),
         "max_buckets": getattr(args, "max_buckets", 0)})
    part, hit = cache.load_or_compute(key, compute)
    if hit:
        print(f"partition artifacts loaded from cache ({key})",
              file=sys.stderr)
    return part


def checkpoint_path(task: str, output_dir: str, baseline: bool = False) -> str:
    """The train→infer handshake convention (reference saves
    ``save/.../model.pt`` and ``inference.py:668`` loads it)."""
    parts = ["save", task] + (["baseline"] if baseline else []) + [output_dir]
    return os.path.join(*parts, "model")


def _apply_auto_config(args, num_nodes: int) -> None:
    """--auto_config: route the hand-tuned knobs through the ingest-time
    planner (graph/planner.py).  The tile threshold is resolved later,
    inside optimize_coarse/build_optimized_graph, from the REORDERED tile
    histogram; the operational knobs resolve here from the graph size."""
    if not getattr(args, "auto_config", False):
        return
    if hasattr(args, "hybrid_threshold"):        # train subcommands only
        args.hybrid_threshold = "auto"
    # num_nodes arrives AFTER the community proxy (165k at products scale);
    # what the executable-count/chunk limits actually track is the SUBGRAPH
    # count ≈ metanodes ≈ nodes · (1 - ratio) (round-4 flagship: 82k
    # subgraphs is what the tunnel worker could not hold at 5 buckets)
    est_subgraphs = int(num_nodes
                        * (1.0 - getattr(args, "coarsening_ratio", 0.5)))
    big = num_nodes >= 1_000_000 or est_subgraphs >= 50_000
    if (big and getattr(args, "bucket_sizes", False)
            and not getattr(args, "max_buckets", 0)):
        # every extra size bucket adds co-resident executables; the remote
        # worker holds ~2 reliably at products scale (round-4 flagship)
        args.max_buckets = 2
    if big and getattr(args, "chunk_budget", 1 << 28) == (1 << 28):
        args.chunk_budget = 1 << 26
    print(f"auto-config: tile threshold deferred to planner, "
          f"max_buckets={getattr(args, 'max_buckets', 0) or 'default'}, "
          f"chunk_budget={getattr(args, 'chunk_budget', 1 << 28)}")


def cmd_train(args) -> int:
    from fitgnn_tpu.train import NodeTaskConfig, run_node_task
    from fitgnn_tpu.utils import results as R

    # the cluster collapses apply to full-graph (Gc phase / baseline)
    # node-level training only — reject rather than silently ignore
    cl_att = getattr(args, "cluster_attention", 0)
    cl_agg = getattr(args, "cluster_aggregation", 0)
    if getattr(args, "cluster_attention_exact", 0) and not cl_att:
        raise SystemExit("--cluster_attention_exact requires "
                         "--cluster_attention")
    if getattr(args, "cluster_aggregation_exact", 0) and not cl_agg:
        raise SystemExit("--cluster_aggregation_exact requires "
                         "--cluster_aggregation")
    if (cl_att or cl_agg) and args.task in ("graph_cls", "graph_reg"):
        raise SystemExit("--cluster_attention/--cluster_aggregation apply "
                         "to node-level full-graph training, not "
                         "graph-level tasks")
    # args-only cluster-flag rejections run BEFORE the (expensive)
    # partition step; only the part.coarse check needs the partition
    if cl_att and args.layer_name != "GATConv":
        raise SystemExit("--cluster_attention is an attention "
                         "factorization (GATConv only)")
    if cl_agg and args.layer_name == "GATConv":
        raise SystemExit("--cluster_aggregation is for static-weight "
                         "layers; use --cluster_attention for GATConv")
    if (cl_att or cl_agg) and args.exp_setup == "Gs_train_2_Gs_infer":
        raise SystemExit("--cluster_attention/--cluster_aggregation apply "
                         "to the Gc full-graph phase; this experiment "
                         "setup has none (use --baseline for full-graph "
                         "training)")
    if args.task in ("graph_cls", "graph_reg"):
        return _cmd_train_graph(args)
    if args.baseline:
        return _cmd_train_baseline(args)

    ds = _load_node(args)
    _apply_auto_config(args, ds.num_nodes)
    num_classes = ds.num_classes if args.task == "node_cls" else None
    train, val, test = _splits(args, ds, num_classes)
    part = _partition(args, ds, train, val, test, num_classes)
    if (cl_att or cl_agg) and part.coarse is None:
        raise SystemExit("--cluster_attention/--cluster_aggregation apply "
                         "to the Gc full-graph phase; this experiment "
                         "setup has none (use --baseline for full-graph "
                         "training)")
    if (part.coarse is not None and args.exp_setup != "Gs_train_2_Gs_infer"
            and args.num_devices == 1):
        # single-device Gc: Leiden-reorder + hybrid/collapsed operator.
        # With num_devices > 1 the hier Gc phase builds its OWN per-shard
        # interior operators (cluster flags ride cfg.gc_cluster below).
        from fitgnn_tpu.graph.optimize import optimize_coarse, should_use_hybrid
        gc_cluster_att, gc_cluster_agg = cl_att, cl_agg
        if (gc_cluster_att or gc_cluster_agg
                or should_use_hybrid(int(part.coarse.graph.n_node),
                                     args.layer_name,
                                     args.hybrid_spmm)):
            # products-scale Gc graphs are full-graph training problems —
            # same Leiden-reorder + hybrid fast path as --baseline
            import jax.numpy as _j
            part.coarse = optimize_coarse(
                part.coarse, seed=args.seed, layer_name=args.layer_name,
                min_block_edges=args.hybrid_threshold,
                tile_dtype=_j.bfloat16 if args.hybrid_bf16_tiles else None,
                cluster_att=gc_cluster_att,
                cluster_att_exact=getattr(args, "cluster_attention_exact",
                                          0),
                cluster_agg=gc_cluster_agg,
                cluster_agg_exact=getattr(args,
                                          "cluster_aggregation_exact", 0))
            hyb = part.coarse.graph.aux
            nca = (0 if hyb.cluster_count is None
                   else int(np.asarray(hyb.cluster_count > 0).sum()))
            ckind = "attention" if gc_cluster_att else "aggregation"
            print(f"Gc hybrid operator: "
                  f"{0 if hyb.bsr is None else hyb.bsr.nnz_blocks} dense "
                  f"tiles, {hyb.num_coo_edges} straggler edges"
                  + (f", {nca} cluster-{ckind} entries "
                     f"(K={hyb.cluster_size}, approximate)" if nca else ""))

    task = "classification" if args.task == "node_cls" else "regression"
    save_path = checkpoint_path(args.task, args.output_dir)
    save_dir = os.path.dirname(save_path)
    # all experiment setups are valid for regression too (reference
    # run.py:508 runs the same setups for node_regression)
    cfg = NodeTaskConfig(
        layer_name=args.layer_name, hidden=args.hidden,
        num_layers=args.num_layers1, task=task,
        out_dim=num_classes if task == "classification" else 1,
        exp_setup=args.exp_setup,
        epochs1=args.epochs1, epochs2=args.epochs2, lr=args.lr,
        lr2=args.lr2,
        weight_decay=args.weight_decay, gradient_method=args.gradient_method,
        batch_size=args.batch_size, loss_reduction=args.loss_reduction,
        runs=args.runs, seed=args.seed, logdir=save_dir,
        save_path=save_path,
        run_intermediate_inference=args.run_intermediate_inference,
        intermediate_inference_freq=args.intermediate_inference_freq,
        intermediate_csv_path=(
            f"results/{args.dataset}_intermediate_inference.csv"
            if args.run_intermediate_inference else None),
        num_devices=args.num_devices,
        num_hosts=args.num_hosts,
        gc_cluster=(cl_att or cl_agg) if args.num_devices > 1 else 0,
        gc_cluster_exact=(getattr(args, "cluster_attention_exact", 0)
                          or getattr(args, "cluster_aggregation_exact", 0)
                          ) if args.num_devices > 1 else 0,
        early_stopping=args.early_stopping,
        fused_epochs=args.fused_epochs,
        bucket_sizes=args.bucket_sizes,
        eval_chunk=args.eval_chunk,
        chunk_elem_budget=args.chunk_budget,
        resume_path=(os.path.join("save", args.task, args.output_dir,
                                  "resume")
                     if (args.resume or args.checkpoint_every) else None),
        checkpoint_every=args.checkpoint_every)
    if cfg.resume_path and not args.resume:
        # --checkpoint_every without --resume = fresh run: a stale cursor
        # from an earlier session must not silently skip its epochs
        import shutil
        shutil.rmtree(cfg.resume_path, ignore_errors=True)
    res = run_node_task(cfg, part.coarse, part.subgraphs, verbose=True)
    print(f"checkpoint saved: {save_path}")
    s = res.summary

    header = (R.TRAIN_NODE_CLS_HEADER if task == "classification"
              else R.TRAIN_NODE_REG_HEADER)
    row = R.format_row(header, {
        "dataset": args.dataset, "coarsening_method": args.coarsening_method,
        "coarsening_ratio": args.coarsening_ratio,
        "experiment": getattr(args, "experiment", ""),
        "exp_setup": args.exp_setup, "layer_name": args.layer_name,
        "extra_nodes": args.extra_node, "cluster_node": args.cluster_node,
        "community_used": args.use_community_detection,
        "hidden": args.hidden, "runs": args.runs,
        "num_layers": args.num_layers1, "batch_size": args.batch_size,
        "lr": args.lr,
        "ave_acc": f"{s['ave_acc']} +/- {s['std_acc']}",
        "ave_time": s["ave_time"],
        "top_10_acc": f"{s['top_10_acc']} +/- {s['top_10_acc_std']}",
        "best_acc": s["best_acc"],
        # node_reg loss columns hold the STD-NORMALIZED L1 — the value the
        # reference records as its regression loss (run.py:110,168)
        "top_10_loss": (
            f"{s['top_10_loss']} +/- {s['top_10_loss_std']}"
            if task == "classification"
            else f"{s['top_10_metric']} +/- {s['top_10_metric_std']}"),
        "best_loss": (s["best_loss"] if task == "classification"
                      else s["best_metric"])})
    R.append_csv_row(f"results/{args.dataset}.csv", header, row)
    print(f"results/{args.dataset}.csv <- {row}")
    return 0


def _cmd_train_baseline(args) -> int:
    """Full-graph baseline training (reference ``node_classification_baseline``
    ``run.py:832-904``): per-run model, full-batch epochs with best-val
    checkpointing, timed test forward.  Unlike the reference — which creates
    the model/optimizer once outside the runs loop so later runs continue
    from earlier state (SURVEY §7.4 quirk) — every run here starts fresh."""
    import time
    import jax
    from fitgnn_tpu.graph import build_graph
    from fitgnn_tpu.models import NodeModel
    from fitgnn_tpu.train import steps
    from fitgnn_tpu.utils import results as R
    import numpy as _np

    ds = _load_node(args)
    _apply_auto_config(args, ds.num_nodes)
    classify = args.task == "node_cls"
    num_classes = ds.num_classes if classify else None
    train, val, test = _splits(args, ds, num_classes)
    if args.num_devices > 1:
        return _cmd_train_baseline_dist(args, ds, train, val, test,
                                        num_classes)
    from fitgnn_tpu.graph.optimize import (build_optimized_graph,
                                           should_use_hybrid)
    cluster_att = getattr(args, "cluster_attention", 0)
    cluster_agg = getattr(args, "cluster_aggregation", 0)
    if cluster_att and args.layer_name != "GATConv":
        raise SystemExit("--cluster_attention is an attention "
                         "factorization (GATConv only)")
    if cluster_agg and args.layer_name == "GATConv":
        raise SystemExit("--cluster_aggregation is for static-weight "
                         "layers; use --cluster_attention for GATConv")
    if (cluster_att or cluster_agg
            or should_use_hybrid(ds.num_nodes, args.layer_name,
                                 args.hybrid_spmm)):
        # full-graph fast path: Leiden reorder + BCSR/COO hybrid operator
        # (exact — node permutation; see graph/optimize.py).  With
        # --cluster_attention the straggler remainder is APPROXIMATE
        # (summary attention) and the path is forced on.
        import jax.numpy as _j
        g, _ = build_optimized_graph(
            ds.x, ds.senders, ds.receivers, y=ds.y, train_mask=train,
            val_mask=val, test_mask=test, layer_name=args.layer_name,
            min_block_edges=args.hybrid_threshold,
            tile_dtype=_j.bfloat16 if args.hybrid_bf16_tiles else None,
            cluster_att=cluster_att,
            cluster_att_exact=getattr(args, "cluster_attention_exact", 0),
            cluster_agg=cluster_agg,
            cluster_agg_exact=getattr(args, "cluster_aggregation_exact", 0),
            seed=args.seed)
        nca = (0 if g.aux.cluster_count is None
               else int(np.asarray(g.aux.cluster_count > 0).sum()))
        ckind = "attention" if cluster_att else "aggregation"
        print(f"hybrid operator: {0 if g.aux.bsr is None else g.aux.bsr.nnz_blocks}"
              f" dense tiles, {g.aux.num_coo_edges} straggler edges"
              + (f", {nca} cluster-{ckind} entries "
                 f"(K={g.aux.cluster_size}, approximate)" if nca else ""))
    else:
        g = build_graph(ds.x, ds.senders, ds.receivers, y=ds.y,
                        train_mask=train, val_mask=val, test_mask=test)
    task = "classification" if classify else "regression"
    preagg = args.preaggregate and args.layer_name in (
        "GCNConv", "SAGEConv", "GINConv")
    if preagg:
        # exact: input features are constant — layer 0's SpMM moves to
        # ingest (tests/test_preagg.py gates parity); the trained params
        # are interchangeable with the non-preagg model
        from fitgnn_tpu.models.models import preaggregate_input
        g = g._replace(x=preaggregate_input(g, args.layer_name))
    model = NodeModel(layer_name=args.layer_name, hidden=args.hidden,
                      num_layers=args.num_layers1,
                      out_dim=num_classes if classify else 1,
                      classify=classify,
                      first_layer_preaggregated=preagg)

    all_acc, all_loss, all_time = [], [], []
    for run in range(args.runs):
        rng = jax.random.PRNGKey(args.seed + run)
        rng, init_rng = jax.random.split(rng)
        state = steps.create_state(model, init_rng, g.x, g, lr=args.lr,
                                   weight_decay=args.weight_decay)
        best_val, best_params = _np.inf, state.params
        for epoch in range(args.epochs1):
            rng, step_rng = jax.random.split(rng)
            state, _ = steps.gc_train_step(
                state, g, g.y, g.train_mask, step_rng, task,
                reduction=args.loss_reduction)
            val_loss, _ = steps.gc_eval_step(state, g, g.y, g.val_mask, task)
            if float(val_loss) < best_val or epoch == 0:
                best_val = float(val_loss)
                best_params = state.params
        state = state.replace(params=best_params)
        steps.gc_eval_step(state, g, g.y, g.test_mask, task)  # warm-up
        t0 = time.perf_counter()
        test_loss, test_acc = steps.gc_eval_step(state, g, g.y, g.test_mask,
                                                 task)
        test_loss, test_acc = float(test_loss), float(test_acc)
        all_time.append(time.perf_counter() - t0)
        all_acc.append(test_acc)
        all_loss.append(test_loss)
        print(f"baseline run {run}: test_loss={test_loss:.4f} "
              f"metric={test_acc:.4f}")

    # train→infer handshake (reference run.py:863 saves best-val model.pt)
    from fitgnn_tpu.train.checkpoint import save_params
    ckpt = checkpoint_path(args.task, args.output_dir, baseline=True)
    save_params(ckpt, best_params)
    print(f"checkpoint saved: {ckpt}")

    acc, loss = _np.asarray(all_acc), _np.asarray(all_loss)
    top_acc = _np.sort(acc)[::-1][:10]
    # regression: `acc` holds the std-normalized L1 metric — the value the
    # reference records as its regression loss (run.py:110,168); the plain
    # masked L1 stays the selection loss but is not the recorded column
    top_loss = _np.sort(loss if classify else acc)[:10]
    header = R.TRAIN_NODE_CLS_HEADER if classify else R.TRAIN_NODE_REG_HEADER
    row = R.format_row(header, {
        "dataset": args.dataset, "coarsening_method": "none",
        "coarsening_ratio": "", "experiment": getattr(args, "experiment", ""),
        "exp_setup": "baseline", "layer_name": args.layer_name,
        "extra_nodes": False, "cluster_node": False,
        "community_used": args.use_community_detection,
        "hidden": args.hidden, "runs": args.runs,
        "num_layers": args.num_layers1, "batch_size": args.batch_size,
        "lr": args.lr,
        "ave_acc": f"{acc.mean()} +/- {acc.std()}",
        "ave_time": float(_np.mean(all_time)),
        "top_10_acc": f"{top_acc.mean()} +/- {top_acc.std()}",
        "best_acc": float(top_acc[0]),
        "top_10_loss": f"{top_loss.mean()} +/- {top_loss.std()}",
        "best_loss": float(top_loss[0])})
    R.append_csv_row(f"results/baseline/{args.dataset}.csv", header, row)
    print(f"results/baseline/{args.dataset}.csv <- {row}")
    return 0


def _cmd_train_baseline_dist(args, ds, train, val, test,
                             num_classes) -> int:
    """Full-graph baseline training sharded over a (num_hosts × chips) mesh
    through the hierarchical exchange: community-placed shards, exact halo
    rows over the chip/ICI axis, cluster-summary rows across hosts — the
    reference's cluster_node mechanism as a collective (SURVEY §2.4).
    Runs node_cls AND node_reg (the reference trains regression through the
    same models, ``run.py:508``, ``network.py:37``); ``num_classes`` is None
    for regression."""
    import jax
    from fitgnn_tpu.parallel import (
        CHIP_AXIS, HOST_AXIS, HierNodeModel, build_hier_plan,
        init_hier_params, make_hier_eval_step, make_hier_mesh,
        make_hier_train_step, shard_graph)
    from fitgnn_tpu.parallel.multihost import placement_by_community
    from fitgnn_tpu.partition.community import leiden_communities
    from fitgnn_tpu.train.steps import TrainState, adam_l2
    from fitgnn_tpu.utils import results as R
    import numpy as _np

    H = args.num_hosts
    P_ = args.num_devices
    if P_ % H != 0:
        raise SystemExit(f"--num_devices {P_} must divide by --num_hosts {H}")
    D = P_ // H
    if len(jax.devices()) < P_:
        raise SystemExit(
            f"num_devices={P_} but only {len(jax.devices())} JAX devices "
            f"(set XLA_FLAGS=--xla_force_host_platform_device_count=N)")

    labels = leiden_communities(ds.senders, ds.receivers, ds.num_nodes,
                                seed=args.seed)
    order, shard_of = placement_by_community(labels, P_)
    from fitgnn_tpu.parallel import LAYER_SEMANTICS
    if args.layer_name not in LAYER_SEMANTICS:
        raise SystemExit(f"unknown --layer_name {args.layer_name}")
    sg = shard_graph(ds.x, ds.senders, ds.receivers, np.asarray(ds.y), P_,
                     train_mask=train, val_mask=val, test_mask=test,
                     order=order,
                     semantics=LAYER_SEMANTICS[args.layer_name])
    # clusters = communities made shard-local: shard_graph slices uniform
    # n_loc blocks that need not align with the LPT placement, so a
    # community straddling a slice boundary is split at it (summaries just
    # get finer); padding nodes get an inert per-shard cluster
    n_loc = sg.nodes_per_shard
    n_pad_total = sg.num_nodes_global
    lab_ordered = np.concatenate(
        [labels[order], np.full(n_pad_total - len(order),
                                labels.max() + 1, dtype=np.int64)])
    shard_idx = np.arange(n_pad_total) // n_loc
    pair = shard_idx * (int(lab_ordered.max()) + 2) + lab_ordered
    _, cluster_of = np.unique(pair, return_inverse=True)
    from fitgnn_tpu.graph.optimize import _LAYER_SEMANTICS as _SEM
    plan = build_hier_plan(np.asarray(sg.senders), np.asarray(sg.receivers),
                           np.asarray(sg.edge_weight), H, D, n_loc,
                           cluster_of, interior_hybrid=True,
                           interior_semantics=_SEM[args.layer_name])
    mesh = make_hier_mesh(H, D)
    classify = args.task == "node_cls"
    model = HierNodeModel(hidden=args.hidden, num_layers=args.num_layers1,
                          out_dim=num_classes if classify else 1,
                          layer_name=args.layer_name, classify=classify)
    train_step = make_hier_train_step(mesh, model, plan)
    eval_step = make_hier_eval_step(mesh, model, plan)

    import time as _time
    all_acc, all_loss, all_time = [], [], []
    overall_best = (_np.inf, None)
    with mesh:
        for run in range(args.runs):
            rng = jax.random.PRNGKey(args.seed + run)
            rng, init_rng = jax.random.split(rng)
            params = init_hier_params(model, plan, sg.x, init_rng)
            state = TrainState.create(apply_fn=model.apply, params=params,
                                      tx=adam_l2(args.lr, args.weight_decay))
            best_val, best_params = _np.inf, state.params
            for epoch in range(args.epochs1):
                rng, step_rng = jax.random.split(rng)
                state, loss = train_step(state, sg.x, sg.y, sg.train_mask,
                                         plan, step_rng)
                val_loss, _ = eval_step(state, sg.x, sg.y, sg.val_mask, plan)
                if float(val_loss) < best_val or epoch == 0:
                    best_val = float(val_loss)
                    best_params = state.params
            state = state.replace(params=best_params)
            eval_step(state, sg.x, sg.y, sg.test_mask, plan)  # warm-up
            t0 = _time.perf_counter()
            test_loss, test_acc = eval_step(state, sg.x, sg.y, sg.test_mask,
                                            plan)
            test_loss, test_acc = float(test_loss), float(test_acc)
            all_time.append(_time.perf_counter() - t0)
            all_acc.append(test_acc)
            all_loss.append(test_loss)
            if best_val < overall_best[0] or overall_best[1] is None:
                overall_best = (best_val, best_params)
            print(f"distributed baseline run {run} ({H}x{D} mesh, "
                  f"{args.layer_name}): test_loss={test_loss:.4f} "
                  f"acc={test_acc:.4f}")

    from fitgnn_tpu.train.checkpoint import save_params
    ckpt = checkpoint_path(args.task, args.output_dir, baseline=True)
    save_params(ckpt, overall_best[1])
    print(f"checkpoint saved: {ckpt}")

    acc, loss = _np.asarray(all_acc), _np.asarray(all_loss)
    top_acc = _np.sort(acc)[::-1][:10]
    # regression: `acc` holds the std-normalized L1 metric (the value the
    # reference records as its regression loss, run.py:110,168)
    top_loss = _np.sort(loss if classify else acc)[:10]
    header = R.TRAIN_NODE_CLS_HEADER if classify else R.TRAIN_NODE_REG_HEADER
    row = R.format_row(header, {
        "dataset": args.dataset, "coarsening_method": "none",
        "coarsening_ratio": "", "experiment": getattr(args, "experiment", ""),
        "exp_setup": f"baseline_dist_{H}x{D}", "layer_name": args.layer_name,
        "extra_nodes": False, "cluster_node": H > 1,
        "community_used": True, "hidden": args.hidden, "runs": args.runs,
        "num_layers": args.num_layers1, "batch_size": args.batch_size,
        "lr": args.lr, "ave_acc": f"{acc.mean()} +/- {acc.std()}",
        "ave_time": float(_np.mean(all_time)),
        "top_10_acc": f"{top_acc.mean()} +/- {top_acc.std()}",
        "best_acc": float(top_acc[0]),
        "top_10_loss": f"{top_loss.mean()} +/- {top_loss.std()}",
        "best_loss": float(top_loss[0])})
    R.append_csv_row(f"results/baseline/{args.dataset}.csv", header, row)
    print(f"results/baseline/{args.dataset}.csv <- {row}")
    return 0


def _cmd_train_graph(args) -> int:
    from fitgnn_tpu.data.datasets import load_graph_dataset
    from fitgnn_tpu.data.graph_level import (prepare_graph_sample,
                                             collate_graph_level_batches)
    from fitgnn_tpu.data.splits import splits_graph_level
    from fitgnn_tpu.train.graph_loop import GraphTaskConfig, run_graph_task
    from fitgnn_tpu.utils import results as R

    gds = load_graph_dataset(args.dataset, args.data_root)
    classify = args.task == "graph_cls"
    samples = [prepare_graph_sample(
        x, s, r, y_, reduction=1.0 - args.coarsening_ratio,
        method=args.coarsening_method, mode=_node_mode(args), seed=args.seed)
        for (x, s, r), y_ in zip(gds.graphs, gds.y)]
    tr, va, te = splits_graph_level(len(samples), seed=args.seed)
    # chunked minibatches (one optimizer step per chunk; QM9/ZINC-scale
    # splits never collate into a single batch) — reference run.py:577-580
    bt = collate_graph_level_batches([samples[i] for i in tr],
                                     args.batch_size)
    bv = collate_graph_level_batches([samples[i] for i in va],
                                     args.batch_size)
    be = collate_graph_level_batches([samples[i] for i in te],
                                     args.batch_size)

    out_dim = int(gds.y.max()) + 1 if classify else 1
    save_path = checkpoint_path(args.task, args.output_dir)
    cfg = GraphTaskConfig(
        layer_name=args.layer_name, hidden=args.hidden,
        num_layers=args.num_layers1, out_dim=out_dim, classify=classify,
        exp_setup=args.exp_setup, epochs1=args.epochs1, epochs2=args.epochs2,
        lr=args.lr, weight_decay=args.weight_decay,
        prop=args.property if args.multi_prop else None, seed=args.seed,
        batch_size=args.batch_size, save_path=save_path)
    res = run_graph_task(cfg, bt, bv, be, verbose=True)
    print(f"checkpoint saved: {save_path}")
    row = R.format_row(R.TRAIN_GRAPH_HEADER, {
        "dataset": args.dataset, "coarsening_method": args.coarsening_method,
        "coarsening_ratio": args.coarsening_ratio,
        "exp_setup": args.exp_setup, "layer_name": args.layer_name,
        "extra_nodes": args.extra_node, "cluster_node": args.cluster_node,
        "community_used": args.use_community_detection,
        "hidden": args.hidden, "num_layers1": args.num_layers1,
        "num_layers2": args.num_layers2, "epochs1": args.epochs1,
        "epochs2": args.epochs2, "batch_size": args.batch_size,
        "lr": args.lr, "best_test_loss": res.best_test_loss,
        "best_test_acc": res.best_test_acc})
    R.append_csv_row(f"results/{args.dataset}.csv", R.TRAIN_GRAPH_HEADER, row)
    print(f"results/{args.dataset}.csv <- {row}")
    return 0


def _resolve_checkpoint(args, baseline: bool) -> Optional[str]:
    """Train→infer handshake: explicit ``--checkpoint`` wins; otherwise look
    for the path ``train`` saves for the same (task, output_dir) — the
    reference loads ``save/.../model.pt`` before timing (inference.py:668)."""
    if args.checkpoint:
        return args.checkpoint
    default = checkpoint_path(args.task, args.output_dir, baseline=baseline)
    if os.path.isdir(default) or os.path.exists(default):
        print(f"using checkpoint from train: {default}", file=sys.stderr)
        return default
    print("WARNING: no checkpoint found at "
          f"{default} and no --checkpoint given — timing RANDOM params "
          "(losses/accuracies below are meaningless)", file=sys.stderr)
    return None


def cmd_infer(args, baseline: bool = False) -> int:
    import jax
    from fitgnn_tpu.models import NodeModel
    from fitgnn_tpu.graph import build_graph
    from fitgnn_tpu.bench.inference import (node_inference_benchmark,
                                            baseline_inference_benchmark)
    from fitgnn_tpu.utils import results as R

    if args.task in ("graph_cls", "graph_reg"):
        return _cmd_infer_graph(args)

    ds = _load_node(args)
    _apply_auto_config(args, ds.num_nodes)
    classify = args.task == "node_cls"
    num_classes = ds.num_classes if classify else None
    train, val, test = _splits(args, ds, num_classes)

    depth = args.num_layers2 if args.num_layers2 is not None \
        else args.num_layers1
    model = NodeModel(layer_name=args.layer_name, hidden=args.hidden,
                      num_layers=depth,
                      out_dim=num_classes if classify else 1,
                      classify=classify)
    ckpt = _resolve_checkpoint(args, baseline)

    if baseline:
        from fitgnn_tpu.graph.optimize import (build_optimized_graph,
                                               should_use_hybrid)
        test_m, y_m = test, ds.y
        if should_use_hybrid(ds.num_nodes, args.layer_name, "auto"):
            # the timed full-graph forward gets the same fast path as
            # full-graph training (permutation-exact)
            g, order = build_optimized_graph(
                ds.x, ds.senders, ds.receivers,
                layer_name=args.layer_name, seed=args.seed)
            test_m = np.asarray(test)[order]
            y_m = np.asarray(ds.y)[order]
        else:
            g = build_graph(ds.x, ds.senders, ds.receivers)
        params = model.init(jax.random.PRNGKey(args.seed), g.x, g)
        if ckpt:
            from fitgnn_tpu.train.checkpoint import restore_params
            params = restore_params(ckpt, params)
        rep = baseline_inference_benchmark(
            model, params, g, test_m, y_m,
            num_samples=args.num_test_samples, classify=classify,
            seed=args.seed)
    else:
        from fitgnn_tpu.graph.container import SubgraphBatch
        part = _partition(args, ds, train, val, test, num_classes)
        g0 = (part.subgraphs if isinstance(part.subgraphs, SubgraphBatch)
              else part.subgraphs[0]).subgraph(0)
        # cache artifacts are host numpy; init runs eagerly (unlike the
        # jitted timed forward, which converts operands itself)
        g0 = jax.device_put(g0)
        params = model.init(jax.random.PRNGKey(args.seed), g0.x, g0)
        if ckpt:
            from fitgnn_tpu.train.checkpoint import restore_params
            params = restore_params(ckpt, params)
        rep = node_inference_benchmark(
            model, params, part.subgraphs, part.parent, test, ds.y,
            num_samples=args.num_test_samples, classify=classify,
            seed=args.seed, subgraph_index=part.subgraph_index)

    tag = "baseline" if baseline else "fitgnn"
    row = R.format_row(R.INFERENCE_HEADER, {
        "dataset": args.dataset, "coarsening_method": args.coarsening_method,
        "coarsening_ratio": args.coarsening_ratio, "exp_setup": tag,
        "layer_name": args.layer_name, "extra_nodes": args.extra_node,
        "cluster_node": args.cluster_node,
        "community_used": args.use_community_detection,
        "hidden": args.hidden, "num_layers": args.num_layers1,
        "num_test_samples": rep.num_test_samples,
        "avg_inf_time": rep.avg_inf_time, "avg_loss": rep.avg_loss,
        "acc": rep.acc, "avg_inf_time_device": rep.avg_inf_time_device})
    R.append_csv_row(f"inference_results/{args.task}.csv",
                     R.INFERENCE_HEADER, row)
    print(f"inference_results/{args.task}.csv <- {row}")
    return 0


def _cmd_infer_graph(args) -> int:
    import jax
    from fitgnn_tpu.data.datasets import load_graph_dataset
    from fitgnn_tpu.data.graph_level import (prepare_graph_sample,
                                             collate_graph_level)
    from fitgnn_tpu.models import GraphModel
    from fitgnn_tpu.bench.graph_inference import graph_inference_benchmark
    from fitgnn_tpu.utils import results as R

    gds = load_graph_dataset(args.dataset, args.data_root)
    classify = args.task == "graph_cls"
    n = min(args.num_test_samples, len(gds.graphs))
    samples = [prepare_graph_sample(
        x, s, r, y_, reduction=1.0 - args.coarsening_ratio,
        method=args.coarsening_method, mode=_node_mode(args), seed=args.seed)
        for (x, s, r), y_ in zip(gds.graphs[:n], gds.y[:n])]
    out_dim = int(gds.y.max()) + 1 if classify else 1
    depth = args.num_layers2 if getattr(args, "num_layers2", None) is not None \
        else args.num_layers1
    model = GraphModel(layer_name=args.layer_name, hidden=args.hidden,
                       num_layers=depth, out_dim=out_dim,
                       classify=classify)
    b0 = collate_graph_level([samples[0]])
    params = model.init(jax.random.PRNGKey(args.seed), b0.gc.x, b0.gc,
                        b0.gc_graph_ids, 1)
    ckpt = _resolve_checkpoint(args, baseline=False)
    if ckpt:
        from fitgnn_tpu.train.checkpoint import restore_params
        params = restore_params(ckpt, params)
    for view in ("gs", "gc"):
        rep = graph_inference_benchmark(model, params, samples, gds.y[:n],
                                        view=view, classify=classify,
                                        seed=args.seed)
        row = R.format_row(R.INFERENCE_HEADER, {
            "dataset": args.dataset,
            "coarsening_method": args.coarsening_method,
            "coarsening_ratio": args.coarsening_ratio,
            "exp_setup": f"fitgnn_{view}", "layer_name": args.layer_name,
            "extra_nodes": args.extra_node, "cluster_node": args.cluster_node,
            "community_used": args.use_community_detection,
            "hidden": args.hidden, "num_layers": args.num_layers1,
            "num_test_samples": rep.num_test_samples,
            "avg_inf_time": rep.avg_inf_time, "avg_loss": rep.avg_loss,
            "acc": rep.acc,
            "avg_inf_time_device": rep.avg_inf_time_device})
        R.append_csv_row(f"inference_results/{args.task}.csv",
                         R.INFERENCE_HEADER, row)
        print(f"inference_results/{args.task}.csv <- {row}")
    return 0


def _cmd_memory_graph(args) -> int:
    """Graph-task memory rows (reference memory tracking applied to the
    graph families): per-chunk device footprint of the Gs view vs the Gc
    view vs the largest single molecule, at ``--batch_size`` collation."""
    import jax.tree_util as jtu
    from fitgnn_tpu.data.datasets import load_graph_dataset
    from fitgnn_tpu.data.graph_level import (collate_graph_level_batches,
                                             prepare_graph_sample)
    from fitgnn_tpu.utils import results as R

    gds = load_graph_dataset(args.dataset, args.data_root)
    samples = [prepare_graph_sample(
        x, s, r, y_, reduction=1.0 - args.coarsening_ratio,
        method=args.coarsening_method, mode=_node_mode(args), seed=args.seed)
        for (x, s, r), y_ in zip(gds.graphs, gds.y)]
    chunks = collate_graph_level_batches(
        samples, getattr(args, "batch_size", 0) or 128)

    def mb(tree):
        return sum(np.asarray(a).size * np.asarray(a).dtype.itemsize
                   for a in jtu.tree_leaves(tree)) / 1e6

    b0 = chunks[0]
    biggest = max(gds.graphs, key=lambda g: g[0].shape[0])
    big_mb = (biggest[0].nbytes + biggest[1].nbytes + biggest[2].nbytes) / 1e6
    rows = [("chunk_gs", mb(b0.gs)), ("chunk_gc", mb(b0.gc)),
            ("max_graph", big_mb)]
    for kind, val in rows:
        row = R.format_row(R.MEMORY_HEADER, {
            "dataset": args.dataset,
            "coarsening_method": args.coarsening_method,
            "coarsening_ratio": args.coarsening_ratio, "task": args.task,
            "type": f"{kind}:{_node_mode(args)}",
            "max_memory_usage_graphs": f"{val:.2f}"})
        R.append_csv_row("memory_usage.csv", R.MEMORY_HEADER, row)
        print(f"memory_usage.csv <- {row}")
    return 0


def cmd_memory(args) -> int:
    from fitgnn_tpu.graph import build_graph
    from fitgnn_tpu.bench.memory import memory_report
    from fitgnn_tpu.utils import results as R

    if args.task in ("graph_cls", "graph_reg"):
        return _cmd_memory_graph(args)
    ds = _load_node(args)
    _apply_auto_config(args, ds.num_nodes)
    num_classes = ds.num_classes if args.task == "node_cls" else None
    train, val, test = _splits(args, ds, num_classes)
    part = _partition(args, ds, train, val, test, num_classes)
    g = build_graph(ds.x, ds.senders, ds.receivers)
    for row_ in memory_report(g, part.subgraphs):
        row = R.format_row(R.MEMORY_HEADER, {
            "dataset": args.dataset,
            "coarsening_method": args.coarsening_method,
            "coarsening_ratio": args.coarsening_ratio, "task": args.task,
            "type": f"{row_.kind}:{_node_mode(args)}",
            "max_memory_usage_graphs": f"{row_.real_mb:.2f}"})
        R.append_csv_row("memory_usage.csv", R.MEMORY_HEADER, row)
        print(f"memory_usage.csv <- {row}  (padded: {row_.padded_mb:.2f} MB)")
    return 0


def cmd_stats(args) -> int:
    from fitgnn_tpu.data.stats import node_dataset_stats, DatasetStats
    from fitgnn_tpu.utils.results import append_csv_row

    ds = _load_node(args)
    st = node_dataset_stats(args.dataset, ds.x, ds.senders, ds.receivers,
                            ds.y, classification=args.task == "node_cls")
    append_csv_row("dataset_info.csv", DatasetStats.CSV_HEADER, st.csv_row())
    print(st.csv_row())
    return 0


def cmd_save_graphs(args) -> int:
    """Warm the partition-artifact cache (_partition is load-or-compute)."""
    ds = _load_node(args)
    _apply_auto_config(args, ds.num_nodes)
    num_classes = ds.num_classes if args.task == "node_cls" else None
    train, val, test = _splits(args, ds, num_classes)
    part = _partition(args, ds, train, val, test, num_classes)
    from fitgnn_tpu.graph.container import SubgraphBatch
    if isinstance(part.subgraphs, SubgraphBatch):
        desc = f"{part.subgraphs.num_subgraphs} subgraphs"
    else:
        desc = (f"{sum(b.num_subgraphs for b in part.subgraphs)} subgraphs "
                f"in {len(part.subgraphs)} size buckets "
                f"{[b.num_nodes_padded for b in part.subgraphs]}")
    print(f"partition artifacts cached ({part.num_metanodes} metanodes, "
          f"{desc})")
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    args = arg_correction(args)
    cmds = {"train": cmd_train,
            "infer": lambda a: cmd_infer(a, baseline=False),
            "infer-baseline": lambda a: cmd_infer(a, baseline=True),
            "memory": cmd_memory,
            "stats": cmd_stats,
            "save-graphs": cmd_save_graphs}
    return cmds[args.command](args)


if __name__ == "__main__":
    raise SystemExit(main())
