"""Experiment-setup orchestration for node tasks.

The state machine of the reference's ``node_classification`` /
``node_regression`` runners (``run.py:329-574``): per-run model init, the
three experiment setups —

* ``Gc_train_2_Gs_infer``  — train on the coarse graph (best-val Gc
  checkpoint), infer on subgraphs,
* ``Gs_train_2_Gs_infer``  — train directly on subgraphs,
* ``Gc_train_2_Gs_train``  — coarse pre-training, then subgraph fine-tuning
  (the weight transfer is the same params pytree — no state-dict file hop),

with best-validation checkpointing (kept on device) and GD/MB gradient modes.
Multi-run statistics (mean, top-10, best) match the reference's reporting
(``run.py:477-506``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional

import jax
import numpy as np

from fitgnn_tpu.graph.container import SubgraphBatch
from fitgnn_tpu.models.models import NodeModel
from fitgnn_tpu.partition.pipeline import CoarseData
from fitgnn_tpu.train import steps

EXP_SETUPS = ("Gc_train_2_Gs_infer", "Gs_train_2_Gs_infer",
              "Gc_train_2_Gs_train")


@dataclasses.dataclass
class RunResult:
    test_loss: float
    test_acc: float
    test_time: float


@dataclasses.dataclass
class TaskResult:
    runs: List[RunResult]

    @property
    def summary(self) -> dict:
        accs = np.array([r.test_acc for r in self.runs])
        losses = np.array([r.test_loss for r in self.runs])
        times = np.array([r.test_time for r in self.runs])
        top_acc = np.sort(accs)[::-1][:10]
        top_loss = np.sort(losses)[:10]
        return {
            "ave_acc": float(accs.mean()), "std_acc": float(accs.std()),
            "ave_time": float(times.mean()),
            "top_10_acc": float(top_acc.mean()),
            "top_10_acc_std": float(top_acc.std()),
            "best_acc": float(top_acc[0]) if len(top_acc) else 0.0,
            "top_10_loss": float(top_loss.mean()),
            "top_10_loss_std": float(top_loss.std()),
            "best_loss": float(top_loss[0]) if len(top_loss) else 0.0,
            # regression: test_acc holds the std-normalized L1 metric
            # (steps.gs/gc_eval_step) — the value the reference RECORDS as
            # its regression loss (run.py:110,168); sorted ascending
            # (lower = better) for the node_reg CSV loss columns
            "top_10_metric": float(np.sort(accs)[:10].mean()),
            "top_10_metric_std": float(np.sort(accs)[:10].std()),
            "best_metric": float(np.sort(accs)[0]) if len(accs) else 0.0,
        }


@dataclasses.dataclass
class NodeTaskConfig:
    layer_name: str = "GCNConv"
    hidden: int = 512
    num_layers: int = 2
    task: str = "classification"          # or "regression"
    out_dim: int = 2                      # num_classes or 1
    exp_setup: str = "Gc_train_2_Gs_infer"
    epochs1: int = 100
    epochs2: int = 300
    lr: float = 0.01
    lr2: Optional[float] = None           # Gs-phase learning rate (None =
                                          # lr).  MB mode takes ~E/batch
                                          # optimizer steps per epoch where
                                          # GD takes one; at products scale
                                          # (~100 chunks/epoch) lr=0.01
                                          # destabilizes the hard-regime Gs
                                          # phase (round-5 diag: MB acc
                                          # 0.74 vs GD 0.86 at 20k, 0.22 at
                                          # 100k) — set lr2 ~lr/5 for MB
    weight_decay: float = 5e-4
    gradient_method: str = "GD"           # or "MB"
    loss_reduction: str = "mean"          # or "sum" (reference flag)
    batch_size: int = 128                 # subgraphs per MB optimizer step
    runs: int = 1
    seed: int = 0
    logdir: Optional[str] = None          # scalar JSONL/TB per run
    run_intermediate_inference: bool = False
    intermediate_inference_freq: int = 10
    save_path: Optional[str] = None       # orbax dir for best-val params
                                          # (reference model.pt, run.py:355)
    bucket_sizes: bool = False            # size-bucketed Gs batches (bounds
                                          # padding waste on skewed subgraphs)
    intermediate_csv_path: Optional[str] = None  # reference run.py:376-387
                                          # sink: epoch,test_loss,test_acc,
                                          # test_time appended per check
    num_devices: int = 1                  # >1: shard the Gs phase over the
                                          # subgraph axis (GD only) and the
                                          # Gc phase over the hier mesh
    num_hosts: int = 1                    # with num_devices > 1: arrange the
                                          # Gc-phase mesh as (hosts × chips)
                                          # — exact halo over the chip axis,
                                          # cluster summaries across hosts
    gc_cluster: int = 0                   # with num_devices > 1: per-shard
                                          # interior straggler collapse onto
                                          # local contiguous-K cluster
                                          # summaries (the single-chip
                                          # --cluster_attention/_aggregation
                                          # dial composed into the hier
                                          # interior; K = nodes per cluster)
    gc_cluster_exact: int = 0             # top-k straggler senders that
                                          # keep the exact per-edge path
    early_stopping: int = 0               # patience in epochs on the val
                                          # loss; 0 = off (the reference
                                          # parses --early_stopping but
                                          # never uses it, main.py:189)
    eval_chunk: int = 0                   # >0: Gs eval scans subgraph-axis
                                          # chunks of this size (bounds
                                          # activation memory; products-scale
                                          # buckets hold ~80k subgraphs)
    resume_path: Optional[str] = None     # orbax dir for MID-TRAINING resume
                                          # checkpoints (state + rng + phase/
                                          # epoch cursor); load-if-exists at
                                          # start, so a killed products run
                                          # continues instead of restarting
                                          # (the reference has no analog)
    checkpoint_every: int = 0             # epochs between resume saves
                                          # (0 = phase boundaries only)
    chunk_elem_budget: int = 1 << 28      # static per-chunk activation
                                          # budget in ELEMENTS: the vmapped
                                          # convs materialize (chunk, E_pad,
                                          # hidden) per-edge messages, so MB
                                          # batch size and eval chunk are
                                          # capped at budget/(E_pad·hidden)
                                          # per bucket (256M ≈ 1 GB f32 per
                                          # buffer; binds only at products
                                          # scale)
    fused_epochs: bool = False            # run the Gc phase as ONE jitted
                                          # lax.scan over epochs (best-val
                                          # tracking in the carry) — one
                                          # dispatch per phase instead of
                                          # 2 per epoch; incompatible with
                                          # early_stopping (which needs the
                                          # host to see val losses)


def _make_dist_steps(cfg, batches):
    """Build the subgraph-axis sharded Gs steps for ``cfg.num_devices``.

    Returns (train_step(state, rng), eval_step(state, split), batches) with
    the batches padded to a shard multiple and captured in the closures."""
    import jax.sharding
    from fitgnn_tpu.parallel import mesh as pmesh
    from fitgnn_tpu.parallel.dist_subgraphs import (
        make_dist_gs_eval_step_multi, make_dist_gs_train_epoch_mb,
        make_dist_gs_train_step_multi, pad_batch_to_shards)

    devices = jax.devices()
    if len(devices) < cfg.num_devices:
        raise ValueError(
            f"num_devices={cfg.num_devices} but only {len(devices)} JAX "
            f"devices are visible (set XLA_FLAGS="
            f"--xla_force_host_platform_device_count=N for a CPU mesh)")
    mesh = jax.sharding.Mesh(np.array(devices[:cfg.num_devices]),
                             (pmesh.DATA_AXIS,))
    batches = tuple(pad_batch_to_shards(b, cfg.num_devices) for b in batches)
    if cfg.gradient_method == "MB":
        # one psum-reduced optimizer step per batch_size-subgraph chunk
        # (reference node_train_Gs_MB, run.py:217); the chunk is
        # activation-budgeted like the single-device path (the per-device
        # (bs_local, E_pad, hidden) message buffers are what OOM)
        bs = min(cfg.batch_size,
                 *(_chunk_cap(cfg, b) * cfg.num_devices for b in batches))
        train = make_dist_gs_train_epoch_mb(mesh, batches, cfg.task,
                                            batch_size=bs)
    elif cfg.gradient_method == "GD":
        train = make_dist_gs_train_step_multi(mesh, batches, cfg.task)
    else:
        raise ValueError(f"unknown gradient_method {cfg.gradient_method!r}"
                         " (GD or MB)")
    evals = {s: make_dist_gs_eval_step_multi(mesh, batches, cfg.task, split=s)
             for s in ("val", "test")}
    return (lambda state, rng: train(state, batches, rng),
            lambda state, split: evals[split](state, batches),
            batches)


def _make_hier_gc_steps(cfg, coarse):
    """Distributed Gc phase: the coarse graph sharded over a
    (num_hosts × chips) hier mesh — community-placed shards, exact halo over
    the chip/ICI axis, cluster summaries across hosts.  This makes the full
    reference curriculum (Gc train → Gs train/infer, ``run.py:345-400``)
    distributed end to end: params stay a single pytree shared by the
    single-device ``NodeModel``, the subgraph-axis Gs steps, and the hier
    model, so the Gc→Gs weight transfer remains a plain pytree copy.

    Per-layer aggregation weights replicate the single-device layer
    semantics ON THE COARSE GRAPH (whose GCN weights normalize the weighted
    coarse adjacency — ``models.layers``): GCN keeps the prebuilt weights,
    SAGE gets 1/indeg over non-self edges, GIN unit non-self, GAT the
    real-edge mask.

    Returns ``(train_fn(state, rng) -> (state, loss),
    val_fn(state) -> (loss, acc))``."""
    import jax as _jax  # noqa: F401
    from fitgnn_tpu.parallel import (HierNodeModel, build_hier_plan,
                                     make_hier_eval_step, make_hier_mesh,
                                     make_hier_train_step)
    from fitgnn_tpu.graph.optimize import _LAYER_SEMANTICS, _operator_weights
    from fitgnn_tpu.parallel.multihost import placement_by_community
    from fitgnn_tpu.parallel.shard import (shard_node_array,
                                           shard_prebuilt_graph)
    from fitgnn_tpu.partition.community import leiden_communities

    H, P_ = cfg.num_hosts, cfg.num_devices
    if P_ % H:
        raise ValueError(f"num_devices {P_} must divide by num_hosts {H}")
    D = P_ // H

    g = coarse.graph
    s = np.asarray(g.senders, np.int64)
    r = np.asarray(g.receivers, np.int64)
    w = np.asarray(g.edge_weight, np.float32)
    real = np.arange(len(s)) < int(g.n_edge)
    nonself = real & (s != r)
    ln = cfg.layer_name
    if ln not in _LAYER_SEMANTICS:
        raise ValueError(f"unknown layer {ln!r} for the distributed Gc phase")
    # padding edges are weight-0 self-loops on the pad node (graph.build),
    # exactly the convention _operator_weights assumes — one rule, one home
    wl = _operator_weights(s, r, w, int(g.num_nodes_padded),
                           _LAYER_SEMANTICS[ln])

    x = np.asarray(g.x)
    yt, yv = np.asarray(coarse.y_train), np.asarray(coarse.y_val)
    tm, vm = np.asarray(coarse.train_mask), np.asarray(coarse.val_mask)
    labels = leiden_communities(s[nonself], r[nonself], x.shape[0],
                                seed=cfg.seed)
    order, _ = placement_by_community(labels, P_)
    sg = shard_prebuilt_graph(x, s, r, wl, yt, P_, train_mask=tm,
                              val_mask=vm, order=order)
    n_loc, n_pad = sg.nodes_per_shard, sg.num_nodes_global
    # val labels ride the SAME node placement as sg — no second ShardedGraph
    yv_sh = shard_node_array(yv, P_, n_loc, order=order)
    lab_ordered = np.concatenate(
        [labels[order], np.full(n_pad - len(order), labels.max() + 1,
                                dtype=np.int64)])
    pair = ((np.arange(n_pad) // n_loc) * (int(lab_ordered.max()) + 2)
            + lab_ordered)
    _, cluster_of = np.unique(pair, return_inverse=True)
    K = cfg.gc_cluster
    n_pad_shard = -(-n_loc // 128) * 128
    if K and n_pad_shard % K:
        # snap to the largest 128-multiple divisor ≤ K (the per-shard
        # padded node count is set by the partition, not the user)
        nb = n_pad_shard // 128
        cands = [128 * d for d in range(1, nb + 1)
                 if nb % d == 0 and 128 * d <= K]
        newk = max(cands) if cands else 128 if n_pad_shard % 128 == 0 else 0
        print(f"warning: interior cluster size {K} does not divide the "
              f"per-shard padded node count {n_pad_shard}; using {newk}")
        K = newk
    plan = build_hier_plan(np.asarray(sg.senders), np.asarray(sg.receivers),
                           np.asarray(sg.edge_weight), H, D, n_loc,
                           cluster_of, interior_hybrid=True,
                           interior_semantics=_LAYER_SEMANTICS[ln],
                           interior_cluster=K,
                           interior_cluster_exact=cfg.gc_cluster_exact)
    mesh = make_hier_mesh(H, D)
    hmodel = HierNodeModel(hidden=cfg.hidden, num_layers=cfg.num_layers,
                           out_dim=cfg.out_dim, layer_name=ln,
                           classify=cfg.task == "classification")
    train_step = make_hier_train_step(mesh, hmodel, plan)
    eval_step = make_hier_eval_step(mesh, hmodel, plan)

    def train_fn(state, rng):
        with mesh:
            return train_step(state, sg.x, sg.y, sg.train_mask, plan, rng)

    def val_fn(state):
        with mesh:
            return eval_step(state, sg.x, yv_sh, sg.val_mask, plan)

    return train_fn, val_fn


def _chunk_cap(cfg, batch) -> int:
    """Largest subgraph-axis chunk whose (chunk, E_pad, hidden) per-edge
    message buffers stay inside ``cfg.chunk_elem_budget`` elements."""
    e_pad = batch.senders.shape[-1]
    return max(1, cfg.chunk_elem_budget // max(1, e_pad * cfg.hidden))


def _gs_train_epoch(state, batches, rng, cfg):
    if cfg.gradient_method not in ("GD", "MB"):
        raise ValueError(f"unknown gradient_method {cfg.gradient_method!r}"
                         " (GD or MB)")
    if len(batches) == 1:
        batch = batches[0]
        if cfg.gradient_method == "GD":
            return steps.gs_train_step_gd(state, batch, rng, cfg.task,
                                          reduction=cfg.loss_reduction)
        bs = min(cfg.batch_size, batch.num_subgraphs, _chunk_cap(cfg, batch))
        return steps.gs_train_epoch_mb(state, batch, rng, cfg.task,
                                       batch_size=bs,
                                       reduction=cfg.loss_reduction)
    if cfg.gradient_method == "GD":
        return steps.gs_train_step_gd_multi(state, batches, rng, cfg.task)
    # MB over buckets: step through each bucket's chunks in turn
    total = 0.0
    for i, b in enumerate(batches):
        bs = min(cfg.batch_size, b.num_subgraphs, _chunk_cap(cfg, b))
        state, loss = steps.gs_train_epoch_mb(
            state, b, jax.random.fold_in(rng, i), cfg.task, batch_size=bs,
            reduction=cfg.loss_reduction)
        total += float(loss)
    return state, total


def _gs_eval(state, batches, task, split, chunk: int = 0, cfg=None):
    if len(batches) == 1 and not chunk:
        return steps.gs_eval_step(state, batches[0], task, split=split)
    if chunk and cfg is not None:
        # chunked eval runs ONE jitted program PER bucket (each chunk-scan
        # memory-budgeted) and combines the sums host-side: at products
        # scale the monolithic all-buckets executable is what the remote
        # compiler/worker cannot hold
        sums = [steps.gs_eval_bucket_sums(
                    state, b, task, split=split,
                    chunk=min(chunk, _chunk_cap(cfg, b)))
                for b in batches]
        return steps.finish_eval_from_sums(task, sums)
    return steps.gs_eval_step_multi(state, batches, task, split=split,
                                    chunk=chunk)


def run_node_task(cfg: NodeTaskConfig, coarse: Optional[CoarseData],
                  batch, verbose: bool = False) -> TaskResult:
    """``batch``: one SubgraphBatch, or a sequence of size-bucketed batches
    (see partition.bucketing) — GD/eval semantics are identical."""
    if cfg.exp_setup not in EXP_SETUPS:
        raise ValueError(f"exp_setup must be one of {EXP_SETUPS}")
    if cfg.exp_setup != "Gs_train_2_Gs_infer" and coarse is None:
        raise ValueError(f"{cfg.exp_setup} requires a coarse graph")
    batches = ((batch,) if isinstance(batch, SubgraphBatch)
               else tuple(batch))

    model = NodeModel(layer_name=cfg.layer_name, hidden=cfg.hidden,
                      num_layers=cfg.num_layers, out_dim=cfg.out_dim,
                      classify=cfg.task == "classification")

    hier_gc = None
    if cfg.num_devices > 1:
        dist_train, dist_eval, batches = _make_dist_steps(cfg, batches)
        gs_train_fn = lambda state, rng: dist_train(state, rng)  # noqa: E731
        gs_eval_fn = lambda state, split: dist_eval(state, split)  # noqa: E731
        if (cfg.exp_setup in ("Gc_train_2_Gs_infer", "Gc_train_2_Gs_train")
                and coarse is not None):
            # the coarse phase shards over the hier mesh too — the full
            # curriculum is distributed (reference run.py:345-400 as the
            # distributed phase, SURVEY §2.4)
            hier_gc = _make_hier_gc_steps(cfg, coarse)
    else:
        # commit the (possibly host-cached numpy) batches and coarse data
        # to the device ONCE — numpy jit operands re-transfer every call,
        # which at products scale re-ships GBs per epoch through the host
        # link
        batches = jax.device_put(batches)
        if coarse is not None:
            import dataclasses as _dc
            coarse = _dc.replace(
                coarse, graph=jax.device_put(coarse.graph),
                y_train=jax.device_put(coarse.y_train),
                train_mask=jax.device_put(coarse.train_mask),
                y_val=jax.device_put(coarse.y_val),
                val_mask=jax.device_put(coarse.val_mask))
        gs_train_fn = lambda state, rng: _gs_train_epoch(  # noqa: E731
            state, batches, rng, cfg)
        gs_eval_fn = lambda state, split: _gs_eval(  # noqa: E731
            state, batches, cfg.task, split, chunk=cfg.eval_chunk, cfg=cfg)

    def vprint(msg):
        # flushed progress lines: products-scale phases run for minutes per
        # compile — an opaque subprocess is undebuggable (round-4 flagship)
        if verbose:
            print(msg, flush=True)

    results: List[RunResult] = []
    skip_runs = 0          # runs already completed by a resumed session
    cursor = None          # (phase, next_epoch, since_best, state,
                           # best_params, best_val, rng) for the resumed
                           # run; None = fresh

    def _config_fp() -> int:
        # resuming under a changed schedule/model silently produces results
        # belonging to NEITHER config — fingerprint what shapes the stream
        import zlib
        key = (cfg.seed, cfg.epochs1, cfg.epochs2, cfg.runs, cfg.exp_setup,
               cfg.gradient_method, cfg.batch_size, cfg.layer_name,
               cfg.hidden, cfg.num_layers, cfg.task, cfg.lr,
               cfg.weight_decay, cfg.loss_reduction, cfg.early_stopping)
        return zlib.crc32(repr(key).encode())

    def save_resume(state, best_params, best_val, rng, phase, epoch, run,
                    since_best=0):
        if cfg.resume_path is None:
            return
        from fitgnn_tpu.train import checkpoint as ckpt
        ckpt.save_resume(
            cfg.resume_path, state, best_params, best_val, rng, phase,
            epoch, run,
            [[r.test_loss, r.test_acc, r.test_time] for r in results],
            since_best=since_best, config_fp=_config_fp())

    template = rng0 = None
    if cfg.resume_path is not None:
        # load ONCE, before any per-run work: skipped runs must not pay a
        # model-init trace each (the "noop fast" path)
        from fitgnn_tpu.train import checkpoint as ckpt
        rng0 = jax.random.PRNGKey(cfg.seed)
        rng0, init0 = jax.random.split(rng0)
        example = (coarse.graph if coarse is not None
                   else batches[0].subgraph(0))
        template = steps.create_state(model, init0, example.x, example,
                                      lr=cfg.lr,
                                      weight_decay=cfg.weight_decay)
        r = ckpt.load_resume(cfg.resume_path, template, rng0,
                             config_fp=_config_fp())
        if r is not None:
            (rstate, rbest_p, rbest_v, rrng, phase, epoch,
             skip_runs, done, since_best) = r
            for tl, ta, tt in done:
                results.append(RunResult(test_loss=float(tl),
                                         test_acc=float(ta),
                                         test_time=float(tt)))
            if epoch + 1 > 0 or phase == "gs":
                cursor = (phase, epoch + 1, since_best,
                          rstate, rbest_p, rbest_v, rrng)
            # else: run-complete marker — the next run starts from a
            # FRESH init/rng, exactly like an uninterrupted session
            vprint(f"[resume] run {skip_runs} {phase} "
                   f"epoch {epoch + 1} ({len(results)} runs done)")

    for run in range(cfg.runs):
        if run < skip_runs:
            continue
        my_cursor, cursor = (cursor if run == skip_runs else None), None
        if my_cursor is not None:
            (_, _, _, state, best_params, best_val, rng) = my_cursor
            my_cursor = my_cursor[:3]
        else:
            if run == 0 and template is not None:
                state, rng = template, rng0   # same init stream, reused
            else:
                rng = jax.random.PRNGKey(cfg.seed + run)
                rng, init_rng = jax.random.split(rng)
                example = (coarse.graph if coarse is not None
                           else batches[0].subgraph(0))
                state = steps.create_state(model, init_rng, example.x,
                                           example, lr=cfg.lr,
                                           weight_decay=cfg.weight_decay)
            best_params = state.params
            best_val = np.inf

        writer = None
        if cfg.logdir is not None:
            from fitgnn_tpu.utils.logging import ScalarWriter
            writer = ScalarWriter(cfg.logdir, run=run + 1)
            if my_cursor is not None:
                # the dead session already logged the epochs being
                # replayed (its last rows postdate the checkpoint) —
                # drop them so (tag, step) stays unique
                writer.trim_replay(
                    "Gs_" if my_cursor[0] == "gs" else "Gc_",
                    my_cursor[1], gc_done=my_cursor[0] == "gs")

        def log(tag, value, step):
            if writer is not None:
                writer.add_scalar(tag, value, step)

        gc_start, gc_sb = 0, 0
        if my_cursor is not None and my_cursor[0] == "gc":
            gc_start, gc_sb = my_cursor[1], my_cursor[2]
        run_gc = my_cursor is None or my_cursor[0] == "gc"

        if (cfg.exp_setup in ("Gc_train_2_Gs_infer", "Gc_train_2_Gs_train")
                and run_gc):
            t_gc = time.perf_counter()
            gc_ep_times = []
            if hier_gc is not None:
                hier_train_fn, hier_val_fn = hier_gc
                since_best = gc_sb
                gc_ep_times, t_ep0 = [], t_gc
                for epoch in range(gc_start, cfg.epochs1):
                    rng, step_rng = jax.random.split(rng)
                    state, train_loss = hier_train_fn(state, step_rng)
                    val_loss, _ = hier_val_fn(state)
                    val_loss = float(val_loss)
                    t_ep1 = time.perf_counter()
                    gc_ep_times.append(t_ep1 - t_ep0)
                    t_ep0 = t_ep1
                    if epoch < 2 or epoch % 10 == 0:
                        vprint(f"[Gc hier] epoch {epoch}: val={val_loss:.4f}"
                               f" {t_ep1-t_gc:.0f}s")
                    log("Gc_train_loss", float(train_loss), epoch)
                    log("Gc_val_loss", val_loss, epoch)
                    if val_loss < best_val or epoch == 0:
                        best_val = val_loss
                        best_params = state.params
                        since_best = 0
                    else:
                        since_best += 1
                        if (cfg.early_stopping
                                and since_best >= cfg.early_stopping):
                            break
                    if (cfg.checkpoint_every
                            and (epoch + 1) % cfg.checkpoint_every == 0):
                        save_resume(state, best_params, best_val, rng,
                                    "gc", epoch, run, since_best)
            elif cfg.fused_epochs and not cfg.early_stopping:
                rng, step_rng = jax.random.split(rng)
                # AOT-split the fused phase so the recorded wall-clock
                # decomposes into {compile s, execute s} (VERDICT r4 ask
                # #6: the round-4 flagship's "3 s/epoch" Gc was opaque —
                # remote-compile-dominated, but unprovably so)
                fused = jax.jit(steps.gc_train_epochs_scan,
                                static_argnums=(7, 8, 9))
                args = (state, coarse.graph, coarse.y_train,
                        coarse.train_mask, coarse.y_val, coarse.val_mask,
                        step_rng, cfg.epochs1, cfg.task,
                        cfg.loss_reduction)
                t0 = time.perf_counter()
                compiled = fused.lower(*args).compile()
                t_compile = time.perf_counter() - t0
                t0 = time.perf_counter()
                out = compiled(*args[:7])
                state, best_params, best_val, tr_losses, val_losses = out
                # time through a VALUE fetch: on the remote-attached TPU
                # block_until_ready returns when the handle exists, not
                # when the computation completes (the bench.py result-
                # caching trap) — only fetching a scalar is honest
                best_val = float(best_val)
                t_exec = time.perf_counter() - t0
                vprint(f"[Gc fused] {cfg.epochs1} epochs: "
                       f"best_val={best_val:.4f} "
                       f"compile={t_compile:.1f}s "
                       f"exec={t_exec:.1f}s "
                       f"({t_exec/max(cfg.epochs1,1)*1e3:.1f} ms/epoch)")
                for epoch, (tl, vl) in enumerate(zip(np.asarray(tr_losses),
                                                     np.asarray(val_losses))):
                    log("Gc_train_loss", float(tl), epoch)
                    log("Gc_val_loss", float(vl), epoch)
            else:
                since_best = gc_sb
                gc_ep_times, t_ep0 = [], t_gc
                for epoch in range(gc_start, cfg.epochs1):
                    rng, step_rng = jax.random.split(rng)
                    state, train_loss = steps.gc_train_step(
                        state, coarse.graph, coarse.y_train,
                        coarse.train_mask, step_rng, cfg.task,
                        reduction=cfg.loss_reduction)
                    val_loss, _ = steps.gc_eval_step(
                        state, coarse.graph, coarse.y_val, coarse.val_mask,
                        cfg.task)
                    val_loss = float(val_loss)
                    t_ep1 = time.perf_counter()
                    gc_ep_times.append(t_ep1 - t_ep0)
                    t_ep0 = t_ep1
                    log("Gc_train_loss", float(train_loss), epoch)
                    log("Gc_val_loss", val_loss, epoch)
                    if epoch < 2 or epoch % 10 == 0:
                        vprint(f"[Gc] epoch {epoch}: val={val_loss:.4f}"
                               f" {t_ep1-t_gc:.0f}s")
                    if val_loss < best_val or epoch == 0:
                        best_val = val_loss
                        best_params = state.params
                        since_best = 0
                    else:
                        since_best += 1
                        if (cfg.early_stopping
                                and since_best >= cfg.early_stopping):
                            break
                    if (cfg.checkpoint_every
                            and (epoch + 1) % cfg.checkpoint_every == 0):
                        save_resume(state, best_params, best_val, rng,
                                    "gc", epoch, run, since_best)

            if len(gc_ep_times) > 1:
                steady = float(np.median(gc_ep_times[1:]))
                vprint(f"[Gc] decomposition: first epoch (incl. compile) "
                       f"{gc_ep_times[0]:.1f}s, steady "
                       f"{steady:.3f}s/epoch (median of "
                       f"{len(gc_ep_times)-1})")

        if cfg.exp_setup in ("Gs_train_2_Gs_infer", "Gc_train_2_Gs_train"):
            resumed_gs = my_cursor is not None and my_cursor[0] == "gs"
            gs_start, gs_sb = (my_cursor[1], my_cursor[2]) if resumed_gs \
                else (0, 0)
            if not resumed_gs:
                if cfg.exp_setup == "Gc_train_2_Gs_train":
                    # weight transfer: resume from the best Gc params
                    state = state.replace(params=best_params)
                if cfg.lr2 is not None and cfg.lr2 != cfg.lr:
                    # fresh optimizer at the phase boundary: the Gs phase
                    # runs at its own rate (and Gc's Adam moments are
                    # calibrated to full-graph gradients, not chunked ones)
                    state = steps.TrainState.create(
                        apply_fn=state.apply_fn, params=state.params,
                        tx=steps.adam_l2(cfg.lr2, cfg.weight_decay))
                best_val = np.inf
                # phase boundary: a resumed session skips the Gc phase
                save_resume(state, state.params, best_val, rng,
                            "gs", -1, run)
            elif cfg.lr2 is not None and cfg.lr2 != cfg.lr:
                # resumed mid-Gs: the restored opt arrays are adam-shaped
                # either way, but the tx function is rebuilt from cfg — at
                # the Gs rate, not the Gc one
                state = state.replace(
                    tx=steps.adam_l2(cfg.lr2, cfg.weight_decay))
            since_best = gs_sb
            t_gs = time.perf_counter()
            gs_ep_times = []
            t_ep0 = t_gs
            for epoch in range(gs_start, cfg.epochs2):
                rng, step_rng = jax.random.split(rng)
                state, train_loss = gs_train_fn(state, step_rng)
                t_tr = time.perf_counter()
                vprint(f"[Gs] epoch {epoch}: train={float(train_loss):.4f}"
                       f" {t_tr-t_gs:.0f}s")
                val_loss, val_acc = gs_eval_fn(state, "val")
                val_loss = float(val_loss)
                t_ep1 = time.perf_counter()
                gs_ep_times.append(t_ep1 - t_ep0)
                t_ep0 = t_ep1
                vprint(f"[Gs] epoch {epoch}: val={val_loss:.4f}"
                       f" acc={float(val_acc):.4f}"
                       f" {t_ep1-t_gs:.0f}s")
                log("Gs_train_loss", float(train_loss), epoch)
                log("Gs_val_loss", val_loss, epoch)
                log("Gs_val_acc", float(val_acc), epoch)
                if val_loss < best_val or epoch == 0:
                    best_val = val_loss
                    best_params = state.params
                    since_best = 0
                else:
                    since_best += 1
                    if (cfg.early_stopping
                            and since_best >= cfg.early_stopping):
                        break
                if (cfg.checkpoint_every
                        and (epoch + 1) % cfg.checkpoint_every == 0):
                    save_resume(state, best_params, best_val, rng,
                                "gs", epoch, run, since_best)
                if (cfg.run_intermediate_inference
                        and epoch % cfg.intermediate_inference_freq == 0):
                    # periodic test with the best-so-far params
                    # (reference run.py:376-387)
                    test_state = state.replace(params=best_params)
                    t0 = time.perf_counter()
                    t_loss, t_acc = gs_eval_fn(test_state, "test")
                    t_loss, t_acc = float(t_loss), float(t_acc)
                    t_time = time.perf_counter() - t0
                    log("Gs_test_loss_intermediate", t_loss, epoch)
                    log("Gs_test_acc_intermediate", t_acc, epoch)
                    if cfg.intermediate_csv_path is not None:
                        from fitgnn_tpu.utils.results import append_csv_row
                        append_csv_row(
                            cfg.intermediate_csv_path,
                            "epoch,test_loss,test_acc,test_time",
                            f"{epoch},{t_loss},{t_acc},{t_time}")

            if len(gs_ep_times) > 1:
                # compile vs steady decomposition (VERDICT r4 ask #6):
                # epoch 0 pays every executable's compile; the rest is
                # steady-state
                steady = float(np.median(gs_ep_times[1:]))
                vprint(f"[Gs] decomposition: first epoch (incl. compile) "
                       f"{gs_ep_times[0]:.1f}s, steady "
                       f"{steady:.2f}s/epoch (median of "
                       f"{len(gs_ep_times)-1})")

        # test with the best-val params, timed (post-compile re-run)
        state = state.replace(params=best_params)
        gs_eval_fn(state, "test")  # warm-up
        t0 = time.perf_counter()
        test_loss, test_metric = gs_eval_fn(state, "test")
        test_loss = float(test_loss)
        test_metric = float(test_metric)
        elapsed = time.perf_counter() - t0
        results.append(RunResult(test_loss=test_loss, test_acc=test_metric,
                                 test_time=elapsed))
        if cfg.save_path is not None:
            from fitgnn_tpu.train.checkpoint import save_params
            save_params(cfg.save_path, best_params)
        # run-complete marker AFTER the model checkpoint: a crash between
        # the two must re-run the save, not report a "completed" session
        # whose model.pt was never written.  A resumed session starts the
        # NEXT run fresh (epoch -1 ⇒ no cursor state applied).
        save_resume(state, best_params, best_val, rng, "gc", -1, run + 1)
        log("Gs_test_loss", test_loss, run)
        log("Gs_test_acc", test_metric, run)
        if writer is not None:
            writer.close()
        if verbose:
            print(f"run {run}: test_loss={test_loss:.4f} "
                  f"metric={test_metric:.4f}")
    return TaskResult(runs=results)
