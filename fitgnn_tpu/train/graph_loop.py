"""Graph-level training: jitted steps + the four experiment setups.

Counterpart of the reference's ``graph_classification`` / ``graph_regression``
runners (``run.py:575-831``) and the graph train/val/infer helpers
(``run.py:254-328``).  Deliberate semantic fixes over the reference (noted in
SURVEY §7.4, capabilities kept, quirks not copied):

* accuracy is computed over the whole split, not the last batch only
  (``run.py:284,323``);
* ``Gc_train_2_Gs_infer`` transfers the best Gc params into the Gs view for
  inference (the reference evaluates an untrained Gs model,
  ``run.py:644-649``);
* classification loss is the proper cross-entropy on the model's
  probabilities (the reference applies CrossEntropyLoss on top of softmax
  outputs — a double softmax).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fitgnn_tpu.data.graph_level import GraphLevelBatch
from fitgnn_tpu.models.models import GraphModel
from fitgnn_tpu.train.steps import TrainState, adam_l2

GRAPH_EXP_SETUPS = ("Gc_train_2_Gc_infer", "Gc_train_2_Gs_infer",
                    "Gs_train_2_Gs_infer", "Gc_train_2_Gs_train")


def _mask_of(batch: GraphLevelBatch):
    if batch.graph_mask is None:
        return jnp.ones(batch.num_graphs, dtype=jnp.float32)
    return batch.graph_mask.astype(jnp.float32)


def _graph_loss_sums(out, y, mask, classify: bool, prop: Optional[int]):
    """(loss_sum, count) over the valid samples of one (possibly padded)
    batch — padding samples contribute nothing."""
    if classify:
        logp = jnp.log(jnp.maximum(out, 1e-12))
        picked = jnp.take_along_axis(
            logp, y[:, None].astype(jnp.int32), axis=-1)[:, 0]
        return jnp.sum(-picked * mask), jnp.sum(mask)
    target = y if prop is None else y[:, prop]
    err = jnp.abs(out.reshape(target.shape) - target)
    return jnp.sum(err * mask), jnp.sum(mask)


def _graph_loss(out, y, classify: bool, prop: Optional[int], mask=None):
    if mask is None:
        mask = jnp.ones(y.shape[0], dtype=jnp.float32)
    s, c = _graph_loss_sums(out, y, mask, classify, prop)
    return s / jnp.maximum(c, 1.0)


def _graph_metric_sums(out, y, mask, classify: bool, prop: Optional[int]):
    """(metric_sum, count): correct count (cls) or raw L1 sum (reg — the
    caller normalizes by the split-label std, reference run.py:110,168)."""
    if classify:
        correct = (jnp.argmax(out, -1) == y).astype(jnp.float32)
        return jnp.sum(correct * mask), jnp.sum(mask)
    target = y if prop is None else y[:, prop]
    err = jnp.abs(out.reshape(target.shape) - target)
    return jnp.sum(err * mask), jnp.sum(mask)


def _graph_metric(out, y, classify: bool, prop: Optional[int], mask=None):
    if mask is None:
        mask = jnp.ones(y.shape[0], dtype=jnp.float32)
    s, c = _graph_metric_sums(out, y, mask, classify, prop)
    m = s / jnp.maximum(c, 1.0)
    if classify:
        return m
    target = y if prop is None else y[:, prop]
    return m / jnp.maximum(jnp.std(target), 1e-12)


@functools.partial(jax.jit, static_argnames=("classify", "prop", "view"))
def graph_train_step(state: TrainState, batch: GraphLevelBatch, rng,
                     classify: bool, prop: Optional[int], view: str):
    def loss_fn(params):
        out = _forward(state.apply_fn, params, batch, view, True, rng)
        return _graph_loss(out, batch.y, classify, prop, _mask_of(batch))

    val, grads = jax.value_and_grad(loss_fn)(state.params)
    return state.apply_gradients(grads=grads), val


@functools.partial(jax.jit, static_argnames=("classify", "prop", "view"))
def graph_eval_step(state: TrainState, batch: GraphLevelBatch,
                    classify: bool, prop: Optional[int], view: str):
    out = _forward(state.apply_fn, state.params, batch, view, False, None)
    return (_graph_loss(out, batch.y, classify, prop, _mask_of(batch)),
            _graph_metric(out, batch.y, classify, prop, _mask_of(batch)))


@functools.partial(jax.jit, static_argnames=("classify", "prop", "view"))
def graph_eval_sums(state: TrainState, batch: GraphLevelBatch,
                    classify: bool, prop: Optional[int], view: str):
    """(loss_sum, metric_sum, count) for cross-chunk aggregation."""
    out = _forward(state.apply_fn, state.params, batch, view, False, None)
    mask = _mask_of(batch)
    ls, c = _graph_loss_sums(out, batch.y, mask, classify, prop)
    ms, _ = _graph_metric_sums(out, batch.y, mask, classify, prop)
    return ls, ms, c


def _forward(apply_fn, params, batch: GraphLevelBatch, view: str,
             train: bool, rng):
    kwargs = {"train": train}
    if train:
        kwargs["rngs"] = {"dropout": rng}
    if view == "gc":
        return apply_fn(params, batch.gc.x, batch.gc, batch.gc_graph_ids,
                        batch.num_graphs, **kwargs)
    return apply_fn(params, batch.gs, batch.gs_graph_ids, batch.num_graphs,
                    method=GraphModel.forward_subgraphs, **kwargs)


@dataclasses.dataclass
class GraphTaskConfig:
    layer_name: str = "GCNConv"
    hidden: int = 64
    num_layers: int = 2
    out_dim: int = 2
    classify: bool = True
    exp_setup: str = "Gc_train_2_Gc_infer"
    epochs1: int = 100
    epochs2: int = 100
    lr: float = 0.01
    weight_decay: float = 5e-4
    prop: Optional[int] = None     # multi_prop property selector (QM9)
    seed: int = 0
    batch_size: int = 0            # >0: one optimizer step per chunk of
                                   # ``batch_size`` graphs (reference
                                   # T_DataLoader batching, run.py:577-580)
    save_path: Optional[str] = None  # orbax dir for best-val params


@dataclasses.dataclass
class GraphTaskResult:
    best_test_loss: float
    best_test_acc: float


def _as_batches(b) -> list:
    return [b] if isinstance(b, GraphLevelBatch) else list(b)


def _reg_norm(batches, prop: Optional[int]) -> float:
    """Std of the split's real targets (reference normalizes regression
    metrics by the label std, ``run.py:110,168``) — computed once, host-side,
    over every chunk's valid samples."""
    vals = []
    for b in batches:
        y = np.asarray(b.y)
        if prop is not None:
            y = y[:, prop]
        m = (np.ones(len(y), dtype=bool) if b.graph_mask is None
             else np.asarray(b.graph_mask))
        vals.append(y[m])
    return float(max(np.std(np.concatenate(vals)), 1e-12))


def run_graph_task(cfg: GraphTaskConfig, train_b, val_b, test_b,
                   verbose: bool = False) -> GraphTaskResult:
    """``train_b``/``val_b``/``test_b``: a GraphLevelBatch, or a list of
    identically-shaped chunks (see ``collate_graph_level_batches``) — one
    optimizer step per train chunk per epoch (the reference's DataLoader
    minibatching, ``run.py:577-580``)."""
    if cfg.exp_setup not in GRAPH_EXP_SETUPS:
        raise ValueError(f"exp_setup must be one of {GRAPH_EXP_SETUPS}")
    train_bs, val_bs, test_bs = (_as_batches(train_b), _as_batches(val_b),
                                 _as_batches(test_b))
    model = GraphModel(layer_name=cfg.layer_name, hidden=cfg.hidden,
                       num_layers=cfg.num_layers, out_dim=cfg.out_dim,
                       classify=cfg.classify)
    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng = jax.random.split(rng)
    b0 = train_bs[0]
    params = model.init(init_rng, b0.gc.x, b0.gc, b0.gc_graph_ids,
                        b0.num_graphs)
    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=adam_l2(cfg.lr, cfg.weight_decay))
    # per-split label std for regression metric normalization
    # (reference run.py:110,168)
    norms = {} if cfg.classify else {
        id(val_bs): _reg_norm(val_bs, cfg.prop),
        id(test_bs): _reg_norm(test_bs, cfg.prop)}

    def train_epoch(state, epoch_rng, view):
        loss = 0.0
        for i, b in enumerate(train_bs):
            state, l_ = graph_train_step(
                state, b, jax.random.fold_in(epoch_rng, i),
                cfg.classify, cfg.prop, view)
            loss += float(l_)
        return state, loss

    def eval_split(state, batches, view):
        ls = ms = c = 0.0
        for b in batches:
            l_, m_, c_ = graph_eval_sums(state, b, cfg.classify, cfg.prop,
                                         view)
            ls += float(l_)
            ms += float(m_)
            c += float(c_)
        c = max(c, 1.0)
        metric = (ms / c) if cfg.classify else (ms / c) / norms[id(batches)]
        return ls / c, metric

    best = {"val": np.inf, "test_loss": np.inf, "test_acc": 0.0}
    best_params = state.params

    def track(state, val_loss, test_loss, test_acc):
        if val_loss < best["val"]:
            best["val"] = val_loss
            best["test_loss"] = test_loss
            best["test_acc"] = test_acc
            return True
        return False

    import time as _time

    def _decompose(tag, ep_times):
        if verbose and len(ep_times) > 1:
            steady = float(np.median(ep_times[1:]))
            print(f"[{tag}] decomposition: first epoch (incl. compile) "
                  f"{ep_times[0]:.1f}s, steady {steady:.2f}s/epoch "
                  f"(median of {len(ep_times)-1})", flush=True)

    setup = cfg.exp_setup
    if setup in ("Gc_train_2_Gc_infer", "Gc_train_2_Gs_infer",
                 "Gc_train_2_Gs_train"):
        ep_times, t0 = [], _time.perf_counter()
        for epoch in range(cfg.epochs1):
            _, step_rng = jax.random.split(jax.random.fold_in(rng, epoch))
            state, _ = train_epoch(state, step_rng, "gc")
            val_loss, _ = eval_split(state, val_bs, "gc")
            t1 = _time.perf_counter()
            ep_times.append(t1 - t0)
            t0 = t1
            if verbose:
                print(f"[Gc graph] epoch {epoch}: val={float(val_loss):.4f}"
                      f" {ep_times[-1]:.1f}s", flush=True)
            if setup == "Gc_train_2_Gc_infer":
                test_loss, test_acc = eval_split(state, test_bs, "gc")
                if track(state, float(val_loss), float(test_loss),
                         float(test_acc)):
                    best_params = state.params
            else:
                if float(val_loss) < best["val"] or epoch == 0:
                    best["val"] = float(val_loss)
                    best_params = state.params
        _decompose("Gc graph", ep_times)

    if setup == "Gc_train_2_Gs_infer":
        # weight transfer (same pytree) then evaluate the Gs view
        state = state.replace(params=best_params)
        test_loss, test_acc = eval_split(state, test_bs, "gs")
        best["test_loss"], best["test_acc"] = float(test_loss), float(test_acc)

    if setup in ("Gs_train_2_Gs_infer", "Gc_train_2_Gs_train"):
        if setup == "Gc_train_2_Gs_train":
            state = state.replace(params=best_params)
        best["val"] = np.inf
        ep_times, t0 = [], _time.perf_counter()
        for epoch in range(cfg.epochs2):
            _, step_rng = jax.random.split(
                jax.random.fold_in(rng, 10_000 + epoch))
            state, _ = train_epoch(state, step_rng, "gs")
            val_loss, _ = eval_split(state, val_bs, "gs")
            test_loss, test_acc = eval_split(state, test_bs, "gs")
            t1 = _time.perf_counter()
            ep_times.append(t1 - t0)
            t0 = t1
            if verbose:
                print(f"[Gs graph] epoch {epoch}: val={float(val_loss):.4f}"
                      f" test={float(test_loss):.4f} "
                      f"acc={float(test_acc):.4f} {ep_times[-1]:.1f}s",
                      flush=True)
            if track(state, float(val_loss), float(test_loss),
                     float(test_acc)):
                best_params = state.params
        _decompose("Gs graph", ep_times)

    if cfg.save_path is not None:
        from fitgnn_tpu.train.checkpoint import save_params
        save_params(cfg.save_path, best_params)
    return GraphTaskResult(best_test_loss=best["test_loss"],
                           best_test_acc=best["test_acc"])
