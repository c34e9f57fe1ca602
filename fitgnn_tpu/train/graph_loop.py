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


def _graph_loss(out, y, classify: bool, prop: Optional[int]):
    if classify:
        logp = jnp.log(jnp.maximum(out, 1e-12))
        picked = jnp.take_along_axis(
            logp, y[:, None].astype(jnp.int32), axis=-1)[:, 0]
        return -jnp.mean(picked)
    target = y if prop is None else y[:, prop]
    return jnp.mean(jnp.abs(out.reshape(target.shape) - target))


def _graph_metric(out, y, classify: bool, prop: Optional[int]):
    if classify:
        return jnp.mean((jnp.argmax(out, -1) == y).astype(jnp.float32))
    target = y if prop is None else y[:, prop]
    l1 = jnp.mean(jnp.abs(out.reshape(target.shape) - target))
    return l1 / jnp.maximum(jnp.std(target), 1e-12)


@functools.partial(jax.jit, static_argnames=("classify", "prop", "view"))
def graph_train_step(state: TrainState, batch: GraphLevelBatch, rng,
                     classify: bool, prop: Optional[int], view: str):
    def loss_fn(params):
        out = _forward(state.apply_fn, params, batch, view, True, rng)
        return _graph_loss(out, batch.y, classify, prop)

    val, grads = jax.value_and_grad(loss_fn)(state.params)
    return state.apply_gradients(grads=grads), val


@functools.partial(jax.jit, static_argnames=("classify", "prop", "view"))
def graph_eval_step(state: TrainState, batch: GraphLevelBatch,
                    classify: bool, prop: Optional[int], view: str):
    out = _forward(state.apply_fn, state.params, batch, view, False, None)
    return (_graph_loss(out, batch.y, classify, prop),
            _graph_metric(out, batch.y, classify, prop))


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


@dataclasses.dataclass
class GraphTaskResult:
    best_test_loss: float
    best_test_acc: float


def run_graph_task(cfg: GraphTaskConfig, train_b: GraphLevelBatch,
                   val_b: GraphLevelBatch, test_b: GraphLevelBatch
                   ) -> GraphTaskResult:
    if cfg.exp_setup not in GRAPH_EXP_SETUPS:
        raise ValueError(f"exp_setup must be one of {GRAPH_EXP_SETUPS}")
    model = GraphModel(layer_name=cfg.layer_name, hidden=cfg.hidden,
                       num_layers=cfg.num_layers, out_dim=cfg.out_dim,
                       classify=cfg.classify)
    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng = jax.random.split(rng)
    params = model.init(init_rng, train_b.gc.x, train_b.gc,
                        train_b.gc_graph_ids, train_b.num_graphs)
    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=adam_l2(cfg.lr, cfg.weight_decay))

    best = {"val": np.inf, "test_loss": np.inf, "test_acc": 0.0}
    best_params = state.params

    def track(val_loss, test_loss, test_acc):
        if val_loss < best["val"]:
            best["val"] = val_loss
            best["test_loss"] = test_loss
            best["test_acc"] = test_acc
            return True
        return False

    setup = cfg.exp_setup
    if setup in ("Gc_train_2_Gc_infer", "Gc_train_2_Gs_infer",
                 "Gc_train_2_Gs_train"):
        for epoch in range(cfg.epochs1):
            _, step_rng = jax.random.split(jax.random.fold_in(rng, epoch))
            state, _ = graph_train_step(state, train_b, step_rng,
                                        cfg.classify, cfg.prop, "gc")
            val_loss, _ = graph_eval_step(state, val_b, cfg.classify,
                                          cfg.prop, "gc")
            if setup == "Gc_train_2_Gc_infer":
                test_loss, test_acc = graph_eval_step(
                    state, test_b, cfg.classify, cfg.prop, "gc")
                track(float(val_loss), float(test_loss), float(test_acc))
            else:
                if float(val_loss) < best["val"] or epoch == 0:
                    best["val"] = float(val_loss)
                    best_params = state.params

    if setup == "Gc_train_2_Gs_infer":
        # weight transfer (same pytree) then evaluate the Gs view
        state = state.replace(params=best_params)
        test_loss, test_acc = graph_eval_step(state, test_b, cfg.classify,
                                              cfg.prop, "gs")
        best["test_loss"], best["test_acc"] = float(test_loss), float(test_acc)

    if setup in ("Gs_train_2_Gs_infer", "Gc_train_2_Gs_train"):
        if setup == "Gc_train_2_Gs_train":
            state = state.replace(params=best_params)
        best["val"] = np.inf
        for epoch in range(cfg.epochs2):
            _, step_rng = jax.random.split(jax.random.fold_in(rng, 10_000 + epoch))
            state, _ = graph_train_step(state, train_b, step_rng,
                                        cfg.classify, cfg.prop, "gs")
            val_loss, _ = graph_eval_step(state, val_b, cfg.classify,
                                          cfg.prop, "gs")
            test_loss, test_acc = graph_eval_step(state, test_b, cfg.classify,
                                                  cfg.prop, "gs")
            track(float(val_loss), float(test_loss), float(test_acc))

    return GraphTaskResult(best_test_loss=best["test_loss"],
                           best_test_acc=best["test_acc"])
