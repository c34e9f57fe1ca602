"""shard_map'ed distributed training step over the data mesh.

One jitted step: each device runs the sharded forward (all-gather of hidden
activations + local edge aggregation), computes its shard's contribution to
the global masked loss, and grads are ``psum``-reduced so replicated params
stay bit-identical — the collective-backed replacement for the capability the
reference lacks entirely (SURVEY §2.4: no DP/TP/collectives anywhere).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from fitgnn_tpu.parallel.mesh import DATA_AXIS
from fitgnn_tpu.parallel.shard import ShardedGraph
from fitgnn_tpu.train.steps import TrainState, adam_l2
from fitgnn_tpu.parallel.dist_model import DistNodeModel
from fitgnn_tpu.train.losses import (task_loss_sums, task_metric_from_sums,
                                     task_metric_sums)


def _model_task(model) -> str:
    """Task follows the model head: log_softmax ⇒ classification, linear ⇒
    regression (reference trains node_reg through the same runners,
    ``run.py:508``)."""
    return "classification" if getattr(model, "classify", True) \
        else "regression"


def create_dist_state(model: DistNodeModel, rng, sg: ShardedGraph,
                      lr=0.01, weight_decay=5e-4) -> TrainState:
    """Init params on shard 0's block (shapes are shard-local).

    The model's collectives need the mesh axis bound, so init runs under a
    size-1 vmap carrying the axis name (an all_gather over it is a no-op)."""
    params = jax.vmap(
        lambda xb, sb, rb, wb: model.init(rng, xb, sb, rb, wb),
        axis_name=model.axis_name,
    )(sg.x[:1], sg.senders[:1], sg.receivers[:1], sg.edge_weight[:1])
    params = jax.tree_util.tree_map(lambda a: a[0], params)
    return TrainState.create(apply_fn=model.apply, params=params,
                             tx=adam_l2(lr, weight_decay))


def _local_loss(apply_fn, params, xb, sb, rb, wb, yb, mb, rng, train,
                task: str = "classification"):
    out = apply_fn(params, xb, sb, rb, wb, train=train,
                   **({"rngs": {"dropout": rng}} if train else {}))
    local_sum, local_cnt = task_loss_sums(task, out, yb, mb)
    return out, local_sum, local_cnt


def make_dist_train_step(mesh: Mesh, model: DistNodeModel):
    """Returns a jitted (state, sharded_graph, rng) -> (state, loss) step."""
    spec = ShardedGraph(
        x=P(DATA_AXIS), senders=P(DATA_AXIS), receivers=P(DATA_AXIS),
        edge_weight=P(DATA_AXIS), y=P(DATA_AXIS), train_mask=P(DATA_AXIS),
        val_mask=P(DATA_AXIS), test_mask=P(DATA_AXIS))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), spec, P()),
        out_specs=(P(), P()),
        check_vma=False)
    def step(state: TrainState, sg: ShardedGraph, rng):
        # inside: leading shard axis of size 1 — squeeze it
        xb = sg.x[0]
        sb, rb, wb = sg.senders[0], sg.receivers[0], sg.edge_weight[0]
        yb, mb = sg.y[0], sg.train_mask[0]

        def loss_fn(params):
            _, local_sum, local_cnt = _local_loss(
                state.apply_fn, params, xb, sb, rb, wb, yb, mb, rng, True,
                _model_task(model))
            global_cnt = jax.lax.psum(local_cnt, DATA_AXIS)
            # per-device partial of the global mean; summed via grad psum
            return local_sum / jnp.maximum(global_cnt, 1.0)

        local_loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grads = jax.lax.psum(grads, DATA_AXIS)
        loss = jax.lax.psum(local_loss, DATA_AXIS)
        new_state = state.apply_gradients(grads=grads)
        return new_state, loss

    return jax.jit(step)


def make_halo_train_step(mesh: Mesh, model, plan):
    """Train step over the boundary-exchange plan (DistNodeModelHalo):
    identical loss/grad semantics to ``make_dist_train_step`` but the
    per-layer collective moves only boundary rows."""
    from fitgnn_tpu.parallel.halo import HaloPlan

    plan_spec = HaloPlan(
        send_idx=P(DATA_AXIS), send_mask=P(DATA_AXIS),
        senders_ext=P(DATA_AXIS), receivers=P(DATA_AXIS),
        edge_weight=P(DATA_AXIS))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), plan_spec,
                  P()),
        out_specs=(P(), P()),
        check_vma=False)
    def step(state: TrainState, xb, yb, mb, plan_b: HaloPlan, rng):
        x = xb[0]
        y, m = yb[0], mb[0]

        def loss_fn(params):
            # model.apply, not state.apply_fn: the state may have been
            # created for the all-gather model (param trees interchange)
            out = model.apply(
                params, x, plan_b.senders_ext[0], plan_b.receivers[0],
                plan_b.edge_weight[0], plan_b.send_idx[0],
                plan_b.send_mask[0], train=True, rngs={"dropout": rng})
            local_sum, local_cnt = task_loss_sums(_model_task(model),
                                                  out, y, m)
            global_cnt = jax.lax.psum(local_cnt, DATA_AXIS)
            return local_sum / jnp.maximum(global_cnt, 1.0)

        local_loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grads = jax.lax.psum(grads, DATA_AXIS)
        loss = jax.lax.psum(local_loss, DATA_AXIS)
        return state.apply_gradients(grads=grads), loss

    return jax.jit(step)


def make_dist_eval_step(mesh: Mesh, model: DistNodeModel, split: str = "test"):
    spec = ShardedGraph(
        x=P(DATA_AXIS), senders=P(DATA_AXIS), receivers=P(DATA_AXIS),
        edge_weight=P(DATA_AXIS), y=P(DATA_AXIS), train_mask=P(DATA_AXIS),
        val_mask=P(DATA_AXIS), test_mask=P(DATA_AXIS))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), spec),
        out_specs=(P(), P()),
        check_vma=False)
    def step(state: TrainState, sg: ShardedGraph):
        xb = sg.x[0]
        sb, rb, wb = sg.senders[0], sg.receivers[0], sg.edge_weight[0]
        yb = sg.y[0]
        mb = (sg.val_mask if split == "val" else sg.test_mask)[0]
        out = state.apply_fn(state.params, xb, sb, rb, wb)
        task = _model_task(model)
        ls, c = task_loss_sums(task, out, yb, mb)
        ms, ys, y2s = task_metric_sums(task, out, yb, mb)
        ls, c, ms, ys, y2s = jax.lax.psum((ls, c, ms, ys, y2s), DATA_AXIS)
        metric = task_metric_from_sums(task, ls, c, ms, ys, y2s)
        return ls / jnp.maximum(c, 1.0), metric

    return jax.jit(step)
