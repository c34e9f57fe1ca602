"""Data-parallel training over the subgraph axis.

The reference streams subgraphs sequentially on one device
(``run.py:177-253``); here the padded ``SubgraphBatch`` is sharded over the
mesh along the subgraph axis — each device runs the conv stack on its slice
and gradients are psum-reduced.  This distributes the FIT-GNN Gs phase
itself (complementing ``dist_train.py``'s sharded full-graph path): the GD
step is numerically identical to the single-device
``gs_train_step_gd`` because the loss is the global masked mean.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from fitgnn_tpu.graph.container import SubgraphBatch
from fitgnn_tpu.parallel.mesh import DATA_AXIS
from fitgnn_tpu.train.steps import TrainState, _vmapped_out
from fitgnn_tpu.train.losses import (
    masked_correct_sum, masked_l1_sum, masked_nll_sum,
)


def pad_batch_to_shards(batch: SubgraphBatch, num_shards: int
                        ) -> SubgraphBatch:
    """Pad the subgraph axis to a multiple of the device count (padding
    subgraphs carry empty masks, so they contribute nothing)."""
    s = batch.num_subgraphs
    target = -(-s // num_shards) * num_shards
    pad = target - s
    if pad == 0:
        return batch

    def pad0(a):
        if a is None:
            return None
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths)

    return jax.tree_util.tree_map(pad0, batch)


def make_dist_gs_train_step(mesh: Mesh, example: SubgraphBatch,
                            task: str = "classification"):
    """(state, sharded SubgraphBatch, rng) → (state, loss); GD semantics.
    ``example`` fixes the spec tree (None fields stay unsharded-absent)."""
    spec = jax.tree_util.tree_map(lambda _: P(DATA_AXIS), example)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(), spec, P()),
                       out_specs=(P(), P()),
                       check_vma=False)
    def step(state: TrainState, batch: SubgraphBatch, rng):
        def loss_fn(params):
            out = _vmapped_out(state.apply_fn, params, batch, True, rng)
            if task == "classification":
                s, c = masked_nll_sum(out, batch.y, batch.train_mask)
            else:
                s, c = masked_l1_sum(out, batch.y, batch.train_mask)
            gc = jax.lax.psum(c, DATA_AXIS)
            return s / jnp.maximum(gc, 1.0)

        local_loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grads = jax.lax.psum(grads, DATA_AXIS)
        loss = jax.lax.psum(local_loss, DATA_AXIS)
        return state.apply_gradients(grads=grads), loss

    return jax.jit(step)


def make_dist_gs_train_step_multi(mesh: Mesh, examples,
                                  task: str = "classification"):
    """GD step over size-bucketed batches, subgraph-axis sharded: the
    distributed analog of ``gs_train_step_gd_multi`` — one update from the
    masked mean across every bucket's train nodes on every shard."""
    examples = tuple(examples)
    spec = jax.tree_util.tree_map(lambda _: P(DATA_AXIS), examples)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(), spec, P()),
                       out_specs=(P(), P()),
                       check_vma=False)
    def step(state: TrainState, batches, rng):
        def loss_fn(params):
            total, count = 0.0, 0.0
            for i, b in enumerate(batches):
                out = _vmapped_out(state.apply_fn, params, b, True,
                                   jax.random.fold_in(rng, i))
                if task == "classification":
                    s, c = masked_nll_sum(out, b.y, b.train_mask)
                else:
                    s, c = masked_l1_sum(out, b.y, b.train_mask)
                total = total + s
                count = count + c
            gc = jax.lax.psum(count, DATA_AXIS)
            return total / jnp.maximum(gc, 1.0)

        local_loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grads = jax.lax.psum(grads, DATA_AXIS)
        loss = jax.lax.psum(local_loss, DATA_AXIS)
        return state.apply_gradients(grads=grads), loss

    return jax.jit(step)


def make_dist_gs_eval_step_multi(mesh: Mesh, examples,
                                 task: str = "classification",
                                 split: str = "test"):
    examples = tuple(examples)
    spec = jax.tree_util.tree_map(lambda _: P(DATA_AXIS), examples)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(), spec),
                       out_specs=(P(), P()),
                       check_vma=False)
    def step(state: TrainState, batches):
        s_tot, c_tot, corr_tot = 0.0, 0.0, 0.0
        for b in batches:
            mask = b.val_mask if split == "val" else b.test_mask
            out = _vmapped_out(state.apply_fn, state.params, b, False, None)
            if task == "classification":
                s, c = masked_nll_sum(out, b.y, mask)
                corr, _ = masked_correct_sum(out, b.y, mask)
            else:
                s, c = masked_l1_sum(out, b.y, mask)
                corr = s
            s_tot += s
            c_tot += c
            corr_tot += corr
        s_tot = jax.lax.psum(s_tot, DATA_AXIS)
        c_tot = jnp.maximum(jax.lax.psum(c_tot, DATA_AXIS), 1.0)
        corr_tot = jax.lax.psum(corr_tot, DATA_AXIS)
        return s_tot / c_tot, corr_tot / c_tot

    return jax.jit(step)


def make_dist_gs_eval_step(mesh: Mesh, example: SubgraphBatch,
                           task: str = "classification",
                           split: str = "test"):
    spec = jax.tree_util.tree_map(lambda _: P(DATA_AXIS), example)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(), spec),
                       out_specs=(P(), P()),
                       check_vma=False)
    def step(state: TrainState, batch: SubgraphBatch):
        mask = batch.val_mask if split == "val" else batch.test_mask
        out = _vmapped_out(state.apply_fn, state.params, batch, False, None)
        if task == "classification":
            s, c = masked_nll_sum(out, batch.y, mask)
            corr, _ = masked_correct_sum(out, batch.y, mask)
        else:
            s, c = masked_l1_sum(out, batch.y, mask)
            corr = s
        s = jax.lax.psum(s, DATA_AXIS)
        c = jax.lax.psum(c, DATA_AXIS)
        corr = jax.lax.psum(corr, DATA_AXIS)
        c = jnp.maximum(c, 1.0)
        return s / c, corr / c

    return jax.jit(step)
