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
    masked_correct_sum, masked_l1_sum, masked_nll_sum, task_loss_sums,
    task_metric_from_sums, task_metric_sums,
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
        s_tot, c_tot, m_tot, y_tot, y2_tot = 0.0, 0.0, 0.0, 0.0, 0.0
        for b in batches:
            mask = b.val_mask if split == "val" else b.test_mask
            out = _vmapped_out(state.apply_fn, state.params, b, False, None)
            s, c = task_loss_sums(task, out, b.y, mask)
            ms, ys, y2s = task_metric_sums(task, out, b.y, mask)
            s_tot += s
            c_tot += c
            m_tot += ms
            y_tot += ys
            y2_tot += y2s
        s_tot, c_tot, m_tot, y_tot, y2_tot = jax.lax.psum(
            (s_tot, c_tot, m_tot, y_tot, y2_tot), DATA_AXIS)
        metric = task_metric_from_sums(task, s_tot, c_tot, m_tot, y_tot,
                                       y2_tot)
        return s_tot / jnp.maximum(c_tot, 1.0), metric

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
        s, c = task_loss_sums(task, out, batch.y, mask)
        ms, ys, y2s = task_metric_sums(task, out, batch.y, mask)
        s, c, ms, ys, y2s = jax.lax.psum((s, c, ms, ys, y2s), DATA_AXIS)
        metric = task_metric_from_sums(task, s, c, ms, ys, y2s)
        return s / jnp.maximum(c, 1.0), metric

    return jax.jit(step)


def make_dist_gs_train_epoch_mb(mesh: Mesh, examples,
                                task: str = "classification",
                                batch_size: int = 128):
    """MB gradient mode over the subgraph axis — the reference's second
    gradient regime (``node_train_Gs_MB``, ``run.py:217``) distributed: one
    optimizer step per global chunk of ``batch_size`` subgraphs, each chunk
    split across the mesh with psum-reduced grads, so every device applies
    the identical update (one psum pair per minibatch).

    Chunk membership is block-strided — device ``d`` holds subgraphs
    ``[d·S/P, (d+1)·S/P)`` of the padded batch and contributes its ``k``-th
    local slice to global chunk ``k`` — a deterministic regrouping of the
    reference's sequential DataLoader chunks (MB is stochastic in chunk
    composition anyway; GD equivalence when ``batch_size`` covers the whole
    batch is gated by tests).  Chunks with no train node on ANY device
    leave the state untouched (the reference ``continue``s them).

    Returns ``step(state, batches, rng) -> (state, Σ chunk losses)`` for
    ``batches`` sharded like the examples (tuple of size-bucketed
    SubgraphBatch, subgraph axis padded to a shard multiple)."""
    examples = tuple(examples)
    spec = jax.tree_util.tree_map(lambda _: P(DATA_AXIS), examples)
    num_devices = mesh.devices.size
    bs_local = max(1, -(-batch_size // num_devices))

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(), spec, P()),
                       out_specs=(P(), P()),
                       check_vma=False)
    def step(state: TrainState, batches, rng):
        from fitgnn_tpu.train.steps import chunk_pad
        total = 0.0
        for bi, b in enumerate(batches):
            cb, n_chunks = chunk_pad(b, bs_local)

            def body(st, inp):
                chunk, r = inp

                def loss(params):
                    out = _vmapped_out(st.apply_fn, params, chunk, True, r)
                    s, c = task_loss_sums(task, out, chunk.y,
                                          chunk.train_mask)
                    gc = jax.lax.psum(c, DATA_AXIS)
                    return s / jnp.maximum(gc, 1.0), gc

                (val, gc), grads = jax.value_and_grad(
                    loss, has_aux=True)(st.params)
                grads = jax.lax.psum(grads, DATA_AXIS)
                loss_g = jax.lax.psum(val, DATA_AXIS)
                has_train = gc > 0
                new_st = st.apply_gradients(grads=grads)
                st = jax.tree_util.tree_map(
                    lambda a, o: jnp.where(has_train, a, o), new_st, st)
                return st, jnp.where(has_train, loss_g, 0.0)

            rngs = jax.random.split(jax.random.fold_in(rng, bi), n_chunks)
            state, losses = jax.lax.scan(body, state, (cb, rngs))
            total = total + jnp.sum(losses)
        return state, total

    return jax.jit(step)
