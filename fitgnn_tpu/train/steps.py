"""Jitted train/eval steps for node-level tasks.

TPU-first re-design of the reference's per-epoch loops (``run.py:26-253``):

* Gc phase  — one full-batch jitted step on the coarse graph
  (= ``node_train_Gc``/``node_val_Gc``, ``run.py:26-48``).
* Gs GD     — every subgraph's forward runs in one vmapped jitted step and
  the single optimizer update uses the loss over all consuming train nodes
  (= accumulate-then-step, ``node_train_Gs_GD`` ``run.py:177``; what the
  reference does with a Python loop + per-batch H2D transfers is one
  device-resident batched computation here).
* Gs MB     — ``lax.scan`` over the subgraph axis, one optimizer update per
  subgraph, updates skipped for subgraphs without train nodes
  (= ``node_train_Gs_MB`` ``run.py:217``, which ``continue``s those).
* Gs eval   — vmapped forward; global masked loss/accuracy over all
  consuming split nodes (= streamed ``node_infer_Gs_*`` + numpy losses,
  ``run.py:49-176``).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from fitgnn_tpu.graph.container import Graph, SubgraphBatch
from fitgnn_tpu.train.losses import (
    masked_accuracy, masked_l1, masked_l1_std_normalized, masked_nll,
)


class TrainState(train_state.TrainState):
    pass


def adam_l2(lr: float, weight_decay: float) -> optax.GradientTransformation:
    """torch.optim.Adam(weight_decay=wd) semantics: L2 term enters the
    gradient *before* the Adam moments (not AdamW)."""
    return optax.chain(optax.add_decayed_weights(weight_decay),
                       optax.adam(lr))


def create_state(model, rng, example_x, example_graph, lr=0.01,
                 weight_decay=5e-4) -> TrainState:
    params = model.init(rng, example_x, example_graph)
    return TrainState.create(apply_fn=model.apply, params=params,
                             tx=adam_l2(lr, weight_decay))


def _loss_fn(task: str, reduction: str = "mean"):
    base = masked_nll if task == "classification" else masked_l1
    return functools.partial(base, reduction=reduction)


# ---------------------------------------------------------------------------
# Gc (coarse graph) full-batch steps
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("task", "reduction"))
def gc_train_step(state: TrainState, g: Graph, y, mask, rng, task: str,
                  reduction: str = "mean") -> tuple[TrainState, jnp.ndarray]:
    def loss(params):
        out = state.apply_fn(params, g.x, g, train=True,
                             rngs={"dropout": rng})
        return _loss_fn(task, reduction)(out, y, mask)

    val, grads = jax.value_and_grad(loss)(state.params)
    return state.apply_gradients(grads=grads), val


@functools.partial(jax.jit, static_argnames=("task",))
def gc_eval_step(state: TrainState, g: Graph, y, mask, task: str):
    out = state.apply_fn(state.params, g.x, g)
    loss = _loss_fn(task)(out, y, mask)
    if task == "classification":
        acc = masked_accuracy(out, y, mask)
    else:
        acc = masked_l1_std_normalized(out, y, mask)
    return loss, acc


@functools.partial(jax.jit,
                   static_argnames=("n_epochs", "task", "reduction"))
def gc_train_epochs_scan(state: TrainState, g: Graph, y_train, train_mask,
                         y_val, val_mask, rng, n_epochs: int, task: str,
                         reduction: str = "mean"):
    """The whole Gc phase as ONE program: ``lax.scan`` over epochs with the
    per-epoch val eval and best-val parameter tracking folded into the scan
    carry.  Semantically identical to the per-epoch ``gc_train_step`` +
    ``gc_eval_step`` loop (reference ``run.py:329-375``), but a single
    dispatch — host round-trips (the dominant per-step overhead for
    sub-30 ms steps) are paid once per phase instead of once per epoch.

    Returns ``(state, best_params, best_val, train_losses, val_losses)``
    with per-epoch loss traces for logging."""
    loss_fn = _loss_fn(task, reduction)
    val_loss_fn = _loss_fn(task)

    def epoch(carry, step_rng):
        st, best_params, best_val = carry

        def loss(params):
            out = st.apply_fn(params, g.x, g, train=True,
                              rngs={"dropout": step_rng})
            return loss_fn(out, y_train, train_mask)

        train_loss, grads = jax.value_and_grad(loss)(st.params)
        st = st.apply_gradients(grads=grads)
        out = st.apply_fn(st.params, g.x, g)
        val_loss = val_loss_fn(out, y_val, val_mask)
        improved = val_loss < best_val
        best_params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(improved, new, old),
            st.params, best_params)
        best_val = jnp.where(improved, val_loss, best_val)
        return (st, best_params, best_val), (train_loss, val_loss)

    rngs = jax.random.split(rng, n_epochs)
    init = (state, state.params, jnp.asarray(jnp.inf, dtype=jnp.float32))
    (state, best_params, best_val), (tr, vl) = jax.lax.scan(
        epoch, init, rngs)
    return state, best_params, best_val, tr, vl


# ---------------------------------------------------------------------------
# Gs (subgraph batch) steps
# ---------------------------------------------------------------------------

def _batch_graphs(batch: SubgraphBatch) -> Graph:
    return Graph(x=batch.x, senders=batch.senders, receivers=batch.receivers,
                 edge_weight=batch.edge_weight, n_node=batch.n_node,
                 n_edge=batch.n_edge)


def _vmapped_out(apply_fn, params, batch: SubgraphBatch, train, rng):
    gb = _batch_graphs(batch)
    if train:
        rngs = jax.random.split(rng, batch.num_subgraphs)
        return jax.vmap(
            lambda x, g, r: apply_fn(params, x, g, train=True,
                                     rngs={"dropout": r})
        )(batch.x, gb, rngs)
    return jax.vmap(lambda x, g: apply_fn(params, x, g))(batch.x, gb)


@functools.partial(jax.jit, static_argnames=("task", "reduction"))
def gs_train_step_gd(state: TrainState, batch: SubgraphBatch, rng, task: str,
                     reduction: str = "mean"):
    """Accumulate-all-then-step: one update from the global masked loss."""
    y = batch.y
    mask = batch.train_mask  # already consume-filtered at build time

    def loss(params):
        out = _vmapped_out(state.apply_fn, params, batch, True, rng)
        return _loss_fn(task, reduction)(out, y, mask)

    val, grads = jax.value_and_grad(loss)(state.params)
    return state.apply_gradients(grads=grads), val


def chunk_pad(tree, chunk: int):
    """Pad every leaf's leading (subgraph) axis to a multiple of ``chunk``
    and reshape to ``(k, chunk, ...)``.  Zero padding ⇒ zeroed masks ⇒
    padded subgraphs contribute nothing.  The ONE home of the chunking
    invariant (single-device MB, chunked eval, distributed MB).
    Returns ``(chunked_tree, k)``."""
    size = jax.tree_util.tree_leaves(tree)[0].shape[0]
    k = -(-size // chunk)
    pad = k * chunk - size

    def p(a):
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths).reshape((k, chunk) + a.shape[1:])

    return jax.tree_util.tree_map(p, tree), k


@functools.partial(jax.jit,
                   static_argnames=("task", "batch_size", "reduction"))
def gs_train_epoch_mb(state: TrainState, batch: SubgraphBatch, rng, task: str,
                      batch_size: int = 1, reduction: str = "mean"):
    """Minibatch mode: one optimizer step per chunk of ``batch_size``
    subgraphs (the reference's DataLoader batches, ``run.py:217-253``;
    batch_size=128 there), as a lax.scan over chunks.  Chunks with no train
    nodes leave the state untouched (the reference ``continue``s them)."""
    loss_fn = _loss_fn(task, reduction)
    cb, n_chunks = chunk_pad(batch, batch_size)
    # padding subgraphs get zeroed train masks automatically (jnp.pad)

    def body(st, inp):
        chunk, r = inp          # chunk: SubgraphBatch with leading batch_size
        gb = _batch_graphs(chunk)

        def loss(params):
            rngs = jax.random.split(r, batch_size)
            out = jax.vmap(
                lambda x, g, rr: st.apply_fn(params, x, g, train=True,
                                             rngs={"dropout": rr})
            )(chunk.x, gb, rngs)
            return loss_fn(out, chunk.y, chunk.train_mask)

        val, grads = jax.value_and_grad(loss)(st.params)
        has_train = jnp.sum(chunk.train_mask) > 0
        new_st = st.apply_gradients(grads=grads)
        st = jax.tree_util.tree_map(
            lambda a, b: jnp.where(has_train, a, b), new_st, st)
        return st, jnp.where(has_train, val, 0.0)

    rngs = jax.random.split(rng, n_chunks)
    state, losses = jax.lax.scan(body, state, (cb, rngs))
    return state, jnp.sum(losses)


@functools.partial(jax.jit, static_argnames=("task",))
def gs_train_step_gd_multi(state: TrainState, batches, rng, task: str):
    """GD step over size-bucketed batches (tuple of SubgraphBatch): one
    update from the masked mean across every bucket's train nodes —
    numerically identical to a single-bucket gs_train_step_gd."""
    from fitgnn_tpu.train.losses import masked_l1_sum, masked_nll_sum

    def loss(params):
        total = 0.0
        count = 0.0
        for i, b in enumerate(batches):
            out = _vmapped_out(state.apply_fn, params, b, True,
                               jax.random.fold_in(rng, i))
            if task == "classification":
                s, c = masked_nll_sum(out, b.y, b.train_mask)
            else:
                s, c = masked_l1_sum(out, b.y, b.train_mask)
            total = total + s
            count = count + c
        return total / jnp.maximum(count, 1.0)

    val, grads = jax.value_and_grad(loss)(state.params)
    return state.apply_gradients(grads=grads), val


def _bucket_eval_sums(apply_fn, params, b: SubgraphBatch, task: str,
                      split: str, chunk: int = 0):
    """One bucket's (loss_sum, count, metric_sum, y_sum, y2_sum).

    ``chunk > 0``: lax.scan over subgraph-axis chunks of that size —
    activation memory is bounded by ``chunk × N_pad × hidden`` instead of
    the whole bucket (at products scale the dominant bucket holds ~80k
    subgraphs; a full-bucket vmap materializes tens of GB)."""
    from fitgnn_tpu.train.losses import task_loss_sums, task_metric_sums

    def sums(bi):
        mask = bi.val_mask if split == "val" else bi.test_mask
        out = _vmapped_out(apply_fn, params, bi, False, None)
        s, c = task_loss_sums(task, out, bi.y, mask)
        ms, ys, y2s = task_metric_sums(task, out, bi.y, mask)
        return s, c, ms, ys, y2s

    s_tot = b.num_subgraphs
    if not chunk or s_tot <= chunk:
        return sums(b)
    cb, _ = chunk_pad(b, chunk)

    def body(carry, bi):
        return tuple(c + v for c, v in zip(carry, sums(bi))), None

    zeros = tuple(jnp.zeros(()) for _ in range(5))
    carry, _ = jax.lax.scan(body, zeros, cb)
    return carry


@functools.partial(jax.jit, static_argnames=("task", "split", "chunk"))
def gs_eval_bucket_sums(state: TrainState, b: SubgraphBatch, task: str,
                        split: str = "val", chunk: int = 0):
    """One bucket's psum-style partials as its OWN jitted program.  At
    products scale the monolithic all-buckets eval is one huge executable
    (the remote compiler chokes on it); five small programs compile in
    minutes each and cost only ~ms of extra dispatch.  Combine with
    ``finish_eval_from_sums``."""
    return _bucket_eval_sums(state.apply_fn, state.params, b, task, split,
                             chunk)


def finish_eval_from_sums(task: str, sums):
    """Host-side combine of per-bucket ``gs_eval_bucket_sums`` partials →
    (loss, metric); the metric math lives in ONE place
    (``losses.task_metric_from_sums``)."""
    from fitgnn_tpu.train.losses import task_metric_from_sums

    ls, c, ms, ys, y2s = (sum(float(s[i]) for s in sums) for i in range(5))
    metric = float(task_metric_from_sums(task, ls, c, ms, ys, y2s))
    return ls / max(c, 1.0), metric


@functools.partial(jax.jit, static_argnames=("task", "split", "chunk"))
def gs_eval_step_multi(state: TrainState, batches, task: str,
                       split: str = "val", chunk=0):
    """Masked loss + metric over all buckets' consuming split nodes.
    ``chunk``: see ``_bucket_eval_sums`` (0 = whole-bucket vmap); an int
    applies to every bucket, a tuple gives a per-bucket chunk (edge-heavy
    buckets need smaller chunks for the same activation budget)."""
    chunks = chunk if isinstance(chunk, tuple) else (chunk,) * len(batches)
    loss_s = metric_s = count = 0.0
    y_s = 0.0      # Σ y·m / Σ y²·m across buckets — the std-normalized
    y2_s = 0.0     # regression metric needs GLOBAL target moments
    for b, ck in zip(batches, chunks):
        s, c, ms, ys, y2s = _bucket_eval_sums(state.apply_fn, state.params,
                                              b, task, split, ck)
        loss_s += s
        count += c
        metric_s += ms
        y_s += ys
        y2_s += y2s
    count = jnp.maximum(count, 1.0)
    loss = loss_s / count
    if task == "classification":
        return loss, metric_s / count
    mean = y_s / count
    std = jnp.sqrt(jnp.maximum(y2_s / count - mean ** 2, 0.0))
    return loss, (loss_s / count) / jnp.maximum(std, 1e-12)


@functools.partial(jax.jit, static_argnames=("task", "split"))
def gs_eval_step(state: TrainState, batch: SubgraphBatch, task: str,
                 split: str = "val"):
    """Global masked loss + metric over all subgraphs' consuming split nodes."""
    mask = batch.val_mask if split == "val" else batch.test_mask
    out = _vmapped_out(state.apply_fn, state.params, batch, False, None)
    loss = _loss_fn(task)(out, batch.y, mask)
    if task == "classification":
        metric = masked_accuracy(out, batch.y, mask)
    else:
        # loss stays plain masked L1 (best-val selection), metric is the
        # reference's std-normalized L1 — same split as gc_eval_step
        metric = masked_l1_std_normalized(out, batch.y, mask)
    return loss, metric
