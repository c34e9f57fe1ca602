"""Masked losses and metrics (device-side, jit-friendly).

Replace the reference's torch losses + streaming numpy evaluators
(``NLLLoss_numpy``/``L1Loss_numpy``, ``utils.py:910-988``): instead of
shipping activations to host per subgraph, masked reductions run on device
across the whole padded batch and only the scalars come back.
Regression losses are normalized by std(labels) like the reference
(``run.py:110,168,210``).
"""

from __future__ import annotations

import jax.numpy as jnp


def _pick_label_logprob(log_probs: jnp.ndarray,
                        labels: jnp.ndarray) -> jnp.ndarray:
    """``log_probs[..., labels]`` per row WITHOUT a gather: take_along_axis
    lowers to a row-rate-bound TPU gather (and its VJP to a scatter) — a
    one-hot select is a pure vector op with an elementwise gradient.
    ``where`` (not multiply) so non-selected ``-inf`` rows can't make NaN."""
    classes = log_probs.shape[-1]
    onehot = (labels[..., None].astype(jnp.int32)
              == jnp.arange(classes, dtype=jnp.int32))
    return jnp.sum(jnp.where(onehot, log_probs, 0), axis=-1)


def masked_nll(log_probs: jnp.ndarray, labels: jnp.ndarray,
               mask: jnp.ndarray, reduction: str = "mean") -> jnp.ndarray:
    """Negative log-likelihood over masked rows ('mean' or 'sum' — the
    reference's ``--loss_reduction``).
    ``log_probs``: (..., C); ``labels``: (...,) int; ``mask``: (...,) bool."""
    picked = _pick_label_logprob(log_probs, labels)
    m = mask.astype(log_probs.dtype)
    total = jnp.sum(-picked * m)
    if reduction == "sum":
        return total
    count = jnp.maximum(jnp.sum(m), 1.0)
    return total / count


def masked_l1(pred: jnp.ndarray, target: jnp.ndarray,
              mask: jnp.ndarray, reduction: str = "mean") -> jnp.ndarray:
    """Absolute error over masked rows (pred squeezed to target shape)."""
    pred = pred.reshape(target.shape)
    m = mask.astype(pred.dtype)
    total = jnp.sum(jnp.abs(pred - target) * m)
    if reduction == "sum":
        return total
    count = jnp.maximum(jnp.sum(m), 1.0)
    return total / count


def masked_l1_std_normalized(pred, target, mask):
    """L1 / std(target over mask) — the reference's regression metric."""
    l1 = masked_l1(pred, target, mask)
    m = mask.astype(pred.dtype)
    count = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(target * m) / count
    var = jnp.sum(((target - mean) ** 2) * m) / count
    return l1 / jnp.maximum(jnp.sqrt(var), 1e-12)


def masked_nll_sum(log_probs, labels, mask):
    """(Σ masked NLL, masked count) — for accumulating across buckets."""
    picked = _pick_label_logprob(log_probs, labels)
    m = mask.astype(log_probs.dtype)
    return jnp.sum(-picked * m), jnp.sum(m)


def masked_l1_sum(pred, target, mask):
    pred = pred.reshape(target.shape)
    m = mask.astype(pred.dtype)
    return jnp.sum(jnp.abs(pred - target) * m), jnp.sum(m)


def task_loss_sums(task: str, out, y, mask):
    """(Σ masked loss, masked count) for either task — the per-shard
    partial of the global masked-mean loss every distributed step psums
    (NLL for classification, L1 for regression; reference ``run.py:508``
    trains node_reg through the same runners as node_cls)."""
    if task == "classification":
        return masked_nll_sum(out, y, mask)
    return masked_l1_sum(out, y, mask)


def task_metric_sums(task: str, out, y, mask):
    """Per-shard partials of the global eval metric, to be psum'd:
    ``(metric_sum, y_sum, y2_sum)``.  Classification: metric_sum = correct
    count (y moments unused, zero).  Regression: the metric is the
    reference's std-normalized L1 (``run.py:110,168``) whose std must use
    the GLOBAL masked target moments — so ship Σm·y and Σm·y²."""
    if task == "classification":
        corr, _ = masked_correct_sum(out, y, mask)
        return corr, jnp.zeros(()), jnp.zeros(())
    m = mask.astype(out.dtype)
    return jnp.zeros(()), jnp.sum(y * m), jnp.sum((y ** 2) * m)


def task_metric_from_sums(task: str, loss_sum, count, metric_sum, y_sum,
                          y2_sum):
    """Finish the global metric from psum'd partials.  Classification:
    accuracy.  Regression: std-normalized L1 over the global mask."""
    count = jnp.maximum(count, 1.0)
    if task == "classification":
        return metric_sum / count
    mean = y_sum / count
    std = jnp.sqrt(jnp.maximum(y2_sum / count - mean ** 2, 0.0))
    return (loss_sum / count) / jnp.maximum(std, 1e-12)


def masked_correct_sum(log_probs, labels, mask):
    pred = jnp.argmax(log_probs, axis=-1)
    m = mask.astype(jnp.float32)
    return jnp.sum((pred == labels).astype(jnp.float32) * m), jnp.sum(m)


def masked_accuracy(log_probs: jnp.ndarray, labels: jnp.ndarray,
                    mask: jnp.ndarray) -> jnp.ndarray:
    pred = jnp.argmax(log_probs, axis=-1)
    m = mask.astype(jnp.float32)
    correct = jnp.sum((pred == labels).astype(jnp.float32) * m)
    return correct / jnp.maximum(jnp.sum(m), 1.0)
