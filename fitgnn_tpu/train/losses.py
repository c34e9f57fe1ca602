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
