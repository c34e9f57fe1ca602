"""Segment reduction primitives for edge→node aggregation.

These are the TPU-native replacement for the reference's ``torch_scatter``
scatter-add/SpMM calls that sit inside every PyG conv (reference
``network.py:13-21`` via ``torch_geometric.nn``).  All take sorted segment ids
(edges sorted by receiver) and a static ``num_segments`` so XLA compiles a
single fused scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e30


def take_rows(a: jnp.ndarray, idx: jnp.ndarray,
              sorted_idx: bool = False) -> jnp.ndarray:
    """Row gather with the fast index mode.

    Plain ``a[idx]`` lowers with FILL_OR_DROP out-of-bounds guards that
    cost 4-10× on TPU (measured 86 ns/row plain vs 8-13 ns/row guard-free
    at n=169k, F=128 — ``scripts/gather_mode_micro.py``).  All edge lists
    here are constructed in-bounds, so use ``clip`` (the fastest measured
    mode; clamping never triggers)."""
    return a.at[idx].get(mode="clip", indices_are_sorted=sorted_idx)


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                indices_are_sorted: bool = True) -> jnp.ndarray:
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)


def segment_mean(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                 mask: jnp.ndarray | None = None,
                 indices_are_sorted: bool = True) -> jnp.ndarray:
    """Mean over each segment; ``mask`` excludes padding edges from the count."""
    if mask is not None:
        m = mask.astype(data.dtype)
        data = data * m.reshape(m.shape + (1,) * (data.ndim - 1))
        counts = jax.ops.segment_sum(m, segment_ids, num_segments=num_segments,
                                     indices_are_sorted=indices_are_sorted)
    else:
        counts = jax.ops.segment_sum(
            jnp.ones(segment_ids.shape[0], dtype=data.dtype), segment_ids,
            num_segments=num_segments, indices_are_sorted=indices_are_sorted)
    total = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments,
                                indices_are_sorted=indices_are_sorted)
    counts = jnp.maximum(counts, 1.0)
    return total / counts.reshape(counts.shape + (1,) * (data.ndim - 1))


def segment_max(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                mask: jnp.ndarray | None = None,
                indices_are_sorted: bool = True) -> jnp.ndarray:
    """Max over each segment (−inf-filled empty segments become 0)."""
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (data.ndim - 1))
        data = jnp.where(m, data, _NEG)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments,
                              indices_are_sorted=indices_are_sorted)
    return jnp.where(out <= _NEG / 2, 0.0, out)


def segment_softmax(logits: jnp.ndarray, segment_ids: jnp.ndarray,
                    num_segments: int, mask: jnp.ndarray | None = None,
                    indices_are_sorted: bool = True) -> jnp.ndarray:
    """Numerically stable softmax over each segment (e.g. GAT attention).

    ``logits``: (E,) or (E, H). Returns same shape; masked entries get 0.
    """
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (logits.ndim - 1))
        logits = jnp.where(m, logits, _NEG)
    seg_max = jax.ops.segment_max(logits, segment_ids, num_segments=num_segments,
                                  indices_are_sorted=indices_are_sorted)
    seg_max = jnp.where(seg_max <= _NEG / 2, 0.0, seg_max)
    shifted = logits - seg_max[segment_ids]
    exp = jnp.exp(shifted)
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (logits.ndim - 1))
        exp = jnp.where(m, exp, 0.0)
    denom = jax.ops.segment_sum(exp, segment_ids, num_segments=num_segments,
                                indices_are_sorted=indices_are_sorted)
    denom = jnp.maximum(denom, 1e-16)
    return exp / denom[segment_ids]
