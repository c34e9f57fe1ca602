"""SDDMM: sampled dense-dense matmul — per-edge scores from node features.

Used by GAT attention (score per edge from endpoint features).  On TPU the
gather is lane-vectorized by XLA; the contraction over features happens in
registers.  First-party replacement for the implicit SDDMM inside PyG's
``GATConv`` (reference ``network.py:13``).
"""

from __future__ import annotations

import jax.numpy as jnp

from fitgnn_tpu.ops.segment import take_rows


def sddmm_dot(senders: jnp.ndarray, receivers: jnp.ndarray,
              a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """score[e] = <a[send[e]], b[recv[e]]> — (E,) or (E, H) for (N,H,F) input."""
    ga, gb = take_rows(a, senders), take_rows(b, receivers)
    return jnp.sum(ga * gb, axis=-1)


def gather_concat_score(senders, receivers, src_score, dst_score):
    """GAT-style additive score: s[e] = src_score[send[e]] + dst_score[recv[e]].

    ``src_score``/``dst_score``: (N, H) precomputed a_l·Wh / a_r·Wh terms.
    Returns (E, H).
    """
    return take_rows(src_score, senders) + take_rows(dst_score, receivers)
