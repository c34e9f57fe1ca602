"""Boundary-only halo exchange for sharded message passing.

The v1 distributed layer all-gathers every shard's hidden activations
(N_global·F bytes over ICI per layer).  With community placement, only a
small boundary crosses shards, so this module exchanges exactly those rows:

* host-side (``build_halo_plan``): for each ordered shard pair (p→q), the
  list of p-local rows that q's edges reference, padded to the max pair
  size K; each edge's sender is remapped to an index into
  ``concat([local rows, received halo rows])``;
* device-side (``halo_exchange``): one ``all_to_all`` of an (P, K, F) send
  buffer inside ``shard_map`` — bytes moved drop from N_global·F to P·K·F
  with K = max boundary per pair (≪ N_global/P for community-placed graphs).

This is the array analog of the reference's ``extra_node`` 1-hop halo
(``utils.py:235-239``) promoted to a collective (SURVEY §2.4).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class HaloPlan(NamedTuple):
    """Static exchange plan. P = shards, K = padded per-pair row count."""

    send_idx: jnp.ndarray      # (P, P, K) local row ids shard p sends to q
                               #   (padded with 0; masked by send_mask)
    send_mask: jnp.ndarray     # (P, P, K) bool
    # per-shard edge tables with senders remapped into [0, n_loc + P*K):
    senders_ext: jnp.ndarray   # (P, E_loc) index into concat(local, halo)
    receivers: jnp.ndarray     # (P, E_loc) local
    edge_weight: jnp.ndarray   # (P, E_loc)

    @property
    def k(self) -> int:
        return self.send_idx.shape[-1]


def build_halo_plan(senders_global: np.ndarray, receivers_local: np.ndarray,
                    edge_weight: np.ndarray, num_shards: int,
                    nodes_per_shard: int, pad_to: int = 8) -> HaloPlan:
    """From a ``ShardedGraph``-style layout (per-shard edges with GLOBAL
    senders, LOCAL receivers) build the exchange plan."""
    P, E = senders_global.shape
    n_loc = nodes_per_shard
    s = np.asarray(senders_global, dtype=np.int64)

    # unique remote rows each shard q needs from each owner p
    need = [[None] * P for _ in range(P)]   # need[q][p] = local rows of p
    for q in range(P):
        owner = s[q] // n_loc
        for p in range(P):
            if p == q:
                continue
            rows = np.unique(s[q][owner == p]) % n_loc
            need[q][p] = rows
    k = max((len(need[q][p]) for q in range(P) for p in range(P)
             if p != q), default=1)
    k = max(((k + pad_to - 1) // pad_to) * pad_to, pad_to)

    send_idx = np.zeros((P, P, k), dtype=np.int32)
    send_mask = np.zeros((P, P, k), dtype=bool)
    for p in range(P):
        for q in range(P):
            if p == q:
                continue
            rows = need[q][p]
            send_idx[p, q, : len(rows)] = rows
            send_mask[p, q, : len(rows)] = True

    # remap each shard's senders: local stay [0, n_loc); remote become
    # n_loc + p*k + position_in_need[q][p]
    senders_ext = np.zeros((P, E), dtype=np.int32)
    for q in range(P):
        owner = s[q] // n_loc
        local_pos = s[q] % n_loc
        ext = np.asarray(local_pos, dtype=np.int64).copy()
        for p in range(P):
            if p == q:
                continue
            sel = owner == p
            if not sel.any():
                continue
            pos = np.searchsorted(need[q][p], local_pos[sel])
            ext[sel] = n_loc + p * k + pos
        senders_ext[q] = ext

    return HaloPlan(
        send_idx=jnp.asarray(send_idx),
        send_mask=jnp.asarray(send_mask),
        senders_ext=jnp.asarray(senders_ext),
        receivers=jnp.asarray(receivers_local, dtype=jnp.int32),
        edge_weight=jnp.asarray(edge_weight))


def halo_exchange(h_local: jnp.ndarray, send_idx: jnp.ndarray,
                  send_mask: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Inside shard_map: return the (P·K, F) halo table of remote rows.

    ``send_idx``/``send_mask``: this shard's (P, K) slices.
    Slot p*K+j holds row j this device received FROM shard p (zero where the
    mask is False — padding slots are never referenced by senders_ext).
    """
    buf = h_local[send_idx] * send_mask[..., None].astype(h_local.dtype)
    # all_to_all: split axis 0 (destination shard), concat received along it
    recv = jax.lax.all_to_all(buf, axis_name, split_axis=0, concat_axis=0,
                              tiled=True)
    return recv.reshape(-1, h_local.shape[-1])
