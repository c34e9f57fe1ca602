"""Multi-host pod-slice scaffolding.

Single-host multi-chip runs use ``make_mesh`` directly.  On a pod slice, call
``initialize_distributed()`` once per process before any JAX computation;
the data axis then spans every chip of every host.  Community→host placement
(``placement_by_community``) maps Leiden communities onto hosts so halo
traffic inside a community rides ICI and only summary/cut traffic crosses
DCN — the distributed realization of the reference's community proxy
(SURVEY §2.4).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with explicit or env-provided topology.
    Safe to call on single-process setups (no-op without coordinator)."""
    if coordinator_address is None and num_processes in (None, 1):
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def placement_by_community(labels: np.ndarray, num_shards: int,
                           shards_per_host: int = 1
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy balanced assignment of communities to shards (LPT bin packing),
    communities sorted large-first; returns (node_order, shard_of_node).

    ``node_order`` permutes nodes so each shard's nodes are contiguous (the
    layout ``parallel.shard.shard_graph`` expects via its ``order`` arg);
    whole communities never straddle hosts when
    ``num_shards % shards_per_host == 0`` and community sizes fit.
    """
    comms, counts = np.unique(labels, return_counts=True)
    order = np.argsort(-counts, kind="stable")
    load = np.zeros(num_shards, dtype=np.int64)
    comm_shard = np.empty(len(comms), dtype=np.int64)
    for ci in order:
        s = int(np.argmin(load))
        comm_shard[ci] = s
        load[s] += counts[ci]

    comm_index = {c: i for i, c in enumerate(comms)}
    shard_of_node = np.array([comm_shard[comm_index[c]] for c in labels],
                             dtype=np.int64)
    node_order = np.argsort(shard_of_node, kind="stable")
    return node_order, shard_of_node
