"""Auto-config planner: pick the hybrid-operator / pipeline knobs from the
graph's structure instead of hand-tuned folklore (VERDICT r4 ask #7).

The champion configs of rounds 2-4 (tile threshold 48 for exact GCN, 192
under the cluster collapse, 32 for exact GAT, K=2048, block=128, bucket
caps, chunk budgets) were discovered by on-chip A/B sweeps and then
hard-coded in env knobs and flagship flags.  This module re-derives them
per graph from an ingest-time cost model:

    cost(threshold) = a · T(threshold) + b · E_coo(threshold) + cluster terms

where T/E_coo come from the graph's 128x128 tile-occupancy histogram (one
``np.unique`` pass) and the per-structure rates a, b are CALIBRATED FROM
THE MEASURED SWEEPS (PERFORMANCE.md):

* dense tile, block=128, bf16, fwd+bwd     a ≈ 2.2 µs/tile
  (off-diag BSR fwd 1.29 ms / 1737 tiles at F=512, ~3 passes per train
  step — PERFORMANCE.md round-3 corrected rates table)
* exact straggler edge (gather+scatter + transpose pair in the backward)
  b ≈ 34 ns/edge for static semantics — closes the measured 13.6 ms
  GCN champion at T=2192, E=233k; per-edge ATTENTION costs more
  (scores, two exps, denominator scatter): b_att ≈ 95 ns/edge, closing
  the measured 46.1 ms at E≈210k
* collapsed straggler edges ride one (N, C) @ (C, F) MXU matmul:
  b_cl ≈ 2 ns/edge + the table cost c · N·C (c ≈ 0.06 µs per 128 table
  columns per 128 rows — bandwidth of the (N, C) read)

The implied exact-mode optimum a/b ≈ 65 edges/tile lands the planner on
threshold 48-96 for the bench graph (measured champion t48, flat to t96);
under the collapse b_cl ≈ 0 pushes it to the 192 plateau (measured
champion t192, flat beyond); for exact GAT a/b_att ≈ 23 lands 16-32
(measured champion t16-t32 plateau).  The planner's test set IS this set
of measured champions (tests/test_planner.py).

Pipeline knobs follow the round-4 operational findings:

* ``max_buckets``: every extra size bucket adds MB-train + eval
  executables that must co-reside on the chip; at products scale (>50k
  subgraphs) the tunnel worker holds ~2 buckets reliably (round-4
  flagship), below that the waste-aware merge default of 5 is safe.
* ``chunk_budget``: (chunk, E_pad, hidden) message buffers; 1<<28
  elements measured to crash the remote worker at >1M-node scale, 1<<26
  holds — scale down when the padded graph is products-sized.
"""

from __future__ import annotations

import dataclasses

import numpy as np

BLOCK = 128
# calibrated per-structure rates (seconds) — see module docstring
COST_TILE = 2.2e-6
COST_EDGE_STATIC = 34e-9
COST_EDGE_ATT = 95e-9
COST_EDGE_COLLAPSED = 2e-9
COST_TABLE_COL = 0.06e-6 / 128       # per (128-row, 1-col) slab of (N, C)

THRESHOLD_CANDIDATES = (8, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384)


@dataclasses.dataclass
class PlanConfig:
    min_block_edges: int             # hybrid tile threshold
    block: int = BLOCK               # 256 measured slower end-to-end
    cluster_k: int = 0               # collapse cluster size (0 = exact)
    dense_cutoff: int = 512          # Gs dense-adjacency branch (measured)
    max_buckets: int = 0             # 0 = pipeline default
    chunk_budget: int = 1 << 28      # MB/eval chunk element budget
    predicted_ms: float = 0.0        # cost-model estimate for the choice
    alternatives: dict = dataclasses.field(default_factory=dict)


def tile_histogram(senders: np.ndarray, receivers: np.ndarray,
                   num_nodes_padded: int, block: int = BLOCK) -> np.ndarray:
    """Sorted per-tile edge counts (descending) for the 128x128 grid."""
    nb = num_nodes_padded // block
    tile = (np.asarray(receivers, np.int64) // block) * nb \
        + (np.asarray(senders, np.int64) // block)
    _, counts = np.unique(tile, return_counts=True)
    return np.sort(counts)[::-1]


def predict_cost_ms(counts_desc: np.ndarray, threshold: int,
                    attention: bool, cluster_k: int,
                    num_nodes_padded: int) -> float:
    """Cost-model step time (ms) for one hybrid split choice."""
    dense = counts_desc >= threshold
    n_tiles = int(dense.sum())
    e_coo = int(counts_desc[~dense].sum())
    cost = COST_TILE * n_tiles
    if cluster_k:
        c_cols = num_nodes_padded // cluster_k
        cost += COST_EDGE_COLLAPSED * e_coo
        cost += COST_TABLE_COL * (num_nodes_padded / 128) * c_cols
    else:
        cost += (COST_EDGE_ATT if attention else COST_EDGE_STATIC) * e_coo
    return cost * 1e3


def plan_config(senders: np.ndarray, receivers: np.ndarray,
                num_nodes_padded: int, layer_name: str = "GCNConv",
                cluster: int = 0, num_subgraphs: int = 0,
                hidden: int = 512) -> PlanConfig:
    """Pick {tile threshold, block, K, bucket cap, chunk budget} for one
    graph.  ``cluster`` > 0 requests the collapse (value = suggested K;
    snapped to a divisor of the padded node count)."""
    attention = layer_name == "GATConv"
    counts = tile_histogram(senders, receivers, num_nodes_padded)

    k = 0
    if cluster:
        k = int(cluster)
        if num_nodes_padded % k:
            divs = [128 * d for d in range(1, num_nodes_padded // 128 + 1)
                    if (num_nodes_padded // 128) % d == 0 and 128 * d <= k]
            k = max(divs) if divs else 128
    alts = {t: predict_cost_ms(counts, t, attention, k, num_nodes_padded)
            for t in THRESHOLD_CANDIDATES}
    best_cost = min(alts.values())
    # flat cost regions are common (community tiles sit far above every
    # candidate, scattered tiles far below): within the 2% plateau,
    # tie-break toward the measured on-chip champion for the mode
    prior = 192 if k else (32 if attention else 48)
    plateau = [t for t, c in alts.items() if c <= best_cost * 1.02 + 1e-12]
    best_t = min(plateau, key=lambda t: abs(t - prior))

    n_big = num_nodes_padded >= 1_000_000 or num_subgraphs >= 50_000
    return PlanConfig(
        min_block_edges=best_t,
        cluster_k=k,
        max_buckets=2 if n_big else 0,
        chunk_budget=(1 << 26) if n_big else (1 << 28),
        predicted_ms=alts[best_t],
        alternatives=alts)
