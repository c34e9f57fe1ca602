"""Edge matchings for pairwise contraction.

* ``matching_greedy``  — sort edges by weight desc, take non-conflicting pairs
  until the target reduction is met (reference ``coarsening_utils.py:931-989``
  semantics, vectorized sort + boolean marking).
* ``matching_optimal`` — maximum-weight perfect-ish matching on the negated
  cost; uses networkx's blossom implementation (the reference vendors a
  945-line pure-Python port, ``maxWeightMatching.py``); a first-party C++
  blossom is the planned replacement for large graphs.
"""

from __future__ import annotations

from typing import List

import numpy as np


def matching_greedy(num_nodes: int, edges: np.ndarray, weights: np.ndarray,
                    r: float) -> List[np.ndarray]:
    """Pick heaviest non-conflicting edges until n ≤ (1−r)·N."""
    order = np.argsort(-weights, kind="stable")
    s, t = edges[0][order], edges[1][order]
    marked = np.zeros(num_nodes, dtype=bool)
    matching: List[np.ndarray] = []
    target = int(np.floor(r * num_nodes))
    reduced = 0
    for a, b in zip(s, t):
        if reduced >= target:
            break
        if not marked[a] and not marked[b] and a != b:
            marked[a] = marked[b] = True
            matching.append(np.array([a, b], dtype=np.int64))
            reduced += 1
    return matching


def matching_optimal(num_nodes: int, edges: np.ndarray, costs: np.ndarray,
                     r: float) -> List[np.ndarray]:
    """Min-cost matching via blossom; keeps the r·N cheapest matched pairs."""
    import networkx as nx
    costs = np.asarray(costs, dtype=np.float64)
    # max_weight_matching maximizes; use (max-cost) as weight so it minimizes
    shift = costs.max() if costs.size else 0.0
    gx = nx.Graph()
    gx.add_nodes_from(range(num_nodes))
    for (a, b), c in zip(edges.T, costs):
        gx.add_edge(int(a), int(b), weight=float(shift - c), cost=float(c))
    mate = nx.max_weight_matching(gx, maxcardinality=True)
    pairs = sorted(
        (gx.edges[a, b]["cost"], (a, b)) for a, b in mate)
    target = int(np.ceil(r * num_nodes))
    out = []
    for _, (a, b) in pairs[:target]:
        out.append(np.array(sorted((a, b)), dtype=np.int64))
    return out
