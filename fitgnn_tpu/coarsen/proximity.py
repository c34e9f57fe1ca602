"""Edge proximity measures for multigrid-style pairwise coarsening.

Vectorized first-party implementations of the measures the reference exposes
at the CLI (``coarsening_utils.py:658-811``): heavy_edge, algebraic_JC
(Jacobi-smoothed), affinity_GS (Gauss–Seidel-smoothed).  Larger proximity ⇒
contract first.
"""

from __future__ import annotations

import numpy as np

from fitgnn_tpu.coarsen.lapgraph import LapGraph
from fitgnn_tpu.coarsen.spectral import smoothed_vectors


def heavy_edge(g: LapGraph) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """proximity[e] = w_e / max(wmax[i], wmax[j]) — normalized heavy-edge."""
    i, j, w = g.edge_list()
    wmax = np.asarray(g.W.max(axis=0).todense()).ravel() + 1e-5
    prox = w / np.maximum(wmax[i], wmax[j])
    return np.stack([i, j]), prox, w


def algebraic_jc(g: LapGraph, num_vectors: int = 10, iterations: int = 20,
                 seed: int = 0):
    """Algebraic distance: prox[e] = min_k 1/max((x_k[i]−x_k[j])², 1e-6)."""
    i, j, w = g.edge_list()
    X = smoothed_vectors(g, num_vectors, method="JC", iterations=iterations,
                         seed=seed)
    diff2 = (X[i] - X[j]) ** 2                      # (E, K)
    prox = (1.0 / np.maximum(diff2, 1e-6)).min(axis=1)
    return np.stack([i, j]), prox, w


def affinity_gs(g: LapGraph, num_vectors: int = 10, iterations: int = 1,
                seed: int = 0):
    """Ruge–Stüben-style affinity from GS-relaxed vectors, normalized by each
    endpoint's strongest affinity."""
    i, j, w = g.edge_list()
    X = smoothed_vectors(g, num_vectors, method="GS", iterations=iterations,
                         seed=seed)
    dots = np.sum(X[i] * X[j], axis=1) ** 2
    norms = np.sum(X * X, axis=1) ** 2              # (N,)
    aff = dots / np.maximum(norms[i] * norms[j], 1e-30)
    # per-node max affinity over incident edges
    node_max = np.zeros(g.N)
    np.maximum.at(node_max, i, aff)
    np.maximum.at(node_max, j, aff)
    prox = aff / np.maximum(node_max[i] * node_max[j], 1e-30)
    return np.stack([i, j]), prox, w


PROXIMITY_FNS = {
    "heavy_edge": heavy_edge,
    "algebraic_JC": algebraic_jc,
    "affinity_GS": affinity_gs,
}
