"""Coarsening visualizer (reference ``plot_coarsening``,
``coarsening_utils.py:354-475``): draw each level's graph with contracted
groups highlighted.  Debug tool — not used by the pipeline."""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import scipy.sparse as sp


def plot_coarsening(W: sp.spmatrix, level_parents: List[np.ndarray],
                    coords: Optional[np.ndarray] = None,
                    path: Optional[str] = None, max_nodes: int = 2000):
    """One subplot per level; nodes colored by the group they contract into.

    ``coords``: (N, 2) layout for the finest level (spring layout computed
    when absent).  Returns the matplotlib figure (also saved to ``path``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    W = sp.csr_matrix(W)
    n = W.shape[0]
    if n > max_nodes:
        raise ValueError(f"visualizer is for small graphs (≤{max_nodes})")
    if coords is None:
        import networkx as nx
        gx = nx.from_scipy_sparse_array(W)
        pos = nx.spring_layout(gx, seed=0)
        coords = np.array([pos[i] for i in range(n)])

    levels = len(level_parents)
    fig, axes = plt.subplots(1, levels + 1, figsize=(4 * (levels + 1), 4))
    if levels == 0:
        axes = [axes]

    cur_W = W
    cur_coords = coords
    for lvl in range(levels + 1):
        ax = axes[lvl]
        coo = sp.triu(cur_W, k=1).tocoo()
        for i, j in zip(coo.row, coo.col):
            ax.plot([cur_coords[i, 0], cur_coords[j, 0]],
                    [cur_coords[i, 1], cur_coords[j, 1]],
                    color="0.8", lw=0.5, zorder=1)
        if lvl < levels:
            parent = level_parents[lvl]
            colors = parent % 20
            ax.scatter(cur_coords[:, 0], cur_coords[:, 1], c=colors,
                       cmap="tab20", s=18, zorder=2)
            # contract for the next level: coords = group means
            k = int(parent.max()) + 1
            nxt = np.zeros((k, 2))
            cnt = np.bincount(parent, minlength=k).astype(float)
            for d in range(2):
                np.add.at(nxt[:, d], parent, cur_coords[:, d])
            nxt /= cnt[:, None]
            M = sp.csr_matrix(
                (np.ones(len(parent)), (np.arange(len(parent)), parent)),
                shape=(len(parent), k))
            cur_W = sp.csr_matrix(M.T @ cur_W @ M)
            cur_W.setdiag(0)
            cur_W.eliminate_zeros()
            cur_coords = nxt
        else:
            ax.scatter(cur_coords[:, 0], cur_coords[:, 1], c="k", s=18,
                       zorder=2)
        ax.set_title(f"level {lvl}: {cur_W.shape[0] if lvl == levels else len(cur_coords)} nodes")
        ax.axis("off")
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=120)
    return fig
