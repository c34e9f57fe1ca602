"""Coarsening visualizer smoke test (Agg backend)."""

import os

import numpy as np
import scipy.sparse as sp

from fitgnn_tpu.coarsen import coarsen
from fitgnn_tpu.coarsen.visualize import plot_coarsening


def test_plot_coarsening_writes_figure(tmp_path, rng):
    n = 60
    s = rng.integers(0, n, 240)
    r = rng.integers(0, n, 240)
    keep = s != r
    W = sp.csr_matrix((np.ones(keep.sum()), (s[keep], r[keep])),
                      shape=(n, n))
    W = W + W.T
    W.data[:] = 1.0
    res = coarsen(W, r=0.5, method="heavy_edge")
    out = str(tmp_path / "viz.png")
    fig = plot_coarsening(W, res.level_parents, path=out)
    assert os.path.getsize(out) > 1000
    import matplotlib.pyplot as plt
    plt.close(fig)
