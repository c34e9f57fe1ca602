"""Synthetic graph generators for tests and benchmarks.

* ``ring_graph``   — the reference's only synthetic dataset: N nodes on a
  ring plus random chords, 4N edges total, 100 features, 10 classes
  (``save_graphs.py:98-113`` semantics).
* ``sbm_graph``    — stochastic block model with homophilous communities and
  class-correlated features; a Cora-like stand-in where real datasets can't
  be downloaded (zero-egress images).  Community structure also exercises the
  coarsening/partition stack meaningfully.
* ``random_regression_graph`` — SBM with smooth scalar targets for node_reg.
"""

from __future__ import annotations

import numpy as np


def ring_graph(num_nodes: int, num_features: int = 100, num_classes: int = 10,
               seed: int = 0):
    """Ring + random chords; ~4N directed edge endpoints before symmetrize."""
    rng = np.random.default_rng(seed)
    ring_s = np.arange(num_nodes, dtype=np.int64)
    ring_r = (ring_s + 1) % num_nodes
    extra = rng.integers(0, num_nodes, size=(2, 3 * num_nodes))
    senders = np.concatenate([ring_s, extra[0]])
    receivers = np.concatenate([ring_r, extra[1]])
    keep = senders != receivers
    senders, receivers = senders[keep], receivers[keep]
    x = rng.normal(size=(num_nodes, num_features)).astype(np.float32)
    y = rng.integers(0, num_classes, size=num_nodes).astype(np.int32)
    return x, senders.astype(np.int32), receivers.astype(np.int32), y


def sbm_graph(num_nodes: int = 600, num_classes: int = 4,
              num_features: int = 64, p_in: float = 0.04, p_out: float = 0.002,
              feature_noise: float = 1.0, seed: int = 0):
    """Homophilous SBM with class-mean features (+ noise). Returns
    (x, senders, receivers, y). Features make classes linearly separable
    only through neighborhood aggregation at high noise."""
    rng = np.random.default_rng(seed)
    y = rng.integers(0, num_classes, size=num_nodes).astype(np.int32)
    # class means far apart; node features = mean + noise
    means = rng.normal(scale=2.0, size=(num_classes, num_features))
    x = (means[y] + feature_noise * rng.normal(size=(num_nodes, num_features))
         ).astype(np.float32)
    # sample edges blockwise without materializing N^2 for large N
    same = y[:, None] == y[None, :] if num_nodes <= 4000 else None
    if same is not None:
        probs = np.where(same, p_in, p_out)
        upper = np.triu(rng.random((num_nodes, num_nodes)) < probs, k=1)
        senders, receivers = np.nonzero(upper)
    else:
        # sparse sampling: expected counts per pair class
        n_in = int(p_in * num_nodes * num_nodes / (2 * num_classes))
        n_out = int(p_out * num_nodes * num_nodes / 2)
        s_in = rng.integers(0, num_nodes, size=4 * n_in)
        r_in = rng.integers(0, num_nodes, size=4 * n_in)
        keep = (y[s_in] == y[r_in]) & (s_in != r_in)
        s1, r1 = s_in[keep][:n_in], r_in[keep][:n_in]
        s_out = rng.integers(0, num_nodes, size=2 * n_out)
        r_out = rng.integers(0, num_nodes, size=2 * n_out)
        keep = (y[s_out] != y[r_out])
        s2, r2 = s_out[keep][:n_out], r_out[keep][:n_out]
        senders = np.concatenate([s1, s2])
        receivers = np.concatenate([r1, r2])
    return (x, senders.astype(np.int32), receivers.astype(np.int32), y)


def random_regression_graph(num_nodes: int = 400, num_features: int = 32,
                            seed: int = 0):
    """SBM-like graph with a smooth scalar target y = f(x) + neighbor term."""
    rng = np.random.default_rng(seed)
    x, senders, receivers, _ = sbm_graph(
        num_nodes=num_nodes, num_classes=3, num_features=num_features,
        seed=seed)
    w = rng.normal(size=num_features) / np.sqrt(num_features)
    y = (x @ w).astype(np.float32)
    # one smoothing pass over the (symmetrized) graph
    deg = np.zeros(num_nodes)
    np.add.at(deg, receivers, 1.0)
    np.add.at(deg, senders, 1.0)
    agg = np.zeros(num_nodes, dtype=np.float32)
    np.add.at(agg, receivers, y[senders])
    np.add.at(agg, senders, y[receivers])
    y = 0.5 * y + 0.5 * agg / np.maximum(deg, 1.0).astype(np.float32)
    return x, senders, receivers, y


def random_graph_dataset(num_graphs: int = 60, min_nodes: int = 10,
                         max_nodes: int = 30, num_features: int = 8,
                         num_classes: int = 2, seed: int = 0):
    """Small graph-classification set: class 0 = sparse rings, class 1 =
    dense cliques-ish; returns list of (x, senders, receivers), labels."""
    rng = np.random.default_rng(seed)
    graphs, labels = [], []
    for i in range(num_graphs):
        n = int(rng.integers(min_nodes, max_nodes + 1))
        label = int(rng.integers(0, num_classes))
        ring_s = np.arange(n)
        ring_r = (ring_s + 1) % n
        extra_count = n * (1 + 3 * label)  # denser for higher class
        es = rng.integers(0, n, size=extra_count)
        er = rng.integers(0, n, size=extra_count)
        keep = es != er
        senders = np.concatenate([ring_s, es[keep]]).astype(np.int32)
        receivers = np.concatenate([ring_r, er[keep]]).astype(np.int32)
        x = rng.normal(loc=label, size=(n, num_features)).astype(np.float32)
        graphs.append((x, senders, receivers))
        labels.append(label)
    return graphs, np.asarray(labels, dtype=np.int32)
