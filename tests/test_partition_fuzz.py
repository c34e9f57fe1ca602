"""Property fuzz: partition invariants hold for random graphs/parents."""

import numpy as np
import scipy.sparse as sp
import pytest

from fitgnn_tpu.partition import extract_subgraphs, pad_subgraphs


@pytest.mark.parametrize("seed", range(8))
def test_extract_invariants_random(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(20, 120))
    e = int(rng.integers(n, 4 * n))
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    keep = s != r
    W = sp.csr_matrix((np.ones(keep.sum()), (s[keep], r[keep])),
                      shape=(n, n))
    W = W + W.T
    W.data[:] = 1.0
    k = int(rng.integers(2, max(n // 3, 3)))
    parent = rng.integers(0, k, n)
    parent[:k] = np.arange(k)  # surjective
    x = rng.normal(size=(n, 4)).astype(np.float32)

    coarse_x = rng.normal(size=(k, 4)).astype(np.float32)
    cw = sp.csr_matrix((np.ones(2 * k), (np.arange(2 * k) % k,
                                         (np.arange(2 * k) + 1) % k)),
                       shape=(k, k))
    cw = cw + cw.T

    for mode in ("plain", "extra_node", "cluster_node"):
        specs = extract_subgraphs(W, x, parent.astype(np.int64), mode=mode,
                                  coarse_x=coarse_x, coarse_W=cw)
        assert len(specs) == k
        owned = np.concatenate(
            [sp_.orig_idx[sp_.consume] for sp_ in specs])
        np.testing.assert_array_equal(np.sort(owned), np.arange(n)), mode
        for sp_ in specs:
            ns = sp_.num_nodes
            if len(sp_.senders):
                assert sp_.senders.max() < ns
                assert sp_.receivers.max() < ns
            # intra-subgraph edges between consuming nodes must be real edges
            real = sp_.orig_idx >= 0
            for a, b in zip(sp_.senders[:20], sp_.receivers[:20]):
                if real[a] and real[b]:
                    ga, gb = sp_.orig_idx[a], sp_.orig_idx[b]
                    assert W[ga, gb] > 0 or ga == gb

        batch = pad_subgraphs(specs, y=np.zeros(n, dtype=np.int64))
        assert batch.num_subgraphs == k
        w = np.asarray(batch.edge_weight)
        ne = np.asarray(batch.n_edge)
        for i in range(k):
            assert np.all(w[i, ne[i]:] == 0)
