"""C++ Leiden partitioner tests: planted partitions recovered, modularity
beats trivial baselines, merge/order utilities."""

import numpy as np
import pytest

from fitgnn_tpu.data.synthetic import sbm_graph
from fitgnn_tpu.partition.community import (
    leiden_communities, partition_modularity, merge_communities,
    community_order, hierarchical_community_order,
)


def planted_sbm(n=400, k=4, seed=0):
    x, s, r, y = sbm_graph(num_nodes=n, num_classes=k, num_features=4,
                           p_in=0.15, p_out=0.002, seed=seed)
    return s, r, y, n


class TestLeiden:
    def test_recovers_planted_partition(self):
        s, r, y, n = planted_sbm()
        labels = leiden_communities(s, r, n, seed=0)
        # each planted block should map dominantly to one community:
        # measure purity
        purity = 0
        for c in np.unique(labels):
            members = y[labels == c]
            purity += np.bincount(members).max()
        purity /= n
        assert purity > 0.85, purity

    def test_modularity_beats_random_and_singletons(self):
        s, r, y, n = planted_sbm()
        labels = leiden_communities(s, r, n, seed=0)
        q = partition_modularity(s, r, n, labels)
        q_singleton = partition_modularity(s, r, n, np.arange(n))
        # note: seed must differ from sbm_graph's label seed, or the
        # "random" labels reproduce the planted partition exactly
        rng = np.random.default_rng(123)
        q_rand = partition_modularity(s, r, n, rng.integers(0, 4, n))
        assert q > 0.5
        assert q > q_rand + 0.2
        assert q > q_singleton

    def test_planted_modularity_close_to_truth(self):
        s, r, y, n = planted_sbm()
        labels = leiden_communities(s, r, n, seed=0)
        q = partition_modularity(s, r, n, labels)
        q_true = partition_modularity(s, r, n, y.astype(np.int64))
        assert q >= q_true - 0.03, (q, q_true)

    def test_deterministic_given_seed(self):
        s, r, y, n = planted_sbm()
        l1 = leiden_communities(s, r, n, seed=7)
        l2 = leiden_communities(s, r, n, seed=7)
        np.testing.assert_array_equal(l1, l2)

    def test_empty_graph(self):
        labels = leiden_communities(np.empty(0, np.int64),
                                    np.empty(0, np.int64), 5)
        assert labels.shape == (5,)


class TestCommunityUtils:
    def test_merge_communities_cap(self):
        labels = np.array([0, 0, 0, 1, 1, 2])
        keep = merge_communities(labels, cap=5)
        # largest (3) + next (2) = 5 <= 5; community 2 dropped
        np.testing.assert_array_equal(keep, [0, 1, 2, 3, 4])

    def test_merge_communities_skips_too_big(self):
        labels = np.array([0, 0, 0, 1, 1, 2])
        keep = merge_communities(labels, cap=4)
        # 3 fits; +2 would exceed 4 -> skipped; +1 fits
        np.testing.assert_array_equal(keep, [0, 1, 2, 5])

    def test_hierarchical_order_improves_tile_density(self):
        # planted 64-node blocks, shuffled ids: hierarchical ordering must
        # recover far more dense 128-tiles than the identity order
        n, deg, blk = 4096, 10, 64
        rng = np.random.default_rng(0)
        e = n * deg
        r = rng.integers(0, n, e)
        c = r // blk
        s = np.where(rng.random(e) < 0.9,
                     c * blk + rng.integers(0, blk, e),
                     rng.integers(0, n, e))
        keep = s != r
        s, r = s[keep], r[keep]
        perm = rng.permutation(n)
        s, r = perm[s], perm[r]

        def dense_frac(order, thresh=64):
            inv = np.empty(n, dtype=np.int64)
            inv[order] = np.arange(n)
            s2, r2 = inv[s], inv[r]
            nb = n // 128
            tile = (r2 // 128) * nb + (s2 // 128)
            _, invt, cnt = np.unique(tile, return_inverse=True,
                                     return_counts=True)
            return (cnt[invt] >= thresh).mean()

        base = dense_frac(np.arange(n))
        ordered = dense_frac(hierarchical_community_order(s, r, n, seed=0))
        assert ordered > base + 0.3, (base, ordered)

    def test_community_order_contiguous(self):
        labels = np.array([2, 0, 2, 1, 0, 2])
        order = community_order(labels)
        grouped = labels[order]
        # contiguous runs, largest community first
        assert grouped[0] == 2
        changes = np.sum(np.diff(grouped) != 0)
        assert changes == 2
