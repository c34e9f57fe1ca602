"""C++ blossom vs networkx: optimal total weight on randomized instances."""

import numpy as np
import pytest
import networkx as nx

from fitgnn_tpu.coarsen.native_blossom import (
    native_available, max_weight_matching_native,
)


def matching_weight(mate, eu, ev, ew):
    wmap = {}
    for a, b, w in zip(eu, ev, ew):
        key = (min(a, b), max(a, b))
        wmap[key] = max(wmap.get(key, -np.inf), w)
    total = 0.0
    for u, v in enumerate(mate):
        if v > u:
            total += wmap[(u, v)]
    return total


def nx_weight(eu, ev, ew, n, maxcard=False):
    gx = nx.Graph()
    gx.add_nodes_from(range(n))
    for a, b, w in zip(eu, ev, ew):
        if gx.has_edge(a, b):
            if gx.edges[a, b]["weight"] < w:
                gx.edges[a, b]["weight"] = w
        else:
            gx.add_edge(a, b, weight=w)
    mate = nx.max_weight_matching(gx, maxcardinality=maxcard)
    return (sum(gx.edges[a, b]["weight"] for a, b in mate), len(mate))


@pytest.mark.skipif(not native_available(), reason="native build failed")
class TestBlossom:
    @pytest.mark.parametrize("seed", range(12))
    def test_matches_networkx_weight(self, seed):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(4, 30))
        m = int(rng.integers(n, 3 * n))
        eu = rng.integers(0, n, m)
        ev = rng.integers(0, n, m)
        keep = eu != ev
        eu, ev = eu[keep], ev[keep]
        # integer weights avoid scale-rounding ambiguity in the comparison
        ew = rng.integers(1, 50, len(eu)).astype(np.float64)
        mate = max_weight_matching_native(np.stack([eu, ev]), ew, n)
        assert mate is not None
        # validity: symmetric, no self-matching
        for u, v in enumerate(mate):
            if v >= 0:
                assert mate[v] == u and v != u
        got = matching_weight(mate, eu, ev, ew)
        want, _ = nx_weight(eu, ev, ew, n)
        assert got == pytest.approx(want, abs=1e-6), (seed, got, want)

    @pytest.mark.parametrize("seed", range(6))
    def test_max_cardinality_mode(self, seed):
        rng = np.random.default_rng(100 + seed)
        n = int(rng.integers(4, 24))
        m = int(rng.integers(n, 3 * n))
        eu = rng.integers(0, n, m)
        ev = rng.integers(0, n, m)
        keep = eu != ev
        eu, ev = eu[keep], ev[keep]
        ew = rng.integers(1, 20, len(eu)).astype(np.float64)
        mate = max_weight_matching_native(np.stack([eu, ev]), ew, n,
                                          max_cardinality=True)
        assert mate is not None
        pairs = int((mate >= 0).sum()) // 2
        _, want_pairs = nx_weight(eu, ev, ew, n, maxcard=True)
        assert pairs == want_pairs, (seed, pairs, want_pairs)

    def test_triangle_blossom_case(self):
        # odd cycle forces blossom shrinking: C5 with an attached pendant
        eu = np.array([0, 1, 2, 3, 4, 0])
        ev = np.array([1, 2, 3, 4, 0, 5])
        ew = np.array([10.0, 10, 10, 10, 10, 10])
        mate = max_weight_matching_native(np.stack([eu, ev]), ew, 6)
        pairs = int((mate >= 0).sum()) // 2
        assert pairs == 3  # perfect matching exists: (0,5),(1,2),(3,4)
