"""C++ ingest core parity vs the numpy oracle path."""

import numpy as np

from fitgnn_tpu.graph.build import (
    to_undirected, add_self_loops, gcn_normalize, sort_by_receiver,
)
from fitgnn_tpu.graph.native_build import build_edges_native


def numpy_oracle(s, r, n, undirected=True, self_loops=True, normalize=True):
    w = np.ones(len(s), dtype=np.float32)
    if undirected and len(s):
        s, r, w = to_undirected(s, r, w)
    if self_loops:
        s, r, w = add_self_loops(s, r, w, n)
    if normalize:
        w = gcn_normalize(s, r, w, n)
    return sort_by_receiver(s, r, w)


def canon(s, r, w):
    order = np.lexsort((s, r))
    return s[order], r[order], w[order]


class TestNativeBuild:
    def test_parity_with_numpy(self, rng):
        n = 200
        s = rng.integers(0, n, 1500).astype(np.int64)
        r = rng.integers(0, n, 1500).astype(np.int64)
        keep = s != r
        s, r = s[keep], r[keep]
        ns, nr, nw = build_edges_native(s, r, n)
        os_, or_, ow = numpy_oracle(s.astype(np.int32), r.astype(np.int32), n)
        ns, nr, nw = canon(ns, nr, nw)
        os_, or_, ow = canon(os_.astype(np.int64), or_.astype(np.int64), ow)
        np.testing.assert_array_equal(ns, os_)
        np.testing.assert_array_equal(nr, or_)
        np.testing.assert_allclose(nw, ow, rtol=1e-5)

    def test_no_selfloops_no_norm(self, rng):
        n = 50
        s = rng.integers(0, n, 300).astype(np.int64)
        r = rng.integers(0, n, 300).astype(np.int64)
        keep = s != r
        s, r = s[keep], r[keep]
        ns, nr, nw = build_edges_native(s, r, n, self_loops=False,
                                        normalize=False)
        assert np.all(ns != nr)
        assert np.all(nw == 1.0)
        # receiver-sorted
        assert np.all(np.diff(nr) >= 0)

    def test_directed_mode(self):
        s = np.array([0, 1], dtype=np.int64)
        r = np.array([1, 2], dtype=np.int64)
        ns, nr, _ = build_edges_native(s, r, 4, undirected=False,
                                       self_loops=False, normalize=False)
        pairs = set(zip(ns.tolist(), nr.tolist()))
        assert pairs == {(0, 1), (1, 2)}

    def test_dedupe(self):
        s = np.array([0, 0, 0], dtype=np.int64)
        r = np.array([1, 1, 1], dtype=np.int64)
        ns, nr, _ = build_edges_native(s, r, 3, self_loops=False,
                                       normalize=False)
        assert len(ns) == 2  # (0,1) and (1,0)
