// Graph ingest core: symmetrize + dedupe + self-loops + GCN-normalize +
// receiver-sorted edge list, in one C++ pass.
//
// First-party native replacement for the edge preprocessing the reference
// delegates to scipy.sparse / torch ops (to_scipy_sparse_matrix,
// utils.py:144; PyG gcn_norm inside GCNConv).  At ogbn-products scale
// (~124M edges) the numpy unique/sort pipeline is the ingest bottleneck;
// this runs it as one typed sort + scan.
//
// C ABI (ctypes):
//   int64_t build_graph_edges(
//       int64_t n, int64_t m, const int64_t* src, const int64_t* dst,
//       int undirected, int self_loops, int normalize,
//       int64_t* out_src, int64_t* out_dst, float* out_w /* cap edges */,
//       int64_t cap);
// Returns the number of output edges (sorted by dst, then src), or -1 if
// cap is too small / inputs invalid.

#include <algorithm>
#include <cstdint>
#include <cmath>
#include <vector>

namespace {
struct Edge {
  int64_t key;  // dst * n + src  (requires n*n < 2^63 — fine for n < 3e9^(1/2))
};
}  // namespace

extern "C" int64_t build_graph_edges(
    int64_t n, int64_t m, const int64_t* src, const int64_t* dst,
    int undirected, int self_loops, int normalize,
    int64_t* out_src, int64_t* out_dst, float* out_w, int64_t cap) {
  if (n <= 0) return -1;
  std::vector<int64_t> keys;
  keys.reserve(undirected ? 2 * m : m);
  for (int64_t e = 0; e < m; ++e) {
    int64_t a = src[e], b = dst[e];
    if (a < 0 || a >= n || b < 0 || b >= n) return -1;
    if (a == b) continue;  // existing self loops re-added uniformly below
    keys.push_back(b * n + a);
    if (undirected) keys.push_back(a * n + b);
  }
  std::sort(keys.begin(), keys.end());
  keys.erase(std::unique(keys.begin(), keys.end()), keys.end());

  const int64_t extra = self_loops ? n : 0;
  // merge self loops (key = i*n + i) into the sorted stream
  std::vector<double> deg;
  if (normalize) deg.assign(n, 0.0);

  // first pass: count + degrees
  int64_t total = static_cast<int64_t>(keys.size()) + extra;
  if (total > cap) return -1;

  // emit merged (sorted) stream
  int64_t out = 0;
  size_t ki = 0;
  for (int64_t d = 0; d < n; ++d) {
    bool loop_emitted = !self_loops;
    const int64_t loop_key = d * n + d;
    while (ki < keys.size() && keys[ki] < (d + 1) * n) {
      if (!loop_emitted && keys[ki] > loop_key) {
        out_src[out] = d;
        out_dst[out] = d;
        ++out;
        loop_emitted = true;
      }
      out_dst[out] = d;
      out_src[out] = keys[ki] - d * n;
      ++out;
      ++ki;
    }
    if (!loop_emitted) {
      out_src[out] = d;
      out_dst[out] = d;
      ++out;
    }
  }

  if (normalize) {
    for (int64_t e = 0; e < out; ++e) deg[out_dst[e]] += 1.0;
    std::vector<float> dinv(n);
    for (int64_t i = 0; i < n; ++i)
      dinv[i] = deg[i] > 0 ? 1.0f / std::sqrt(static_cast<float>(deg[i]))
                           : 0.0f;
    for (int64_t e = 0; e < out; ++e)
      out_w[e] = dinv[out_src[e]] * dinv[out_dst[e]];
  } else {
    for (int64_t e = 0; e < out; ++e) out_w[e] = 1.0f;
  }
  return out;
}
