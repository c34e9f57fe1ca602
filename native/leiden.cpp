// Leiden community detection — first-party C++ implementation.
//
// TPU-framework replacement for the reference's python-igraph (C) +
// leidenalg (C++) dependency (reference main.py:257-258): used at ingest to
// build the ogbn-products community proxy graph and to order/place
// communities onto device shards / pod hosts.
//
// Algorithm (Traag, Waltman, van Eck, "From Louvain to Leiden", 2019):
//   1. local moving   — queue-based single-node moves maximizing modularity
//   2. refinement     — within each community, re-cluster from singletons by
//                       merging only within the community (keeps communities
//                       connected — the Leiden guarantee Louvain lacks)
//   3. aggregation    — contract the refined partition; the outer communities
//                       constrain the next level's local moving
// repeated until no move improves modularity.
//
// C ABI (ctypes-friendly):
//   int64_t leiden_partition(int64_t n, int64_t m,
//                            const int64_t* src, const int64_t* dst,
//                            const double* weight,   // nullable -> 1.0
//                            double resolution, uint64_t seed,
//                            int max_levels,
//                            int64_t* out_labels /* size n */);
// Returns the number of communities (or -1 on error).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <queue>
#include <random>
#include <vector>

namespace {

struct CSR {
  int64_t n;
  std::vector<int64_t> indptr;
  std::vector<int64_t> indices;
  std::vector<double> weights;
  std::vector<double> self_weight;  // aggregated intra-community mass (the
                                    // contracted self-loops — 2·Σw_intra)
  std::vector<double> node_weight;  // weighted degree incl. self_weight
  double total_weight;              // 2m (sum of all node weights)
};

// Build symmetric CSR from an edge list (deduplicating is unnecessary for
// modularity: parallel edges just add weight).  ``self_w`` (nullable):
// per-node self-loop mass carried from a previous aggregation — WITHOUT it
// the aggregate graph's 2m and node strengths collapse to the cut edges
// only and the resolution penalty vanishes, merging everything into one
// community.
CSR build_csr(int64_t n, int64_t m, const int64_t* src, const int64_t* dst,
              const double* weight, const double* self_w = nullptr) {
  CSR g;
  g.n = n;
  std::vector<int64_t> deg(n, 0);
  for (int64_t e = 0; e < m; ++e) {
    if (src[e] == dst[e]) continue;  // input self loops ignored (reference
                                     // graphs are simple)
    deg[src[e]]++;
    deg[dst[e]]++;
  }
  g.indptr.assign(n + 1, 0);
  for (int64_t i = 0; i < n; ++i) g.indptr[i + 1] = g.indptr[i] + deg[i];
  g.indices.resize(g.indptr[n]);
  g.weights.resize(g.indptr[n]);
  std::vector<int64_t> fill(n, 0);
  for (int64_t e = 0; e < m; ++e) {
    if (src[e] == dst[e]) continue;
    double w = weight ? weight[e] : 1.0;
    int64_t a = src[e], b = dst[e];
    g.indices[g.indptr[a] + fill[a]] = b;
    g.weights[g.indptr[a] + fill[a]] = w;
    fill[a]++;
    g.indices[g.indptr[b] + fill[b]] = a;
    g.weights[g.indptr[b] + fill[b]] = w;
    fill[b]++;
  }
  g.self_weight.assign(n, 0.0);
  if (self_w)
    for (int64_t i = 0; i < n; ++i) g.self_weight[i] = self_w[i];
  g.node_weight.assign(n, 0.0);
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t k = g.indptr[i]; k < g.indptr[i + 1]; ++k)
      g.node_weight[i] += g.weights[k];
    g.node_weight[i] += g.self_weight[i];
  }
  g.total_weight =
      std::accumulate(g.node_weight.begin(), g.node_weight.end(), 0.0);
  return g;
}

// One pass of queue-based local moving. comm/comm_weight updated in place;
// comm may start from any partition (Leiden seeds each level with the outer
// partition of the previous one).
bool local_move(const CSR& g, std::vector<int64_t>& comm,
                std::vector<double>& comm_weight, double resolution,
                std::mt19937_64& rng) {
  const int64_t n = g.n;
  if (g.total_weight <= 0) return false;
  const double inv_2m = 1.0 / g.total_weight;

  std::vector<int64_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::shuffle(order.begin(), order.end(), rng);
  std::vector<char> in_queue(n, 1);
  std::queue<int64_t> q;
  for (int64_t i : order) q.push(i);

  std::vector<double> edge_to(n, 0.0);  // scratch: weight to community c
  std::vector<int64_t> touched;
  bool any_move = false;

  while (!q.empty()) {
    int64_t v = q.front();
    q.pop();
    in_queue[v] = 0;

    touched.clear();
    for (int64_t k = g.indptr[v]; k < g.indptr[v + 1]; ++k) {
      int64_t c = comm[g.indices[k]];
      if (edge_to[c] == 0.0) touched.push_back(c);
      edge_to[c] += g.weights[k];
    }
    int64_t old_c = comm[v];
    double kv = g.node_weight[v];
    comm_weight[old_c] -= kv;

    // gain of joining community c: edge_to[c] - resolution*kv*tot_c/2m
    int64_t best_c = old_c;
    double best_gain = edge_to[old_c] - resolution * kv * comm_weight[old_c] * inv_2m;
    for (int64_t c : touched) {
      if (c == old_c) continue;
      double gain = edge_to[c] - resolution * kv * comm_weight[c] * inv_2m;
      if (gain > best_gain + 1e-12) {
        best_gain = gain;
        best_c = c;
      }
    }
    comm[v] = best_c;
    comm_weight[best_c] += kv;
    for (int64_t c : touched) edge_to[c] = 0.0;

    if (best_c != old_c) {
      any_move = true;
      // re-queue neighbors not in best_c
      for (int64_t k = g.indptr[v]; k < g.indptr[v + 1]; ++k) {
        int64_t u = g.indices[k];
        if (comm[u] != best_c && !in_queue[u]) {
          in_queue[u] = 1;
          q.push(u);
        }
      }
    }
  }
  return any_move;
}

// Refinement: within each community of `comm`, grow connected sub-communities
// from singletons (greedy modularity merges constrained to the community).
// Returns the refined partition (labels compacted).
std::vector<int64_t> refine(const CSR& g, const std::vector<int64_t>& comm,
                            double resolution, std::mt19937_64& rng) {
  const int64_t n = g.n;
  std::vector<int64_t> ref(n);
  std::iota(ref.begin(), ref.end(), 0);
  std::vector<double> ref_weight(g.node_weight);
  const double inv_2m = g.total_weight > 0 ? 1.0 / g.total_weight : 0.0;

  std::vector<int64_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::shuffle(order.begin(), order.end(), rng);

  std::vector<double> edge_to(n, 0.0);
  std::vector<int64_t> touched;
  for (int64_t v : order) {
    if (ref_weight[ref[v]] != g.node_weight[v]) continue;  // only singletons move
    touched.clear();
    for (int64_t k = g.indptr[v]; k < g.indptr[v + 1]; ++k) {
      int64_t u = g.indices[k];
      if (comm[u] != comm[v]) continue;  // refinement stays inside community
      int64_t c = ref[u];
      if (edge_to[c] == 0.0) touched.push_back(c);
      edge_to[c] += g.weights[k];
    }
    int64_t old_c = ref[v];
    double kv = g.node_weight[v];
    ref_weight[old_c] -= kv;
    int64_t best_c = old_c;
    double best_gain = 0.0;
    for (int64_t c : touched) {
      if (c == old_c) continue;
      double gain = edge_to[c] - resolution * kv * ref_weight[c] * inv_2m;
      if (gain > best_gain + 1e-12) {
        best_gain = gain;
        best_c = c;
      }
    }
    ref[v] = best_c;
    ref_weight[best_c] += kv;
    for (int64_t c : touched) edge_to[c] = 0.0;
  }

  // compact labels
  std::vector<int64_t> remap(n, -1);
  int64_t next = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (remap[ref[i]] < 0) remap[ref[i]] = next++;
    ref[i] = remap[ref[i]];
  }
  return ref;
}

// Aggregate: contract graph by partition `part` (labels 0..k-1).  Intra-
// cluster edge mass (2·Σw) plus the members' existing self mass becomes the
// contracted node's self weight, preserving node strengths and 2m exactly.
CSR aggregate(const CSR& g, const std::vector<int64_t>& part, int64_t k) {
  std::vector<int64_t> src, dst;
  std::vector<double> w;
  std::vector<double> self_w(k, 0.0);
  src.reserve(g.indices.size() / 2);
  dst.reserve(g.indices.size() / 2);
  w.reserve(g.indices.size() / 2);
  for (int64_t i = 0; i < g.n; ++i) {
    self_w[part[i]] += g.self_weight[i];
    for (int64_t e = g.indptr[i]; e < g.indptr[i + 1]; ++e) {
      int64_t j = g.indices[e];
      if (i >= j) continue;
      if (part[i] != part[j]) {
        src.push_back(part[i]);
        dst.push_back(part[j]);
        w.push_back(g.weights[e]);
      } else {
        self_w[part[i]] += 2.0 * g.weights[e];
      }
    }
  }
  return build_csr(k, static_cast<int64_t>(src.size()), src.data(),
                   dst.data(), w.data(), self_w.data());
}

}  // namespace

extern "C" int64_t leiden_partition(int64_t n, int64_t m, const int64_t* src,
                                    const int64_t* dst, const double* weight,
                                    double resolution, uint64_t seed,
                                    int max_levels, int64_t* out_labels) {
  if (n <= 0 || !out_labels) return -1;
  for (int64_t e = 0; e < m; ++e)  // defend the heap: a bad id would
    if (src[e] < 0 || src[e] >= n || dst[e] < 0 || dst[e] >= n)
      return -1;                   // corrupt build_csr's degree counts
  try {
    std::mt19937_64 rng(seed);
    CSR g = build_csr(n, m, src, dst, weight);

    std::vector<int64_t> labels(n);
    std::iota(labels.begin(), labels.end(), 0);  // node -> community (global)

    // `labels` maps original node -> current aggregate node; `final` holds
    // the outer community of each original node (the algorithm's output —
    // the refined partition only shapes the aggregation).
    std::vector<int64_t> final_comm(n);
    std::iota(final_comm.begin(), final_comm.end(), 0);
    std::vector<int64_t> init_comm;  // next level's starting partition
    for (int level = 0; level < max_levels; ++level) {
      std::vector<int64_t> comm(g.n);
      if (static_cast<int64_t>(init_comm.size()) == g.n)
        comm = init_comm;  // seed with the outer partition (Leiden)
      else
        std::iota(comm.begin(), comm.end(), 0);
      std::vector<double> comm_weight(g.n, 0.0);
      for (int64_t i = 0; i < g.n; ++i)
        comm_weight[comm[i]] += g.node_weight[i];
      bool moved = local_move(g, comm, comm_weight, resolution, rng);
      for (int64_t i = 0; i < n; ++i) final_comm[i] = comm[labels[i]];
      if (!moved && level > 0) break;

      std::vector<int64_t> ref = refine(g, comm, resolution, rng);
      int64_t k = 0;
      for (int64_t c : ref) k = std::max(k, c + 1);
      if (k == g.n) break;  // no contraction -> done

      for (int64_t i = 0; i < n; ++i) labels[i] = ref[labels[i]];
      // each refined cluster inherits its outer community as the next
      // level's initial assignment
      init_comm.assign(k, 0);
      for (int64_t i = 0; i < g.n; ++i) init_comm[ref[i]] = comm[i];
      {
        std::vector<int64_t> remap(g.n, -1);
        int64_t next = 0;
        for (int64_t c = 0; c < k; ++c) {
          if (remap[init_comm[c]] < 0) remap[init_comm[c]] = next++;
          init_comm[c] = remap[init_comm[c]];
        }
      }
      g = aggregate(g, ref, k);
      if (g.total_weight <= 0) break;
      if (!moved) break;
    }

    // compact the outer-community labels
    std::vector<int64_t> remap(n, -1);
    int64_t next = 0;
    for (int64_t i = 0; i < n; ++i) {
      if (final_comm[i] < 0 || final_comm[i] >= n) return -1;
      if (remap[final_comm[i]] < 0) remap[final_comm[i]] = next++;
      out_labels[i] = remap[final_comm[i]];
    }
    return next;
  } catch (...) {
    return -1;
  }
}

// Modularity of a given partition (for tests / quality gates).
extern "C" double modularity(int64_t n, int64_t m, const int64_t* src,
                             const int64_t* dst, const double* weight,
                             const int64_t* labels, double resolution) {
  CSR g = build_csr(n, m, src, dst, weight);
  if (g.total_weight <= 0) return 0.0;
  double q = 0.0;
  const double inv_2m = 1.0 / g.total_weight;
  std::vector<double> comm_weight(n, 0.0);
  for (int64_t i = 0; i < n; ++i) comm_weight[labels[i]] += g.node_weight[i];
  for (int64_t i = 0; i < n; ++i)
    for (int64_t e = g.indptr[i]; e < g.indptr[i + 1]; ++e)
      if (labels[i] == labels[g.indices[e]]) q += g.weights[e];
  q *= inv_2m;
  for (int64_t c = 0; c < n; ++c)
    q -= resolution * comm_weight[c] * comm_weight[c] * inv_2m * inv_2m;
  return q;
}
