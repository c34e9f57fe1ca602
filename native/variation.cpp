// Local-variation neighborhood coarsening — C++ hot-loop core.
//
// The greedy min-cost independent-family selection over closed neighborhoods
// (the reference's contract_variation_linear, coarsening_utils.py:530-650;
// our Python port in fitgnn_tpu/coarsen/variation.py) is the ingest
// bottleneck at ogbn scale (~O(N·deg²·K) of interpreted work).  This runs
// the same algorithm natively:
//
//   cost(S) = ||B^T L_S B||_2 / (|S|-1),   B = (I - 11^T/|S|) A[S],
//   L_S = diag(2·deg[S] - W_S·1) - W_S
//
// with a lazy min-heap (partially-marked sets shrink and re-enter), matching
// fitgnn_tpu/coarsen/variation.contract_variation_linear semantics exactly;
// parity is asserted in tests/test_native_variation.py.
//
// C ABI:
//   int64_t variation_neighborhoods(
//       int64_t n, const int64_t* indptr, const int64_t* indices,
//       const double* wvals, const double* deg,
//       const double* A /* n*K row-major */, int64_t K,
//       double r /* target reduction fraction */,
//       int64_t* out_parent /* size n, min-index representatives */);
// Returns number of coarse nodes, or -1 on error.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <queue>
#include <vector>

namespace {

// spectral norm of symmetric K×K matrix via power iteration
double spectral_norm(const std::vector<double>& m, int64_t k) {
  std::vector<double> v(k, 1.0 / std::sqrt(static_cast<double>(k)));
  std::vector<double> mv(k);
  double lam = 0.0;
  for (int it = 0; it < 50; ++it) {
    for (int64_t i = 0; i < k; ++i) {
      double acc = 0.0;
      for (int64_t j = 0; j < k; ++j) acc += m[i * k + j] * v[j];
      mv[i] = acc;
    }
    double norm = 0.0;
    for (int64_t i = 0; i < k; ++i) norm += mv[i] * mv[i];
    norm = std::sqrt(norm);
    if (norm < 1e-300) return 0.0;
    double new_lam = norm;
    for (int64_t i = 0; i < k; ++i) v[i] = mv[i] / norm;
    if (std::abs(new_lam - lam) < 1e-9 * std::max(new_lam, 1.0)) {
      lam = new_lam;
      break;
    }
    lam = new_lam;
  }
  return lam;
}

struct Ctx {
  int64_t n, K;
  const int64_t* indptr;
  const int64_t* indices;
  const double* wvals;
  const double* deg;
  const double* A;
};

// weight of edge (u,v) via binary search in u's sorted adjacency (CSR from
// scipy is sorted per row)
double edge_w(const Ctx& c, int64_t u, int64_t v) {
  const int64_t* lo = c.indices + c.indptr[u];
  const int64_t* hi = c.indices + c.indptr[u + 1];
  const int64_t* it = std::lower_bound(lo, hi, v);
  if (it != hi && *it == v) return c.wvals[c.indptr[u] + (it - lo)];
  return 0.0;
}

double set_cost(const Ctx& c, const std::vector<int64_t>& s) {
  const int64_t nc = static_cast<int64_t>(s.size());
  if (nc < 2) return 1e300;
  const int64_t K = c.K;
  // B = A[s] - colmean  (nc × K)
  std::vector<double> B(nc * K);
  for (int64_t j = 0; j < K; ++j) {
    double mean = 0.0;
    for (int64_t i = 0; i < nc; ++i) mean += c.A[s[i] * K + j];
    mean /= nc;
    for (int64_t i = 0; i < nc; ++i)
      B[i * K + j] = c.A[s[i] * K + j] - mean;
  }
  // L_S (nc × nc): diag(2 deg - rowsum W_S) - W_S
  std::vector<double> Ws(nc * nc, 0.0);
  for (int64_t i = 0; i < nc; ++i)
    for (int64_t j = i + 1; j < nc; ++j) {
      double w = edge_w(c, s[i], s[j]);
      Ws[i * nc + j] = w;
      Ws[j * nc + i] = w;
    }
  std::vector<double> diag(nc);
  for (int64_t i = 0; i < nc; ++i) {
    double rs = 0.0;
    for (int64_t j = 0; j < nc; ++j) rs += Ws[i * nc + j];
    diag[i] = 2.0 * c.deg[s[i]] - rs;
  }
  // M = B^T L B = B^T (diag·B - Ws·B)
  std::vector<double> LB(nc * K);
  for (int64_t i = 0; i < nc; ++i)
    for (int64_t j = 0; j < K; ++j) {
      double acc = diag[i] * B[i * K + j];
      for (int64_t t = 0; t < nc; ++t)
        acc -= Ws[i * nc + t] * B[t * K + j];
      LB[i * K + j] = acc;
    }
  std::vector<double> M(K * K, 0.0);
  for (int64_t a = 0; a < K; ++a)
    for (int64_t b = 0; b < K; ++b) {
      double acc = 0.0;
      for (int64_t i = 0; i < nc; ++i) acc += B[i * K + a] * LB[i * K + b];
      M[a * K + b] = acc;
    }
  return spectral_norm(M, K) / (nc - 1);
}

struct HeapItem {
  double cost;
  int64_t tiebreak;
  std::vector<int64_t> set;
  bool operator>(const HeapItem& o) const {
    return cost > o.cost || (cost == o.cost && tiebreak > o.tiebreak);
  }
};

}  // namespace

extern "C" int64_t variation_neighborhoods(
    int64_t n, const int64_t* indptr, const int64_t* indices,
    const double* wvals, const double* deg, const double* A, int64_t K,
    double r, int64_t* out_parent) {
  if (n <= 0 || K <= 0) return -1;
  try {
    Ctx c{n, K, indptr, indices, wvals, deg, A};
    std::priority_queue<HeapItem, std::vector<HeapItem>,
                        std::greater<HeapItem>> heap;
    for (int64_t i = 0; i < n; ++i) {
      std::vector<int64_t> s(indices + indptr[i], indices + indptr[i + 1]);
      s.push_back(i);
      std::sort(s.begin(), s.end());
      s.erase(std::unique(s.begin(), s.end()), s.end());
      if (s.size() < 2) continue;
      heap.push(HeapItem{set_cost(c, s), i, std::move(s)});
    }

    std::vector<char> marked(n, 0);
    std::vector<int64_t> rep(n);
    for (int64_t i = 0; i < n; ++i) rep[i] = i;
    double n_reduce = std::floor(r * static_cast<double>(n));
    int64_t tiebreak = n;

    while (!heap.empty() && n_reduce > 0) {
      HeapItem item = heap.top();
      heap.pop();
      bool any_marked = false;
      for (int64_t v : item.set)
        if (marked[v]) {
          any_marked = true;
          break;
        }
      if (!any_marked) {
        const double gain = static_cast<double>(item.set.size()) - 1.0;
        if (gain > n_reduce) continue;  // would over-reduce
        int64_t mn = item.set[0];
        for (int64_t v : item.set) {
          marked[v] = 1;
          rep[v] = mn;  // sets are sorted: [0] is the min
        }
        n_reduce -= gain;
      } else {
        std::vector<int64_t> rest;
        for (int64_t v : item.set)
          if (!marked[v]) rest.push_back(v);
        if (rest.size() > 1) {
          double cost = set_cost(c, rest);
          heap.push(HeapItem{cost, tiebreak++, std::move(rest)});
        }
      }
    }

    // compact representatives -> parent labels ordered by min member
    std::vector<int64_t> remap(n, -1);
    int64_t next = 0;
    for (int64_t i = 0; i < n; ++i) {
      int64_t rp = rep[i];
      if (remap[rp] < 0) remap[rp] = next++;
      out_parent[i] = remap[rp];
    }
    return next;
  } catch (...) {
    return -1;
  }
}
