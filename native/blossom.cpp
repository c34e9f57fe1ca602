// Maximum-weight matching in general graphs (blossom algorithm, O(n^3)).
//
// First-party C++ replacement for the pure-Python blossom port the reference
// vendors (maxWeightMatching.py, 945 lines) and for the networkx fallback in
// fitgnn_tpu/coarsen/matching.py.  Primal-dual method with blossom
// shrinking (Galil's O(n^3) formulation): vertex/blossom duals, alternating
// forest growth from free vertices, blossom formation on tight S-S edges
// within one tree, augmentation across trees, dual adjustment by minimum
// slack.  Structure follows the classical array-based scheme (vertices
// 1..n, blossom nodes n+1..2n; g[x][y] carries the underlying vertex pair
// so shrunk nodes keep edge identity).
//
// Weights are scaled doubles rounded to integers so dual arithmetic is
// exact.  Correctness is gated against networkx's blossom on randomized
// instances (tests/test_blossom.py).
//
// C ABI:
//   int64_t max_weight_matching(int64_t n, int64_t m,
//                               const int64_t* eu, const int64_t* ev,
//                               const double* ew, int max_cardinality,
//                               int64_t* out_mate /* n, -1 = unmatched */);
// Returns the number of matched pairs, or -1 on error.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <deque>
#include <vector>

namespace {

using ll = long long;
constexpr ll INF = (ll)1 << 60;

struct Edge {
  int u, v;
  ll w;
};

struct Solver {
  int n, n_x;
  std::vector<std::vector<Edge>> g;            // (2n+1)^2
  std::vector<ll> lab;
  std::vector<int> match, slack, st, pa, S, vis;
  std::vector<std::vector<int>> flower;
  std::vector<std::vector<int>> flower_from;   // [b][vertex 1..n]
  std::deque<int> q;

  explicit Solver(int n_) : n(n_) {
    const int N = 2 * n + 1;
    g.assign(N, std::vector<Edge>(N));
    for (int u = 0; u < N; ++u)
      for (int v = 0; v < N; ++v) g[u][v] = Edge{u, v, 0};
    lab.assign(N, 0);
    match.assign(N, 0);
    slack.assign(N, 0);
    st.assign(N, 0);
    pa.assign(N, 0);
    S.assign(N, -1);
    vis.assign(N, 0);
    flower.assign(N, {});
    flower_from.assign(N, std::vector<int>(n + 1, 0));
  }

  ll e_delta(const Edge& e) const {
    return lab[e.u] + lab[e.v] - g[e.u][e.v].w * 2;
  }

  void update_slack(int u, int x) {
    if (!slack[x] || e_delta(g[u][x]) < e_delta(g[slack[x]][x])) slack[x] = u;
  }

  void set_slack(int x) {
    slack[x] = 0;
    for (int u = 1; u <= n; ++u)
      if (g[u][x].w > 0 && st[u] != x && S[st[u]] == 0) update_slack(u, x);
  }

  void q_push(int x) {
    if (x <= n) {
      q.push_back(x);
    } else {
      for (int t : flower[x]) q_push(t);
    }
  }

  void set_st(int x, int b) {
    st[x] = b;
    if (x > n)
      for (int t : flower[x]) set_st(t, b);
  }

  int get_pr(int b, int xr) {
    int pr = static_cast<int>(
        std::find(flower[b].begin(), flower[b].end(), xr) -
        flower[b].begin());
    if (pr % 2 == 1) {
      std::reverse(flower[b].begin() + 1, flower[b].end());
      return static_cast<int>(flower[b].size()) - pr;
    }
    return pr;
  }

  void set_match(int u, int v) {
    match[u] = g[u][v].v;
    if (u > n) {
      Edge e = g[u][v];
      int xr = flower_from[u][e.u];
      int pr = get_pr(u, xr);
      for (int i = 0; i < pr; ++i)
        set_match(flower[u][i], flower[u][i ^ 1]);
      set_match(xr, v);
      std::rotate(flower[u].begin(), flower[u].begin() + pr,
                  flower[u].end());
    }
  }

  void augment(int u, int v) {
    while (true) {
      int xnv = st[match[u]];
      set_match(u, v);
      if (!xnv) return;
      set_match(xnv, st[pa[xnv]]);
      u = st[pa[xnv]];
      v = xnv;
    }
  }

  int get_lca(int u, int v) {
    static int t = 0;
    for (++t; u || v; std::swap(u, v)) {
      if (u == 0) continue;
      if (vis[u] == t) return u;
      vis[u] = t;
      u = st[match[u]];
      if (u) u = st[pa[u]];
    }
    return 0;
  }

  void add_blossom(int u, int anc, int v) {
    int b = n + 1;
    while (b <= n_x && st[b]) ++b;
    if (b > n_x) ++n_x;
    lab[b] = 0;
    S[b] = 0;
    match[b] = match[anc];
    flower[b].clear();
    flower[b].push_back(anc);
    for (int x = u, y; x != anc; x = st[pa[y]]) {
      flower[b].push_back(x);
      flower[b].push_back(y = st[match[x]]);
      q_push(y);
    }
    std::reverse(flower[b].begin() + 1, flower[b].end());
    for (int x = v, y; x != anc; x = st[pa[y]]) {
      flower[b].push_back(x);
      flower[b].push_back(y = st[match[x]]);
      q_push(y);
    }
    set_st(b, b);
    for (int x = 1; x <= n_x; ++x) g[b][x].w = g[x][b].w = 0;
    for (int x = 1; x <= n; ++x) flower_from[b][x] = 0;
    for (int xs : flower[b]) {
      for (int x = 1; x <= n_x; ++x)
        if (g[b][x].w == 0 || e_delta(g[xs][x]) < e_delta(g[b][x])) {
          g[b][x] = g[xs][x];
          g[x][b] = g[x][xs];
        }
      for (int x = 1; x <= n; ++x)
        if (flower_from[xs][x]) flower_from[b][x] = xs;
    }
    set_slack(b);
  }

  void expand_blossom(int b) {
    for (int xs : flower[b]) set_st(xs, xs);
    int xr = flower_from[b][g[b][pa[b]].u];
    int pr = get_pr(b, xr);
    for (int i = 0; i < pr; i += 2) {
      int xs = flower[b][i];
      int xns = flower[b][i + 1];
      pa[xs] = g[xns][xs].u;
      S[xs] = 1;
      S[xns] = 0;
      slack[xs] = slack[xns] = 0;
      q_push(xns);
    }
    S[xr] = 1;
    pa[xr] = pa[b];
    for (size_t i = pr + 1; i < flower[b].size(); ++i) {
      int xs = flower[b][i];
      S[xs] = -1;
      set_slack(xs);
    }
    st[b] = 0;
  }

  bool on_found_edge(const Edge& e) {
    int u = st[e.u], v = st[e.v];
    if (S[v] == -1) {
      pa[v] = e.u;
      S[v] = 1;
      int nu = st[match[v]];
      slack[v] = slack[nu] = 0;
      S[nu] = 0;
      q_push(nu);
    } else if (S[v] == 0) {
      int anc = get_lca(u, v);
      if (!anc) {
        augment(u, v);
        augment(v, u);
        return true;
      }
      add_blossom(u, anc, v);
    }
    return false;
  }

  bool matching_phase() {
    for (int x = 1; x <= n_x; ++x) {
      S[x] = -1;
      slack[x] = 0;
    }
    q.clear();
    for (int x = 1; x <= n_x; ++x)
      if (st[x] == x && !match[x]) {
        pa[x] = 0;
        S[x] = 0;
        q_push(x);
      }
    if (q.empty()) return false;
    while (true) {
      while (!q.empty()) {
        int u = q.front();
        q.pop_front();
        if (S[st[u]] == 1) continue;
        for (int v = 1; v <= n; ++v)
          if (g[u][v].w > 0 && st[u] != st[v]) {
            if (e_delta(g[u][v]) == 0) {
              if (on_found_edge(g[u][v])) return true;
            } else {
              update_slack(u, st[v]);
            }
          }
      }
      ll d = INF;
      for (int b = n + 1; b <= n_x; ++b)
        if (st[b] == b && S[b] == 1) d = std::min(d, lab[b] / 2);
      for (int x = 1; x <= n_x; ++x)
        if (st[x] == x && slack[x]) {
          if (S[x] == -1)
            d = std::min(d, e_delta(g[slack[x]][x]));
          else if (S[x] == 0)
            d = std::min(d, e_delta(g[slack[x]][x]) / 2);
        }
      for (int u = 1; u <= n; ++u) {
        if (S[st[u]] == 0) {
          if (lab[u] <= d) return false;  // optimum reached
          lab[u] -= d;
        } else if (S[st[u]] == 1) {
          lab[u] += d;
        }
      }
      for (int b = n + 1; b <= n_x; ++b)
        if (st[b] == b) {
          if (S[b] == 0)
            lab[b] += d * 2;
          else if (S[b] == 1)
            lab[b] -= d * 2;
        }
      q.clear();
      for (int x = 1; x <= n_x; ++x)
        if (st[x] == x && slack[x] && st[slack[x]] != x &&
            e_delta(g[slack[x]][x]) == 0)
          if (on_found_edge(g[slack[x]][x])) return true;
      for (int b = n + 1; b <= n_x; ++b)
        if (st[b] == b && S[b] == 1 && lab[b] == 0) expand_blossom(b);
    }
  }

  ll solve(std::vector<int>& mate) {
    n_x = n;
    for (int u = 0; u <= n; ++u) {
      st[u] = u;
      flower[u].clear();
      match[u] = 0;
    }
    for (int u = 1; u <= n; ++u)
      for (int x = 1; x <= n; ++x) flower_from[u][x] = (u == x ? u : 0);
    ll w_max = 0;
    for (int u = 1; u <= n; ++u)
      for (int v = 1; v <= n; ++v) w_max = std::max(w_max, g[u][v].w);
    for (int u = 1; u <= n; ++u) lab[u] = w_max;
    while (matching_phase()) {
    }
    mate.assign(n, -1);
    ll pairs = 0;
    for (int u = 1; u <= n; ++u)
      if (match[u] && match[u] > u) {
        mate[u - 1] = match[u] - 1;
        mate[match[u] - 1] = u - 1;
        ++pairs;
      }
    return pairs;
  }
};

}  // namespace

extern "C" int64_t max_weight_matching(int64_t n, int64_t m,
                                       const int64_t* eu, const int64_t* ev,
                                       const double* ew, int max_cardinality,
                                       int64_t* out_mate) {
  if (n <= 0 || n > 3000) return -1;  // dense (2n)^2 storage bound
  try {
    Solver s(static_cast<int>(n));
    double wmax = 0.0;
    for (int64_t e = 0; e < m; ++e) wmax = std::max(wmax, std::abs(ew[e]));
    const double scale = wmax > 0 ? (double)(1LL << 16) / wmax : 1.0;
    ll floor_w = 0;
    if (max_cardinality)  // lift weights so every edge is profitable
      floor_w = (ll)std::llround(wmax * scale) * (ll)n + 1;
    for (int64_t e = 0; e < m; ++e) {
      int u = static_cast<int>(eu[e]) + 1, v = static_cast<int>(ev[e]) + 1;
      if (u == v || u < 1 || v < 1 || u > n || v > n) continue;
      ll wi = (ll)std::llround(ew[e] * scale) + floor_w;
      if (wi <= 0) continue;  // never in a max-weight matching
      if (wi > s.g[u][v].w) s.g[u][v].w = s.g[v][u].w = wi;
    }
    std::vector<int> mate;
    ll pairs = s.solve(mate);
    for (int64_t i = 0; i < n; ++i) out_mate[i] = mate[i];
    return pairs;
  } catch (...) {
    return -1;
  }
}
