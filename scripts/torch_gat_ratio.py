"""Measure the GCN:GAT training-step cost ratio of a torch edge-scatter
implementation on the bench graph — the computational structure PyG's
conv layers lower to (gather + index_add/torch_scatter per edge).

Round-2 VERDICT weak #2: the defense "PyG GAT is several-fold slower than
PyG GCN" was asserted, never measured.  torch_geometric is not installed
here (zero egress), so this uses the same hand-rolled torch semantics the
parity suite's oracles use (tests/test_torch_parity.py): GCNConv as a
weighted index_add SpMM, GATConv as per-edge additive attention with a
segment softmax — both 2-layer, hidden 512, full fwd+bwd+SGD step.

The ratio calibrates the `vs_baseline` constant per layer: if the
reference's own GAT costs R× its GCN on identical hardware, then a TPU
GAT at (R × GCN-baseline-time) is at parity, not behind.

Usage: python scripts/torch_gat_ratio.py [--nodes 169344] [--steps 3]
"""

import argparse
import time

import numpy as np
import torch


def scatter_sum(src, index, n):
    out = torch.zeros((n,) + src.shape[1:], dtype=src.dtype)
    return out.index_add_(0, index, src)


class GCNLayer(torch.nn.Module):
    def __init__(self, fi, fo):
        super().__init__()
        self.lin = torch.nn.Linear(fi, fo, bias=True)

    def forward(self, x, s, r, w, n):
        h = self.lin(x)
        return scatter_sum(h[s] * w[:, None], r, n)


class GATLayer(torch.nn.Module):
    def __init__(self, fi, fo):
        super().__init__()
        self.lin = torch.nn.Linear(fi, fo, bias=False)
        self.a_src = torch.nn.Parameter(torch.randn(fo) * 0.1)
        self.a_dst = torch.nn.Parameter(torch.randn(fo) * 0.1)

    def forward(self, x, s, r, w, n):
        h = self.lin(x)
        ssrc = (h * self.a_src).sum(-1)
        sdst = (h * self.a_dst).sum(-1)
        pre = torch.nn.functional.leaky_relu(ssrc[s] + sdst[r], 0.2)
        m = torch.full((n,), -1e30).index_reduce_(
            0, r, pre, "amax", include_self=True)
        pes = torch.exp(pre - m[r])
        den = scatter_sum(pes, r, n).clamp_min(1e-16)
        alpha = pes / den[r]
        return scatter_sum(h[s] * alpha[:, None], r, n)


def bench_graph(n, deg, seed=0):
    rng = np.random.default_rng(seed)
    e = n * deg // 2
    rcv = rng.integers(0, n, e)
    comm = rcv // 512
    snd = np.where(rng.random(e) < 0.85,
                   np.minimum(comm * 512 + rng.integers(0, 512, e), n - 1),
                   rng.integers(0, n, e))
    keep = snd != rcv
    s = np.concatenate([snd[keep], rcv[keep], np.arange(n)])
    r = np.concatenate([rcv[keep], snd[keep], np.arange(n)])
    key = np.unique(s * n + r)
    return (key // n).astype(np.int64), (key % n).astype(np.int64)


def run(layer_cls, x, s, r, w, y, n, hidden, steps):
    torch.manual_seed(0)
    model = torch.nn.Sequential()
    l1 = layer_cls(x.shape[1], hidden)
    l2 = layer_cls(hidden, hidden)
    head = torch.nn.Linear(hidden, 16)
    params = (list(l1.parameters()) + list(l2.parameters())
              + list(head.parameters()))
    opt = torch.optim.SGD(params, lr=0.01)

    def step():
        opt.zero_grad()
        h = torch.nn.functional.elu(l1(x, s, r, w, n))
        h = torch.nn.functional.elu(l2(h, s, r, w, n))
        loss = torch.nn.functional.cross_entropy(head(h), y)
        loss.backward()
        opt.step()

    step()                          # warm-up
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=169_344)
    ap.add_argument("--degree", type=int, default=16)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()
    torch.set_num_threads(torch.get_num_threads())

    s_np, r_np = bench_graph(args.nodes, args.degree)
    n, e = args.nodes, len(s_np)
    x = torch.randn(n, 128)
    s, r = torch.from_numpy(s_np), torch.from_numpy(r_np)
    deg = torch.zeros(n).index_add_(0, r, torch.ones(e))
    w = (deg[s] * deg[r]).rsqrt()
    y = torch.randint(0, 16, (n,))

    t_gcn = run(GCNLayer, x, s, r, w, y, n, args.hidden, args.steps)
    t_gat = run(GATLayer, x, s, r, w, y, n, args.hidden, args.steps)
    print(f"graph: {n} nodes, {e} directed edges; 2-layer h={args.hidden}, "
          f"torch {torch.__version__} CPU ({torch.get_num_threads()} thr)")
    print(f"GCN step: {t_gcn*1e3:8.1f} ms   ({e/t_gcn/1e6:6.1f} M edges/s)")
    print(f"GAT step: {t_gat*1e3:8.1f} ms   ({e/t_gat/1e6:6.1f} M edges/s)")
    print(f"GAT/GCN cost ratio: {t_gat/t_gcn:.2f}x")


if __name__ == "__main__":
    main()
