"""Per-layer activation parity against an independent torch implementation
of the reference's layer semantics (BASELINE north star: activations
allclose to the PyG reference; PyG itself is not installed, so the oracle is
a from-scratch torch implementation of the same math on shared weights)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fitgnn_tpu.graph import build_graph  # noqa: E402
from fitgnn_tpu.models import GCNConv, SAGEConv, GINConv, NodeModel  # noqa: E402


def graph_fixture(rng, n=40, f=12):
    senders, receivers = [], []
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < 0.15:
                senders.append(i)
                receivers.append(j)
    x = rng.normal(size=(n, f)).astype(np.float32)
    return x, np.array(senders), np.array(receivers)


def torch_gcn_forward(x, senders, receivers, w, b):
    """PyG GCNConv semantics: Â·(X·W)+b with Â = D^-1/2 (A+I) D^-1/2."""
    n = x.shape[0]
    a = torch.zeros((n, n))
    a[receivers, senders] = 1.0
    a[senders, receivers] = 1.0
    a += torch.eye(n)
    d = a.sum(1)
    dinv = d.pow(-0.5)
    a_norm = dinv[:, None] * a * dinv[None, :]
    return a_norm @ (x @ w) + b


class TestTorchParity:
    def test_gcn_layer_activations(self, rng):
        x, s, r = graph_fixture(rng)
        g = build_graph(x, s, r)
        layer = GCNConv(features=8)
        params = layer.init(jax.random.PRNGKey(0), g.x, g)
        ours = np.asarray(layer.apply(params, g.x, g))[: x.shape[0]]

        w = torch.tensor(np.asarray(params["params"]["lin"]["kernel"]))
        b = torch.tensor(np.asarray(params["params"]["bias"]))
        ref = torch_gcn_forward(torch.tensor(x), torch.tensor(s),
                                torch.tensor(r), w, b).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_two_layer_stack_activations(self, rng):
        """Full model forward (ELU between layers, log_softmax head)."""
        x, s, r = graph_fixture(rng)
        g = build_graph(x, s, r)
        model = NodeModel(layer_name="GCNConv", hidden=8, num_layers=2,
                          out_dim=3)
        params = model.init(jax.random.PRNGKey(1), g.x, g)
        ours = np.asarray(model.apply(params, g.x, g))[: x.shape[0]]

        p = params["params"]
        h = torch_gcn_forward(
            torch.tensor(x), torch.tensor(s), torch.tensor(r),
            torch.tensor(np.asarray(p["convs"]["GCNConv_0"]["lin"]["kernel"])),
            torch.tensor(np.asarray(p["convs"]["GCNConv_0"]["bias"])))
        h = torch.nn.functional.elu(h)
        h = torch_gcn_forward(
            torch.tensor(np.asarray(h)), torch.tensor(s), torch.tensor(r),
            torch.tensor(np.asarray(p["convs"]["GCNConv_1"]["lin"]["kernel"])),
            torch.tensor(np.asarray(p["convs"]["GCNConv_1"]["bias"])))
        h = torch.nn.functional.elu(h)
        h = h @ torch.tensor(np.asarray(p["head"]["kernel"])) + \
            torch.tensor(np.asarray(p["head"]["bias"]))
        ref = torch.log_softmax(h, dim=1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    def test_sage_layer_activations(self, rng):
        x, s, r = graph_fixture(rng)
        g = build_graph(x, s, r, normalize=False)
        layer = SAGEConv(features=8)
        params = layer.init(jax.random.PRNGKey(2), g.x, g)
        ours = np.asarray(layer.apply(params, g.x, g))[: x.shape[0]]

        n = x.shape[0]
        a = torch.zeros((n, n))
        a[torch.tensor(r), torch.tensor(s)] = 1.0
        a[torch.tensor(s), torch.tensor(r)] = 1.0
        deg = a.sum(1).clamp(min=1.0)
        mean_neigh = (a @ torch.tensor(x)) / deg[:, None]
        p = params["params"]
        ref = (mean_neigh @ torch.tensor(np.asarray(p["lin_l"]["kernel"]))
               + torch.tensor(np.asarray(p["lin_l"]["bias"]))
               + torch.tensor(x) @ torch.tensor(
                   np.asarray(p["lin_r"]["kernel"]))).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_gin_layer_activations(self, rng):
        x, s, r = graph_fixture(rng)
        g = build_graph(x, s, r, normalize=False)
        layer = GINConv(features=8)
        params = layer.init(jax.random.PRNGKey(3), g.x, g)
        ours = np.asarray(layer.apply(params, g.x, g))[: x.shape[0]]

        n = x.shape[0]
        a = torch.zeros((n, n))
        a[torch.tensor(r), torch.tensor(s)] = 1.0
        a[torch.tensor(s), torch.tensor(r)] = 1.0
        p = params["params"]
        eps = float(np.asarray(p["eps"]))
        h = (1 + eps) * torch.tensor(x) + a @ torch.tensor(x)
        h = torch.relu(h @ torch.tensor(np.asarray(p["mlp_0"]["kernel"]))
                       + torch.tensor(np.asarray(p["mlp_0"]["bias"])))
        h = torch.relu(h @ torch.tensor(np.asarray(p["mlp_1"]["kernel"]))
                       + torch.tensor(np.asarray(p["mlp_1"]["bias"])))
        np.testing.assert_allclose(ours, h.numpy(), rtol=1e-4, atol=1e-5)

    def test_gat_narrow_side_expanding_layer(self, rng):
        """Single-head EXPANDING GAT layer (F_in < C) takes the narrow-side
        aggregation path (Σ α·x)·W with scores x·(W·a); it must match the
        torch oracle computed with the standard wide formula Σ α·(X·W)."""
        from fitgnn_tpu.models import GATConv

        x, s, r = graph_fixture(rng)                  # F_in = 12
        c = 24                                        # expanding: 12 -> 24
        g = build_graph(x, s, r, normalize=False)
        layer = GATConv(features=c, heads=1)
        params = layer.init(jax.random.PRNGKey(7), g.x, g)
        ours = np.asarray(layer.apply(params, g.x, g))[: x.shape[0]]

        p = params["params"]
        n = x.shape[0]
        w = torch.tensor(np.asarray(p["lin"]["kernel"]))      # (F, C)
        a_src = torch.tensor(np.asarray(p["att_src"]))[0]     # (C,)
        a_dst = torch.tensor(np.asarray(p["att_dst"]))[0]
        bias = torch.tensor(np.asarray(p["bias"]))
        es, er = [], []
        for u, v in zip(s, r):
            es += [u, v]
            er += [v, u]
        es += list(range(n))
        er += list(range(n))
        es, er = torch.tensor(es), torch.tensor(er)
        h = torch.tensor(x) @ w                               # wide formula
        e = torch.nn.functional.leaky_relu(
            (h * a_src).sum(-1)[es] + (h * a_dst).sum(-1)[er],
            negative_slope=0.2)
        out = torch.zeros(n, c)
        for node in range(n):
            sel = er == node
            a_ = torch.softmax(e[sel], dim=0)
            out[node] = (a_[:, None] * h[es[sel]]).sum(0)
        np.testing.assert_allclose(ours, (out + bias).numpy(),
                                   rtol=1e-4, atol=1e-5)

    def test_gat_layer_activations_and_attention(self, rng):
        """GAT parity: attention coefficients AND output vs a from-scratch
        torch implementation of PyG GATConv semantics (additive attention,
        LeakyReLU(0.2), softmax over incoming edges incl. self loops)."""
        from fitgnn_tpu.models import GATConv
        from fitgnn_tpu.ops.sddmm import gather_concat_score
        from fitgnn_tpu.ops.segment import segment_softmax

        x, s, r = graph_fixture(rng)
        heads, c = 2, 6
        g = build_graph(x, s, r, normalize=False)
        layer = GATConv(features=c, heads=heads)
        params = layer.init(jax.random.PRNGKey(4), g.x, g)
        ours = np.asarray(layer.apply(params, g.x, g))[: x.shape[0]]

        p = params["params"]
        n = x.shape[0]
        w = torch.tensor(np.asarray(p["lin"]["kernel"]))       # (F, H*C)
        a_src = torch.tensor(np.asarray(p["att_src"]))         # (H, C)
        a_dst = torch.tensor(np.asarray(p["att_dst"]))
        bias = torch.tensor(np.asarray(p["bias"]))

        # undirected edge set + self loops, matching build_graph
        es, er = [], []
        for u, v in zip(s, r):
            es += [u, v]
            er += [v, u]
        es += list(range(n))
        er += list(range(n))
        es, er = torch.tensor(es), torch.tensor(er)

        h = (torch.tensor(x) @ w).reshape(n, heads, c)
        score_src = (h * a_src).sum(-1)                        # (N, H)
        score_dst = (h * a_dst).sum(-1)
        e = torch.nn.functional.leaky_relu(
            score_src[es] + score_dst[er], negative_slope=0.2)  # (E, H)
        alpha = torch.zeros_like(e)
        out = torch.zeros(n, heads, c)
        for head in range(heads):
            for node in range(n):
                sel = er == node
                a_ = torch.softmax(e[sel, head], dim=0)
                alpha[sel, head] = a_
                out[node, head] = (a_[:, None] * h[es[sel], head]).sum(0)
        ref = out.reshape(n, heads * c) + bias

        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-5)

        # attention-coefficient parity on the framework's own edge order
        score_src_j = jnp.sum(
            jnp.asarray(np.asarray(h.numpy())) * jnp.asarray(a_src.numpy()),
            axis=-1)
        score_dst_j = jnp.sum(
            jnp.asarray(np.asarray(h.numpy())) * jnp.asarray(a_dst.numpy()),
            axis=-1)
        ej = gather_concat_score(g.senders, g.receivers,
                                 score_src_j, score_dst_j)
        ej = jax.nn.leaky_relu(ej, negative_slope=0.2)
        alpha_ours = segment_softmax(ej, g.receivers, g.num_nodes_padded,
                                     mask=g.edge_mask)
        # compare per-edge against the torch coefficients via an edge map
        torch_alpha = {}
        for i in range(len(es)):
            torch_alpha[(int(es[i]), int(er[i]))] = alpha[i].numpy()
        gs_, gr_ = np.asarray(g.senders), np.asarray(g.receivers)
        ne = int(g.n_edge)
        for i in range(ne):
            np.testing.assert_allclose(
                np.asarray(alpha_ours)[i],
                torch_alpha[(int(gs_[i]), int(gr_[i]))],
                rtol=1e-4, atol=1e-5)
