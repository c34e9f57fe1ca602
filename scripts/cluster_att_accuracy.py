"""Accuracy A/B for GAT cluster-factorized attention (--cluster_attention).

Full-graph GAT node classification on a community SBM large enough that
real straggler edges exist (the approximation only touches those): exact
per-edge GAT (plain + hybrid-tile paths — both exact) vs cluster-summary
attention at several cluster sizes.  The question the numbers answer: how
much test accuracy does collapsing remote per-edge attention onto cluster
summaries cost, at the graph scale where it buys step time?

Usage: python scripts/cluster_att_accuracy.py [--nodes 4096] [--runs 3]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=4096)
    ap.add_argument("--classes", type=int, default=32)
    ap.add_argument("--features", type=int, default=32)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--p_in", type=float, default=0.3)
    ap.add_argument("--p_out", type=float, default=0.002)
    ap.add_argument("--noise", type=float, default=2.5)
    ap.add_argument("--thresh", type=int, default=192)
    ap.add_argument("--cluster_sizes", type=int, nargs="+",
                    default=[128, 512, 1024])
    ap.add_argument("--exact_ks", type=int, nargs="+", default=[],
                    help="hybrid exact/summary frontier: for each k, the "
                         "top-k straggler senders keep per-edge attention "
                         "(cluster_att_exact) at the FIRST cluster size")
    ap.add_argument("--mode", choices=("sbm", "homophilous", "hubs"),
                    default="homophilous",
                    help="sbm: inter-community edges are uniformly random "
                         "(adversarial for summaries — per-edge "
                         "discrimination is exactly what the mode trades "
                         "away); homophilous: inter edges prefer "
                         "same-class communities (edge homophily ~0.8, "
                         "the ogbn regime)")
    ap.add_argument("--homophily", type=float, default=0.8)
    ap.add_argument("--layer", default="GATConv",
                    choices=("GATConv", "GCNConv", "SAGEConv", "GINConv"),
                    help="GATConv measures --cluster_attention; the "
                         "static layers measure --cluster_aggregation "
                         "(same collapse, summed weights instead of "
                         "attention counts)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401
    from fitgnn_tpu.data.synthetic import sbm_graph
    from fitgnn_tpu.graph import build_graph
    from fitgnn_tpu.graph.optimize import build_optimized_graph
    from fitgnn_tpu.models import NodeModel
    from fitgnn_tpu.train import steps

    if args.mode == "sbm":
        x, s, r, y = sbm_graph(num_nodes=args.nodes,
                               num_classes=args.classes,
                               num_features=args.features, p_in=args.p_in,
                               p_out=args.p_out, feature_noise=args.noise,
                               seed=0)
    elif args.mode == "homophilous":
        # ogbn-like: 128-node communities, several communities per class,
        # inter-community edges homophilous (same-class community with
        # prob --homophily) — the regime the mode is built for
        rng0 = np.random.default_rng(0)
        n, comm = args.nodes, 128
        ncomm = n // comm
        comm_class = rng0.integers(0, args.classes, ncomm)
        node_comm = np.arange(n) // comm
        y = comm_class[node_comm].astype(np.int32)
        e_in = n * 10
        s_i = rng0.integers(0, n, e_in)
        r_i = (s_i // comm) * comm + rng0.integers(0, comm, e_in)
        e_out = n * 2
        r_o = rng0.integers(0, n, e_out)
        rand_comm = rng0.integers(0, ncomm, e_out)
        same_class = [np.nonzero(comm_class == c)[0] for c in
                      range(args.classes)]
        pick = np.array([same_class[comm_class[node_comm[v]]][
            rng0.integers(0, len(same_class[comm_class[node_comm[v]]]))]
            for v in r_o])
        use_homo = rng0.random(e_out) < args.homophily
        s_comm = np.where(use_homo, pick, rand_comm)
        s_o = s_comm * comm + rng0.integers(0, comm, e_out)
        s = np.concatenate([s_i, s_o])
        r = np.concatenate([r_i, r_o])
        keep = s != r
        s, r = s[keep].astype(np.int32), r[keep].astype(np.int32)
        means = rng0.normal(scale=2.0, size=(args.classes, args.features))
        coff = rng0.normal(scale=0.5, size=(ncomm, args.features))
        x = (means[y] + coff[node_comm]
             + args.noise * rng0.normal(size=(n, args.features))
             ).astype(np.float32)
        # shuffle ids: recovering community order is the ingest's job
        perm = rng0.permutation(n)
        inv = np.empty(n, dtype=np.int64)
        inv[perm] = np.arange(n)
        x, y = x[perm], y[perm]
        s, r = inv[s].astype(np.int32), inv[r].astype(np.int32)
    if args.mode == "hubs":
        # remote signal CONCENTRATED in hub senders, hubs OUTSIDE the
        # communities: nodes [0, nh) form a hub region whose clusters mix
        # classes, so a cluster summary washes the per-hub class features
        # out; community-node features carry NO class signal.  The label is
        # recoverable only through the signal edges from same-class hubs —
        # per-edge attention on those edges preserves it, and
        # top-k-by-straggler-degree picks exactly the hubs.
        rng0 = np.random.default_rng(0)
        n, comm = args.nodes, 128
        nh = 8 * args.classes                 # hubs; clusters of 128 mix
        hub_class = (np.arange(nh) % args.classes).astype(np.int32)
        nc_nodes = n - nh
        ncomm = nc_nodes // comm
        comm_class = rng0.integers(0, args.classes, ncomm)
        node_comm = np.arange(nc_nodes) // comm
        y = np.concatenate([hub_class,
                            comm_class[node_comm]]).astype(np.int32)
        body = nh + np.arange(nc_nodes)       # community node ids
        e_in = n * 8
        s_i = body[rng0.integers(0, nc_nodes, e_in)]
        r_i = nh + (s_i - nh) // comm * comm + rng0.integers(0, comm, e_in)
        e_sig = int(n * 1.5)
        r_s = body[rng0.integers(0, nc_nodes, e_sig)]
        # sender: random hub of the receiver's class
        s_s = (rng0.integers(0, 8, e_sig) * args.classes + y[r_s])
        s_s = np.minimum(s_s, nh - 1)
        e_noise = int(n * 1.5)
        r_n = body[rng0.integers(0, nc_nodes, e_noise)]
        s_n = body[rng0.integers(0, nc_nodes, e_noise)]
        s = np.concatenate([s_i, s_s, s_n])
        r = np.concatenate([r_i, r_s, r_n])
        keep = s != r
        s, r = s[keep].astype(np.int32), r[keep].astype(np.int32)
        means = rng0.normal(scale=3.0, size=(args.classes, args.features))
        # community-node features are PURE noise — any community-offset
        # term lets the model memorize community->class from train labels
        # and bypass the hubs entirely
        x = np.concatenate([
            means[hub_class] + 0.3 * rng0.normal(size=(nh, args.features)),
            args.noise
            * rng0.normal(size=(nc_nodes, args.features))]
        ).astype(np.float32)
        perm = rng0.permutation(n)
        inv = np.empty(n, dtype=np.int64)
        inv[perm] = np.arange(n)
        x, y = x[perm], y[perm]
        s, r = inv[s].astype(np.int32), inv[r].astype(np.int32)
    rng = np.random.default_rng(0)
    u = rng.random(args.nodes)
    train = u < 0.3
    val = (u >= 0.3) & (u < 0.5)
    test = u >= 0.5

    def run(build):
        accs = []
        for seed in range(args.runs):
            g = build()
            model = NodeModel(hidden=args.hidden, num_layers=2,
                              out_dim=args.classes,
                              layer_name=args.layer)
            st = steps.create_state(model, jax.random.PRNGKey(seed), g.x, g)
            key = jax.random.PRNGKey(100 + seed)
            for ep in range(args.epochs):
                key, k = jax.random.split(key)
                st, _ = steps.gc_train_step(st, g, g.y, g.train_mask, k,
                                            "classification")
            _, acc = steps.gc_eval_step(st, g, g.y, g.test_mask,
                                        "classification")
            accs.append(float(acc))
        return np.mean(accs), np.std(accs)

    def plain():
        return build_graph(x, s, r, y=y, train_mask=train, val_mask=val,
                           test_mask=test)

    def hybrid(K=0, thresh=None, exact_k=0):
        # defaults mirror the TPU-measured production regime (bench t192):
        # 128-node communities whose intra tiles stay dense, while the
        # scattered inter-community remainder (~15-20 % of edges) rides
        # the summary block
        thresh = args.thresh if thresh is None else thresh
        def b():
            gat = args.layer == "GATConv"
            g, _ = build_optimized_graph(
                x, s, r, y=y, train_mask=train, val_mask=val,
                test_mask=test, layer_name=args.layer,
                min_block_edges=thresh,
                cluster_att=K if gat else 0,
                cluster_att_exact=exact_k if gat else 0,
                cluster_agg=0 if gat else K,
                cluster_agg_exact=0 if gat else exact_k,
                use_segmm=False, seed=0)
            # CPU A/B: route the dense tiles through the XLA einsum branch
            # (semantics identical — tests/test_tile_gat.py gates both);
            # the Pallas dyn-tile kernel runs in interpret mode here and
            # is 100x slower per step
            g = g._replace(aux=g.aux.replace(dyn_plan=None))
            n_exact = int((np.asarray(g.aux.weights) > 0).sum())
            if K and args.layer == "GATConv":
                # float64 cast: the table is bf16 and np.sum would round
                n_coll = int(np.asarray(g.aux.cluster_count,
                                        dtype=np.float64).sum())
            elif K:
                # static table holds weight sums, not counts: the honest
                # unit is nnz (receiver, cluster) table cells
                n_coll = int((np.asarray(g.aux.cluster_count,
                                         dtype=np.float64) > 0).sum())
            else:
                n_coll = 0
            coll_unit = ("collapsed straggler edges"
                         if args.layer == "GATConv"
                         else "collapsed (receiver,cluster) cells")
            b.info = (f"{0 if g.aux.bsr is None else g.aux.bsr.nnz_blocks} "
                      f"tiles, {n_exact} exact straggler edges + "
                      f"{n_coll} {coll_unit}"
                      + (f" -> (N,{g.aux.num_nodes // K}) summary block"
                         if K else ""))
            return g
        return b

    t0 = time.time()
    mode_name = ("cluster_att" if args.layer == "GATConv"
                 else "cluster_agg")
    rows = [("plain per-edge (exact)", run(plain), "")]
    for name, K in ([("hybrid tiles (exact)", 0)]
                    + [(f"{mode_name} K={k}", k)
                       for k in args.cluster_sizes]):
        b = hybrid(K)
        rows.append((name, run(b), b.info))
    for ek in args.exact_ks:
        b = hybrid(args.cluster_sizes[0], exact_k=ek)
        rows.append((f"hybrid split K={args.cluster_sizes[0]} "
                     f"exact_k={ek}", run(b), b.info))
    print(f"\n=== {args.layer} {mode_name} accuracy (n={args.nodes}, "
          f"{args.runs} runs x {args.epochs} epochs, {time.time()-t0:.0f}s)"
          f" ===")
    for name, (m, sd), info in rows:
        print(f"  {name:<28s} {m:.4f} +/- {sd:.4f}   {info}")


if __name__ == "__main__":
    main()
