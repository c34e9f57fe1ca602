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
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--features", type=int, default=32)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--p_in", type=float, default=0.02)
    ap.add_argument("--p_out", type=float, default=0.002)
    ap.add_argument("--noise", type=float, default=2.5)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401
    from fitgnn_tpu.data.synthetic import sbm_graph
    from fitgnn_tpu.graph import build_graph
    from fitgnn_tpu.graph.optimize import build_optimized_graph
    from fitgnn_tpu.models import NodeModel
    from fitgnn_tpu.train import steps

    x, s, r, y = sbm_graph(num_nodes=args.nodes, num_classes=args.classes,
                           num_features=args.features, p_in=args.p_in,
                           p_out=args.p_out, feature_noise=args.noise,
                           seed=0)
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
                              out_dim=args.classes, layer_name="GATConv")
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

    def hybrid(K=0, thresh=24):
        def b():
            g, _ = build_optimized_graph(
                x, s, r, y=y, train_mask=train, val_mask=val,
                test_mask=test, layer_name="GATConv",
                min_block_edges=thresh, cluster_att=K, seed=0)
            if K:
                n_strag = int(np.asarray(g.aux.cluster_count).sum())
            else:
                n_strag = int((np.asarray(g.aux.weights) > 0).sum())
            b.info = (f"{0 if g.aux.bsr is None else g.aux.bsr.nnz_blocks} "
                      f"tiles, {n_strag} straggler edges"
                      + (f" -> (N,{g.aux.num_nodes // K}) summary block"
                         if K else " (exact per-edge)"))
            return g
        return b

    t0 = time.time()
    rows = [("plain per-edge (exact)", run(plain), "")]
    for name, K in (("hybrid tiles (exact)", 0),
                    ("cluster_att K=256", 256),
                    ("cluster_att K=512", 512),
                    ("cluster_att K=1024", 1024)):
        b = hybrid(K)
        rows.append((name, run(b), b.info))
    print(f"\n=== GAT cluster-attention accuracy (n={args.nodes}, "
          f"{args.runs} runs x {args.epochs} epochs, {time.time()-t0:.0f}s)"
          f" ===")
    for name, (m, sd), info in rows:
        print(f"  {name:<28s} {m:.4f} +/- {sd:.4f}   {info}")


if __name__ == "__main__":
    main()
