"""Calibrate the hard-mode products proxy (VERDICT r4 ask #1).

Sweeps ``feature_sigma`` of ``planted_products_graph`` at small scale and
reports, per σ:

* linear + 2-layer-MLP FEATURE-ONLY probe accuracy (must land ≤ 0.5 so the
  task is not feature-separable — the round-4 proxy failure mode);
* full-graph GCN baseline accuracy (should land well below 1.0 but far
  above the probes — the regime where the reference's ogbn-products
  accuracy story lives, ~0.75-0.85, ``main.py:247-267``).

Run on CPU:  python scripts/hard_proxy_calibrate.py --nodes 50000
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import flax.linen as nn  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def probe_accuracy(x, y, train, test, hidden=0, epochs=200, seed=0,
                   num_classes=47):
    """Feature-only probe: linear softmax (hidden=0) or 2-layer MLP."""
    import optax
    from flax.training import train_state

    class Probe(nn.Module):
        @nn.compact
        def __call__(self, h):
            if hidden:
                h = nn.relu(nn.Dense(hidden)(h))
            return nn.Dense(num_classes)(h)

    model = Probe()
    params = model.init(jax.random.PRNGKey(seed), x[:2])
    state = train_state.TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adam(1e-2))
    xt, yt = jnp.asarray(x[train]), jnp.asarray(y[train])

    @jax.jit
    def step(state):
        def loss_fn(p):
            logits = model.apply(p, xt)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yt).mean()
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    for _ in range(epochs):
        state, loss = step(state)
    pred = np.asarray(model.apply(state.params, jnp.asarray(x[test]))
                      ).argmax(-1)
    return float((pred == y[test]).mean())


def gcn_accuracy(x, s, r, y, train, val, test, num_classes, hidden=128,
                 epochs=100, seed=0):
    from fitgnn_tpu.graph import build_graph
    from fitgnn_tpu.models import NodeModel
    from fitgnn_tpu.train import steps

    g = build_graph(x, s, r, y=y, train_mask=train, val_mask=val,
                    test_mask=test)
    model = NodeModel(layer_name="GCNConv", hidden=hidden, num_layers=2,
                      out_dim=num_classes)
    state = steps.create_state(model, jax.random.PRNGKey(seed), g.x, g)
    yj, trj, vaj, tej = g.y, g.train_mask, g.val_mask, g.test_mask
    best_val, best_test = -1.0, 0.0
    for ep in range(epochs):
        state, _ = steps.gc_train_step(state, g, yj, trj,
                                       jax.random.PRNGKey(1000 + ep),
                                       "classification")
        if ep % 5 == 4:
            _, va = steps.gc_eval_step(state, g, yj, vaj, "classification")
            _, te = steps.gc_eval_step(state, g, yj, tej, "classification")
            if float(va) > best_val:
                best_val, best_test = float(va), float(te)
    return best_test


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=50_000)
    ap.add_argument("--sigmas", type=float, nargs="+",
                    default=[3.0, 4.0, 5.0, 6.0])
    ap.add_argument("--label_noise", type=float, default=0.1)
    ap.add_argument("--epochs", type=int, default=100)
    args = ap.parse_args()

    from fitgnn_tpu.data.splits import splits_classification
    from fitgnn_tpu.data.synthetic import planted_products_graph

    print(f"{'sigma':>6} {'linear':>7} {'mlp':>7} {'gcn':>7}  "
          f"(n={args.nodes}, label_noise={args.label_noise})")
    for sigma in args.sigmas:
        x, s, r, y = planted_products_graph(
            args.nodes, feature_sigma=sigma, label_noise=args.label_noise,
            seed=0)
        train, val, test = splits_classification(y, 47, "ogbn_split", seed=0)
        lin = probe_accuracy(x, y, train, test, hidden=0)
        mlp = probe_accuracy(x, y, train, test, hidden=256)
        gcn = gcn_accuracy(x, s, r, y, train, val, test, 47,
                           epochs=args.epochs)
        print(f"{sigma:6.1f} {lin:7.4f} {mlp:7.4f} {gcn:7.4f}", flush=True)


if __name__ == "__main__":
    main()
