"""Fused Gc phase (one lax.scan over epochs) must match the per-epoch
dispatch loop: same optimizer trajectory, same best-val tracking."""

import numpy as np
import jax
import jax.numpy as jnp

from fitgnn_tpu.models import NodeModel
from fitgnn_tpu.train import NodeTaskConfig, run_node_task
from fitgnn_tpu.train import steps

from test_train import make_dataset


def test_scan_matches_per_epoch_loop():
    ds = make_dataset()
    g = ds.coarse.graph
    model = NodeModel(layer_name="GCNConv", hidden=16, num_layers=2,
                      out_dim=4)
    rng = jax.random.PRNGKey(0)
    state0 = steps.create_state(model, rng, g.x, g)
    n_epochs = 12
    epoch_rngs = jax.random.split(jax.random.PRNGKey(7), n_epochs)

    # reference: explicit per-epoch dispatch loop with the same rng stream
    st = state0
    best_val = np.inf
    best_params = st.params
    tr_ref, vl_ref = [], []
    for e in range(n_epochs):
        st, tl = steps.gc_train_step(st, g, ds.coarse.y_train,
                                     ds.coarse.train_mask, epoch_rngs[e],
                                     "classification")
        vl, _ = steps.gc_eval_step(st, g, ds.coarse.y_val,
                                   ds.coarse.val_mask, "classification")
        tr_ref.append(float(tl))
        vl_ref.append(float(vl))
        if float(vl) < best_val:
            best_val = float(vl)
            best_params = st.params

    st2, bp, bv, tr, vl = steps.gc_train_epochs_scan(
        state0, g, ds.coarse.y_train, ds.coarse.train_mask,
        ds.coarse.y_val, ds.coarse.val_mask, jax.random.PRNGKey(7),
        n_epochs, "classification")

    np.testing.assert_allclose(np.asarray(tr), tr_ref, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(vl), vl_ref, rtol=2e-4)
    np.testing.assert_allclose(float(bv), best_val, rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(bp),
                    jax.tree_util.tree_leaves(best_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st2.params),
                    jax.tree_util.tree_leaves(st.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_fused_epochs_end_to_end():
    ds = make_dataset()
    cfg = NodeTaskConfig(
        layer_name="GCNConv", hidden=32, num_layers=2, out_dim=4,
        exp_setup="Gc_train_2_Gs_infer", epochs1=40, runs=1, seed=0,
        fused_epochs=True)
    res = run_node_task(cfg, ds.coarse, ds.subgraphs)
    assert res.runs[0].test_acc > 0.5
