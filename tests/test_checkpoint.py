"""Orbax checkpoint round-trip: params + optimizer state + step."""

import numpy as np
import jax
import jax.numpy as jnp

from fitgnn_tpu.data.synthetic import sbm_graph
from fitgnn_tpu.graph import build_graph
from fitgnn_tpu.models import NodeModel
from fitgnn_tpu.train.steps import create_state, gc_train_step
from fitgnn_tpu.train.checkpoint import (
    save_checkpoint, restore_checkpoint, save_params, restore_params,
)


def make_state():
    x, s, r, y = sbm_graph(num_nodes=60, num_classes=3, num_features=8,
                           seed=0)
    g = build_graph(x, s, r, y=y)
    model = NodeModel(layer_name="GCNConv", hidden=8, num_layers=1, out_dim=3)
    state = create_state(model, jax.random.PRNGKey(0), g.x, g)
    mask = jnp.asarray(np.arange(g.num_nodes_padded) < 40)
    return state, g, mask


class TestCheckpoint:
    def test_full_state_roundtrip(self, tmp_path):
        state, g, mask = make_state()
        # advance a few steps so opt_state is non-trivial
        for i in range(3):
            state, _ = gc_train_step(state, g, g.y, mask,
                                     jax.random.PRNGKey(i), "classification")
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, state)

        fresh, _, _ = make_state()
        restored = restore_checkpoint(path, fresh)
        assert int(restored.step) == int(state.step)
        for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                        jax.tree_util.tree_leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # resumed training continues identically
        s1, l1 = gc_train_step(state, g, g.y, mask, jax.random.PRNGKey(9),
                               "classification")
        s2, l2 = gc_train_step(restored, g, g.y, mask, jax.random.PRNGKey(9),
                               "classification")
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)

    def test_params_roundtrip(self, tmp_path):
        state, _, _ = make_state()
        path = str(tmp_path / "params")
        save_params(path, state.params)
        back = restore_params(path, state.params)
        for a, b in zip(jax.tree_util.tree_leaves(back),
                        jax.tree_util.tree_leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
