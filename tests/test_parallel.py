"""Multi-device tests on the virtual 8-CPU mesh (SURVEY §4c):
sharded forward/step must match the single-device computation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fitgnn_tpu.data.synthetic import sbm_graph
from fitgnn_tpu.data.splits import splits_classification
from fitgnn_tpu.parallel import (
    make_mesh, shard_graph, DistNodeModel, create_dist_state,
    make_dist_train_step, make_dist_eval_step,
)
from fitgnn_tpu.graph import build_graph
from fitgnn_tpu.models import NodeModel


def make_data(n=256, classes=3, seed=0):
    x, s, r, y = sbm_graph(num_nodes=n, num_classes=classes, num_features=16,
                           p_in=0.08, p_out=0.01, seed=seed)
    train, val, test = splits_classification(y, classes, "random", seed=seed)
    return x, s, r, y, train, val, test


class TestShardGraph:
    def test_shapes_and_cover(self):
        x, s, r, y, train, val, test = make_data()
        sg = shard_graph(x, s, r, y, 8, train_mask=train, val_mask=val,
                         test_mask=test)
        assert sg.num_shards == 8
        assert sg.num_nodes_global >= 256
        # every real node's features present exactly once
        flat = np.asarray(sg.x).reshape(-1, 16)
        np.testing.assert_allclose(flat[:256], x)

    def test_edge_weights_match_global_norm(self):
        # row sums of the sharded normalized adjacency == single-graph build
        x, s, r, y, *_ = make_data(n=64)
        sg = shard_graph(x, s, r, y, 4)
        g = build_graph(x, s, r)
        # total edge weight must match (same normalization, same edges)
        np.testing.assert_allclose(
            float(jnp.sum(sg.edge_weight)),
            float(jnp.sum(g.edge_weight)), rtol=1e-5)


class TestDistTraining:
    def test_dist_forward_matches_single_device(self):
        """Sharded GCN forward == single-device NodeModel forward with the
        same (transferred) params — the activation-parity gate."""
        x, s, r, y, train, val, test = make_data(n=256, classes=3)
        mesh = make_mesh(8)
        sg = shard_graph(x, s, r, y, 8, train_mask=train, val_mask=val,
                         test_mask=test)
        model = DistNodeModel(hidden=16, num_layers=2, out_dim=3)
        state = create_dist_state(model, jax.random.PRNGKey(0), sg)

        eval_step = make_dist_eval_step(mesh, model, split="test")
        with mesh:
            dist_loss, dist_acc = eval_step(state, sg)

        # single-device reference with identical params (plain pytree copy —
        # the param trees mirror by construction)
        g = build_graph(x, s, r, y=y, test_mask=test)
        single = NodeModel(layer_name="GCNConv", hidden=16, num_layers=2,
                           out_dim=3)
        out = single.apply(state.params, g.x, g)
        m = np.asarray(g.test_mask)
        yy = np.asarray(g.y)
        lp = np.asarray(out)
        ref_loss = -lp[np.arange(len(yy)), yy][m].mean()
        ref_acc = (lp.argmax(-1) == yy)[m].mean()
        np.testing.assert_allclose(float(dist_loss), ref_loss, rtol=1e-4)
        np.testing.assert_allclose(float(dist_acc), ref_acc, rtol=1e-5)

    def test_dist_training_learns(self):
        x, s, r, y, train, val, test = make_data(n=256, classes=3)
        mesh = make_mesh(8)
        sg = shard_graph(x, s, r, y, 8, train_mask=train, val_mask=val,
                         test_mask=test)
        model = DistNodeModel(hidden=32, num_layers=2, out_dim=3)
        state = create_dist_state(model, jax.random.PRNGKey(0), sg)
        train_step = make_dist_train_step(mesh, model)
        eval_step = make_dist_eval_step(mesh, model, split="test")
        with mesh:
            losses = []
            for i in range(30):
                state, loss = train_step(state, sg,
                                         jax.random.PRNGKey(100 + i))
                losses.append(float(loss))
            _, acc = eval_step(state, sg)
        assert losses[-1] < losses[0]
        assert float(acc) > 0.5, float(acc)

    def test_params_replicated_after_steps(self):
        x, s, r, y, train, val, test = make_data(n=128, classes=3)
        mesh = make_mesh(4)
        sg = shard_graph(x, s, r, y, 4, train_mask=train)
        model = DistNodeModel(hidden=8, num_layers=1, out_dim=3)
        state = create_dist_state(model, jax.random.PRNGKey(0), sg)
        train_step = make_dist_train_step(mesh, model)
        with mesh:
            state, _ = train_step(state, sg, jax.random.PRNGKey(1))
        # all leaves finite
        for leaf in jax.tree_util.tree_leaves(state.params):
            assert np.all(np.isfinite(np.asarray(leaf)))
