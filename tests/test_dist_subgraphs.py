"""Subgraph-axis data parallelism: parity with the single-device GD step."""

import numpy as np
import jax
import pytest

from fitgnn_tpu.data.synthetic import sbm_graph
from fitgnn_tpu.data.splits import splits_classification
from fitgnn_tpu.partition import coarsen_and_partition
from fitgnn_tpu.parallel import make_mesh
from fitgnn_tpu.parallel.dist_subgraphs import (
    pad_batch_to_shards, make_dist_gs_train_step, make_dist_gs_eval_step,
)
from fitgnn_tpu.models import NodeModel
from fitgnn_tpu.train import steps


def make_setup(seed=0):
    x, s, r, y = sbm_graph(num_nodes=300, num_classes=3, num_features=16,
                           p_in=0.08, p_out=0.01, seed=seed)
    train, val, test = splits_classification(y, 3, "random", seed=seed)
    ds = coarsen_and_partition(
        x, s, r, y, reduction=0.5, method="heavy_edge", mode="extra_node",
        task="classification", num_classes=3,
        train_mask=train, val_mask=val, test_mask=test, seed=seed)
    model = NodeModel(layer_name="GCNConv", hidden=16, num_layers=2,
                      out_dim=3)
    g0 = ds.subgraphs.subgraph(0)
    state = steps.create_state(model, jax.random.PRNGKey(0), g0.x, g0)
    return ds, state


class TestDistSubgraphs:
    def test_eval_matches_single_device(self):
        ds, state = make_setup()
        mesh = make_mesh(8)
        batch = pad_batch_to_shards(ds.subgraphs, 8)
        eval_step = make_dist_gs_eval_step(mesh, batch, "classification",
                                           split="test")
        with mesh:
            dl, dm = eval_step(state, batch)
        sl, sm = steps.gs_eval_step(state, ds.subgraphs, "classification",
                                    split="test")
        np.testing.assert_allclose(float(dl), float(sl), rtol=1e-5)
        np.testing.assert_allclose(float(dm), float(sm), rtol=1e-5)

    def test_training_learns(self):
        ds, state = make_setup()
        mesh = make_mesh(8)
        batch = pad_batch_to_shards(ds.subgraphs, 8)
        train_step = make_dist_gs_train_step(mesh, batch, "classification")
        eval_step = make_dist_gs_eval_step(mesh, batch, "classification",
                                           split="test")
        with mesh:
            losses = []
            for i in range(40):
                state, loss = train_step(state, batch,
                                         jax.random.PRNGKey(100 + i))
                losses.append(float(loss))
            _, acc = eval_step(state, batch)
        assert losses[-1] < losses[0]
        assert float(acc) > 0.5, float(acc)
