"""Integration matrix: every layer type × node mode trains end-to-end."""

import numpy as np
import pytest

from fitgnn_tpu.data.synthetic import sbm_graph
from fitgnn_tpu.data.splits import splits_classification
from fitgnn_tpu.partition import coarsen_and_partition
from fitgnn_tpu.train import NodeTaskConfig, run_node_task

LAYERS = ["GCNConv", "GATConv", "SAGEConv", "GINConv"]
MODES = ["plain", "extra_node", "cluster_node"]


@pytest.fixture(scope="module")
def datasets():
    x, s, r, y = sbm_graph(num_nodes=150, num_classes=3, num_features=12,
                           p_in=0.1, p_out=0.01, seed=0)
    train, val, test = splits_classification(y, 3, "random", seed=0)
    out = {}
    for mode in MODES:
        out[mode] = coarsen_and_partition(
            x, s, r, y, reduction=0.5, method="heavy_edge", mode=mode,
            task="classification", num_classes=3,
            train_mask=train, val_mask=val, test_mask=test)
    return out


@pytest.mark.parametrize("layer", LAYERS)
@pytest.mark.parametrize("mode", MODES)
def test_layer_mode_combination(datasets, layer, mode):
    ds = datasets[mode]
    cfg = NodeTaskConfig(
        layer_name=layer, hidden=8, num_layers=2, out_dim=3,
        exp_setup="Gc_train_2_Gs_train", epochs1=3, epochs2=3, runs=1,
        seed=0)
    res = run_node_task(cfg, ds.coarse, ds.subgraphs)
    assert np.isfinite(res.runs[0].test_loss), (layer, mode)
    assert 0.0 <= res.runs[0].test_acc <= 1.0
