"""Products-path smoke test at reduced scale: Leiden proxy → community
placement → coarsen/partition → a few training epochs (the ogbn-products
flow of reference main.py:247-267 end-to-end, on CPU)."""

import numpy as np
import pytest

from fitgnn_tpu.data.synthetic import sbm_graph
from fitgnn_tpu.data.splits import splits_classification
from fitgnn_tpu.partition import coarsen_and_partition
from fitgnn_tpu.partition.community import (
    leiden_communities, merge_communities, community_order,
)
from fitgnn_tpu.train import NodeTaskConfig, run_node_task


@pytest.mark.slow
def test_products_pipeline_smoke():
    n = 20_000
    rng = np.random.default_rng(0)
    e = n * 6
    rcv = rng.integers(0, n, e)
    comm = rcv // 200
    snd = np.where(rng.random(e) < 0.85,
                   comm * 200 + rng.integers(0, 200, e),
                   rng.integers(0, n, e))
    keep = snd != rcv
    snd, rcv = snd[keep], rcv[keep]
    x = rng.standard_normal((n, 32)).astype(np.float32)
    y = (comm_label := (np.arange(n) // 200) % 5).astype(np.int64)

    # community proxy (cap below n forces merging)
    labels = leiden_communities(snd, rcv, n, seed=0)
    keep_nodes = merge_communities(labels, cap=15_000)
    assert 0 < len(keep_nodes) <= 15_000
    lookup = np.full(n, -1, dtype=np.int64)
    lookup[keep_nodes] = np.arange(len(keep_nodes))
    sel = (lookup[snd] >= 0) & (lookup[rcv] >= 0)
    x2, y2 = x[keep_nodes], y[keep_nodes]
    s2, r2 = lookup[snd[sel]], lookup[rcv[sel]]
    m = len(keep_nodes)

    train, val, test = splits_classification(y2, 5, "ogbn_split", seed=0)
    ds = coarsen_and_partition(
        x2, s2, r2, y2, reduction=0.5, method="heavy_edge", mode="plain",
        task="classification", num_classes=5,
        train_mask=train, val_mask=val, test_mask=test)
    assert ds.num_metanodes < m
    cfg = NodeTaskConfig(layer_name="GCNConv", hidden=16, num_layers=2,
                         out_dim=5, exp_setup="Gc_train_2_Gs_infer",
                         epochs1=5, runs=1, seed=0)
    res = run_node_task(cfg, ds.coarse, ds.subgraphs)
    assert np.isfinite(res.runs[0].test_loss)
