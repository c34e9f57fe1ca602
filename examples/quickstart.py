"""End-to-end walkthrough of the fitgnn-tpu API on synthetic data.

Covers the full FIT-GNN pipeline: coarsen → partition (halo subgraphs) →
coarse pre-training → subgraph fine-tuning → per-subgraph inference latency
vs the full-graph baseline — everything the reference's five entry points do,
in ~60 lines of library calls.

Run: python examples/quickstart.py          (CPU or TPU)
"""

import numpy as np
import jax

from fitgnn_tpu.data.synthetic import sbm_graph
from fitgnn_tpu.data.splits import splits_classification
from fitgnn_tpu.partition import coarsen_and_partition
from fitgnn_tpu.models import NodeModel
from fitgnn_tpu.train import NodeTaskConfig, run_node_task
from fitgnn_tpu.graph import build_graph
from fitgnn_tpu.bench.inference import (
    node_inference_benchmark, baseline_inference_benchmark,
)


def main():
    # 1. data (synthetic SBM standing in for cora — no egress here)
    x, senders, receivers, y = sbm_graph(
        num_nodes=600, num_classes=4, num_features=64, seed=0)
    train, val, test = splits_classification(y, 4, "random", seed=0)

    # 2. coarsen + partition (extra_node = 1-hop halo subgraphs)
    ds = coarsen_and_partition(
        x, senders, receivers, y,
        reduction=0.5, method="variation_neighborhoods", mode="extra_node",
        task="classification", num_classes=4,
        train_mask=train, val_mask=val, test_mask=test)
    print(f"coarse graph: {ds.num_metanodes} metanodes; "
          f"{ds.subgraphs.num_subgraphs} subgraphs "
          f"(≤{ds.subgraphs.num_nodes_padded} nodes each)")

    # 3. train: coarse pre-training then subgraph fine-tuning
    cfg = NodeTaskConfig(
        layer_name="GCNConv", hidden=64, num_layers=2, out_dim=4,
        exp_setup="Gc_train_2_Gs_train", epochs1=50, epochs2=50, runs=1)
    result = run_node_task(cfg, ds.coarse, ds.subgraphs, verbose=True)
    print("summary:", {k: round(v, 4)
                       for k, v in result.summary.items()})

    # 4. inference latency: per-subgraph vs full graph
    model = NodeModel(layer_name="GCNConv", hidden=64, num_layers=2,
                      out_dim=4)
    g0 = ds.subgraphs.subgraph(0)
    params = model.init(jax.random.PRNGKey(0), g0.x, g0)
    rep = node_inference_benchmark(model, params, ds.subgraphs, ds.parent,
                                   test, y, num_samples=20)
    g_full = build_graph(x, senders, receivers)
    base = baseline_inference_benchmark(model, params, g_full, test, y,
                                        num_samples=20)
    print(f"per-sample latency: subgraph {rep.avg_inf_time*1e3:.2f} ms vs "
          f"full graph {base.avg_inf_time*1e3:.2f} ms")


if __name__ == "__main__":
    main()
