"""Inference-latency benchmark — the reference's headline metric.

Per-sample protocol (reference ``inference.py:575-688``): sample test nodes,
map each to its owning subgraph via the node→metanode ``parent`` map, time
the subgraph forward; the baseline times a full-graph forward per sampled
node (``inference_baseline.py:355-370``).  On TPU every subgraph in a bucket
shares one compiled executable, so per-sample latency is one dispatch of a
small static-shape program — the "FIT in memory" win the reference gets from
small subgraphs, plus compile-once execution.
"""

from __future__ import annotations

import dataclasses
import time
import jax
import numpy as np

from fitgnn_tpu.graph.container import Graph, SubgraphBatch


@dataclasses.dataclass
class InferenceReport:
    num_test_samples: int
    avg_inf_time: float        # seconds per sample forward
    avg_loss: float
    acc: float


def _sample_nodes(mask: np.ndarray, num_samples: int, seed: int) -> np.ndarray:
    idx = np.where(mask)[0]
    rng = np.random.default_rng(seed)
    if num_samples > len(idx):
        # over-sampling: distribute extra samples across the available nodes
        # (reference inference.py:588-632)
        return rng.choice(idx, size=num_samples, replace=True)
    if num_samples == len(idx):
        return idx
    return rng.choice(idx, size=num_samples, replace=False)


def node_inference_benchmark(
    model, params, batch, parent: np.ndarray,
    test_mask: np.ndarray, y: np.ndarray, num_samples: int = 100,
    classify: bool = True, seed: int = 0,
    subgraph_index: np.ndarray = None,
) -> InferenceReport:
    """Time per-subgraph forwards for sampled test nodes.

    ``batch``: one SubgraphBatch, or a sequence of size-bucketed batches
    with ``subgraph_index[meta] = (bucket, position)`` (the pipeline's
    ``bucket=True`` layout) — one compiled executable per SAMPLED bucket."""
    nodes = _sample_nodes(np.asarray(test_mask, dtype=bool), num_samples, seed)
    sub_of_node = parent[nodes]                      # metanode == subgraph id

    buckets = ((batch,) if isinstance(batch, SubgraphBatch)
               else tuple(batch))
    if subgraph_index is None:
        if len(buckets) > 1:
            raise ValueError(
                "bucketed batches need the pipeline's subgraph_index "
                "(metanode -> (bucket, position)); without it sampled "
                "nodes would map to the wrong subgraphs")
        subgraph_index = np.stack(
            [np.zeros(buckets[0].num_subgraphs, dtype=np.int64),
             np.arange(buckets[0].num_subgraphs, dtype=np.int64)], axis=1)

    fwd = jax.jit(lambda p, x, g: model.apply(p, x, g))
    # warm-up compile per sampled bucket shape (not in the timed loop)
    for b in np.unique(subgraph_index[sub_of_node, 0]):
        g0 = buckets[int(b)].subgraph(0)
        fwd(params, g0.x, g0).block_until_ready()

    origs = [np.asarray(b.orig_idx) for b in buckets]
    times, losses, correct = [], [], 0
    for node, s in zip(nodes, sub_of_node):
        b, pos = (int(subgraph_index[int(s), 0]),
                  int(subgraph_index[int(s), 1]))
        orig = origs[b]
        g = buckets[b].subgraph(pos)
        t0 = time.perf_counter()
        out = fwd(params, g.x, g)
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
        local = int(np.where(orig[pos] == node)[0][0])
        row = np.asarray(out)[local]
        if classify:
            losses.append(-row[int(y[node])])
            correct += int(row.argmax() == y[node])
        else:
            losses.append(abs(float(row[0]) - float(y[node])))
    n = max(len(nodes), 1)
    return InferenceReport(
        num_test_samples=len(nodes),
        avg_inf_time=float(np.mean(times[1:]) if len(times) > 1
                           else np.mean(times)),
        avg_loss=float(np.mean(losses)) if losses else 0.0,
        acc=correct / n if classify else 0.0)


def baseline_inference_benchmark(
    model, params, g: Graph, test_mask: np.ndarray, y: np.ndarray,
    num_samples: int = 100, classify: bool = True, seed: int = 0,
) -> InferenceReport:
    """Full-graph forward per sampled node (the baseline protocol)."""
    nodes = _sample_nodes(np.asarray(test_mask, dtype=bool), num_samples, seed)
    fwd = jax.jit(lambda p, x, gg: model.apply(p, x, gg))
    fwd(params, g.x, g).block_until_ready()

    times, losses, correct = [], [], 0
    for node in nodes:
        t0 = time.perf_counter()
        out = fwd(params, g.x, g)
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
        row = np.asarray(out)[int(node)]
        if classify:
            losses.append(-row[int(y[node])])
            correct += int(row.argmax() == y[node])
        else:
            losses.append(abs(float(row[0]) - float(y[node])))
    n = max(len(nodes), 1)
    return InferenceReport(
        num_test_samples=len(nodes),
        avg_inf_time=float(np.mean(times[1:]) if len(times) > 1
                           else np.mean(times)),
        avg_loss=float(np.mean(losses)) if losses else 0.0,
        acc=correct / n if classify else 0.0)
