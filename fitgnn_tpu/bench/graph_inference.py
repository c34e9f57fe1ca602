"""Graph-level inference timing (reference ``inference.py`` graph tasks):
per-graph latency through the Gc view and through the Gs subgraph-set view.
"""

from __future__ import annotations

import time
from typing import List

import jax
import numpy as np

from fitgnn_tpu.bench.inference import InferenceReport
from fitgnn_tpu.data.graph_level import GraphSample, collate_graph_level
from fitgnn_tpu.models.models import GraphModel


def graph_inference_benchmark(model: GraphModel, params,
                              samples: List[GraphSample], y: np.ndarray,
                              view: str = "gs", classify: bool = True,
                              seed: int = 0) -> InferenceReport:
    """Time a single-sample forward per graph (Gc or Gs view)."""
    times, losses, correct = [], [], 0
    fwd_gc = jax.jit(lambda p, b: model.apply(p, b.gc.x, b.gc,
                                              b.gc_graph_ids, 1))
    fwd_gs = jax.jit(lambda p, b: model.apply(
        p, b.gs, b.gs_graph_ids, 1, method=GraphModel.forward_subgraphs))

    # bucket by shape signature so each padded shape compiles once; device
    # time (dispatch amortized) measured once per shape, averaged by count
    from fitgnn_tpu.bench.inference import device_seconds_per_call
    dev_times, shape_counts = {}, {}
    fwd = fwd_gc if view == "gc" else fwd_gs
    for i, smp in enumerate(samples):
        b = collate_graph_level([smp])
        sig = tuple(a.shape for a in jax.tree_util.tree_leaves(b))
        if sig not in dev_times:
            if view == "gc":
                fwd_c = lambda c, p, bb: model.apply(  # noqa: E731
                    p, bb.gc.x + c, bb.gc, bb.gc_graph_ids, 1)
            else:
                fwd_c = lambda c, p, bb: model.apply(  # noqa: E731
                    p, bb.gs._replace(x=bb.gs.x + c), bb.gs_graph_ids, 1,
                    method=GraphModel.forward_subgraphs)
            dev_times[sig] = device_seconds_per_call(
                fwd_c, np.asarray(b.gc.x).dtype, operands=(params, b))
        shape_counts[sig] = shape_counts.get(sig, 0) + 1
        t0 = time.perf_counter()
        out = fwd(params, b)
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
        row = np.asarray(out)[0]
        if classify:
            losses.append(-np.log(max(row[int(y[i])], 1e-12)))
            correct += int(row.argmax() == y[i])
        else:
            losses.append(abs(float(row[0]) - float(y[i])))
    n = max(len(samples), 1)
    dev_avg = (sum(dev_times[s] * c for s, c in shape_counts.items())
               / max(sum(shape_counts.values()), 1))
    return InferenceReport(
        num_test_samples=len(samples),
        avg_inf_time=float(np.mean(times[1:]) if len(times) > 1
                           else np.mean(times)),
        avg_loss=float(np.mean(losses)),
        acc=correct / n if classify else 0.0,
        avg_inf_time_device=float(dev_avg))
