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
    avg_inf_time: float        # seconds per sample forward (wall-clock,
                               # includes the host→device dispatch constant)
    avg_loss: float
    acc: float
    avg_inf_time_device: float = 0.0   # device seconds per forward
                                       # (dispatch amortized out — see
                                       # _device_seconds_per_forward)


# scan lengths for the two-point device-time measurement; the difference
# quotient cancels the per-dispatch constant exactly
_DEV_ITERS = (8, 64)


def device_seconds_per_call(fwd_c, dtype, operands=(), iters=_DEV_ITERS,
                            repeats: int = 3) -> float:
    """Generic two-point scan timing: ``fwd_c(c, *operands)`` maps a scalar
    carry perturbation (plus the runtime operands) to the forward's output
    array (see ``_device_seconds_per_forward`` for the method).

    ``operands`` MUST carry every array the forward reads — a closed-over
    array is traced as a program CONSTANT, and at full-graph scale the
    serialized executable blows past remote-compile payload limits
    (HTTP 413 on the tunnel — the round-4 baked-constant lesson)."""
    import jax.numpy as jnp

    def run_k(k):
        def run(c0, *ops):
            def body(c, _):
                out = fwd_c(c, *ops)
                return c + out.sum().astype(dtype) * 1e-38, ()

            c, _ = jax.lax.scan(body, c0, None, length=k)
            return c

        rj = jax.jit(run)
        c0 = jnp.zeros((), dtype)
        rj(c0, *operands).block_until_ready()  # compile outside timing
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            rj(c0, *operands).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    k1, k2 = iters
    t1, t2 = run_k(k1), run_k(k2)
    return max(t2 - t1, 0.0) / (k2 - k1)


def _device_seconds_per_forward(fwd, params, x, g, iters=_DEV_ITERS,
                                repeats: int = 3) -> float:
    """Device time of one jitted forward, dispatch constant removed.

    Wall-clock around ``block_until_ready`` carries a fixed multi-ms
    dispatch/RPC cost on remote-attached TPUs (the tunnel), which swamps a
    sub-ms subgraph forward — the round-4 1.53× headline was dispatch-bound
    (VERDICT r4 ask #3).  This times TWO jitted ``lax.scan``s of K1 and K2
    repeated forwards (ONE dispatch each, K on-device iterations) and
    reports (t(K2) - t(K1)) / (K2 - K1): the per-iteration device time,
    with the dispatch constant cancelled by the difference quotient.

    The scan body feeds an O(1e-38) carry perturbation into the input so
    XLA cannot hoist the loop-invariant forward out of the scan.
    """
    return device_seconds_per_call(
        lambda c, p, xx, gg: fwd(p, xx + c, gg), x.dtype,
        operands=(params, x, g), iters=iters, repeats=repeats)


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
    # warm-up compile per sampled bucket shape (not in the timed loop),
    # plus the amortized device-time measurement per bucket shape
    sampled_buckets = np.unique(subgraph_index[sub_of_node, 0])
    bucket_count = {int(b): int((subgraph_index[sub_of_node, 0] == b).sum())
                    for b in sampled_buckets}
    dev_times = {}
    for b in sampled_buckets:
        g0 = buckets[int(b)].subgraph(0)
        fwd(params, g0.x, g0).block_until_ready()
        dev_times[int(b)] = _device_seconds_per_forward(fwd, params, g0.x, g0)
    dev_avg = (sum(dev_times[b] * c for b, c in bucket_count.items())
               / max(sum(bucket_count.values()), 1))

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
        acc=correct / n if classify else 0.0,
        avg_inf_time_device=float(dev_avg))


def baseline_inference_benchmark(
    model, params, g: Graph, test_mask: np.ndarray, y: np.ndarray,
    num_samples: int = 100, classify: bool = True, seed: int = 0,
) -> InferenceReport:
    """Full-graph forward per sampled node (the baseline protocol)."""
    nodes = _sample_nodes(np.asarray(test_mask, dtype=bool), num_samples, seed)
    fwd = jax.jit(lambda p, x, gg: model.apply(p, x, gg))
    fwd(params, g.x, g).block_until_ready()
    dev_time = _device_seconds_per_forward(fwd, params, g.x, g)

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
        acc=correct / n if classify else 0.0,
        avg_inf_time_device=float(dev_time))
