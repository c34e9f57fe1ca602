"""Size-bucketed subgraph batches.

One global pad (``pad_subgraphs``) wastes memory/compute when subgraph sizes
are skewed (e.g. one giant component + many tiny metanodes — exactly what
low coarsening ratios produce).  Bucketing groups subgraphs by
ceil-power-of-two node count and pads within each bucket, bounding waste to
2× while keeping the number of compiled shapes ≤ log₂(max/min)
(SURVEY §7.3 hard part #2: recompiles bounded, padding waste low).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from fitgnn_tpu.graph.container import SubgraphBatch
from fitgnn_tpu.partition.subgraphs import SubgraphSpec, pad_subgraphs


def bucket_subgraphs(
    specs: Sequence[SubgraphSpec],
    y: Optional[np.ndarray] = None,
    train_mask: Optional[np.ndarray] = None,
    val_mask: Optional[np.ndarray] = None,
    test_mask: Optional[np.ndarray] = None,
    min_bucket: int = 32,
    **pad_kwargs,
) -> List[SubgraphBatch]:
    """Split specs into power-of-two size buckets and pad each bucket.

    Returns a list of ``SubgraphBatch`` (ascending bucket size).  Semantics
    are identical to one ``pad_subgraphs`` call: the union of consuming nodes
    over buckets is the same exact cover.
    """
    batches, _ = bucket_subgraphs_with_index(
        specs, y=y, train_mask=train_mask, val_mask=val_mask,
        test_mask=test_mask, min_bucket=min_bucket, **pad_kwargs)
    return batches


def bucket_subgraphs_with_index(
    specs: Sequence[SubgraphSpec],
    y: Optional[np.ndarray] = None,
    train_mask: Optional[np.ndarray] = None,
    val_mask: Optional[np.ndarray] = None,
    test_mask: Optional[np.ndarray] = None,
    min_bucket: int = 32,
    **pad_kwargs,
):
    """Like ``bucket_subgraphs``, also returning the placement index:
    ``index[i] = (bucket, position)`` of input spec ``i`` — so callers that
    address subgraphs by their original id (the node→metanode ``parent``
    map, inference sampling) keep working on bucketed batches."""
    sizes = np.array([s.num_nodes for s in specs])
    caps = np.maximum(
        min_bucket,
        2 ** np.ceil(np.log2(np.maximum(sizes, 1))).astype(np.int64))
    batches: List[SubgraphBatch] = []
    index = np.zeros((len(specs), 2), dtype=np.int64)
    for b, cap in enumerate(np.unique(caps)):
        sel = np.flatnonzero(caps == cap)
        index[sel, 0] = b
        index[sel, 1] = np.arange(len(sel))
        batches.append(pad_subgraphs(
            [specs[i] for i in sel], y=y, train_mask=train_mask,
            val_mask=val_mask, test_mask=test_mask, **pad_kwargs))
    return batches, index
