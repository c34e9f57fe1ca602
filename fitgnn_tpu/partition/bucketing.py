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
    max_buckets: int = 0,
    **pad_kwargs,
):
    """Like ``bucket_subgraphs``, also returning the placement index:
    ``index[i] = (bucket, position)`` of input spec ``i`` — so callers that
    address subgraphs by their original id (the node→metanode ``parent``
    map, inference sampling) keep working on bucketed batches.

    ``max_buckets > 0`` caps the number of buckets (= compiled train/eval
    programs: at products scale every extra bucket is another GB-workspace
    executable the chip must hold).  Adjacent power-of-two groups are merged
    greedily by least added padding waste (node-slots), so the cap trades a
    bounded amount of padding for fewer programs."""
    sizes = np.array([s.num_nodes for s in specs])
    caps = np.maximum(
        min_bucket,
        2 ** np.ceil(np.log2(np.maximum(sizes, 1))).astype(np.int64))
    if max_buckets < 0:
        raise ValueError(f"max_buckets must be >= 0, got {max_buckets}")
    uniq = list(np.unique(caps))
    if max_buckets and len(uniq) > max_buckets:
        # group[j] = list of original caps merged into uniq-cap group j;
        # merging group j into j+1 re-pads j's subgraphs to caps[j+1].
        # Incremental cost: group j's members already sit at its CURRENT
        # cap, so the merge adds (cap_{j+1} − cap_j) per member — charging
        # against original caps would double-count padding already paid
        counts = {c: int((caps == c).sum()) for c in uniq}
        groups = [[c] for c in uniq]
        while len(groups) > max_buckets:
            waste = [
                (groups[j + 1][-1] - groups[j][-1])
                * sum(counts[c] for c in groups[j])
                for j in range(len(groups) - 1)]
            j = int(np.argmin(waste))
            groups[j + 1] = groups[j] + groups[j + 1]
            del groups[j]
        remap = {c: g[-1] for g in groups for c in g}
        caps = np.array([remap[c] for c in caps])
        uniq = [g[-1] for g in groups]
    batches: List[SubgraphBatch] = []
    index = np.zeros((len(specs), 2), dtype=np.int64)
    for b, cap in enumerate(uniq):
        sel = np.flatnonzero(caps == cap)
        index[sel, 0] = b
        index[sel, 1] = np.arange(len(sel))
        batches.append(pad_subgraphs(
            [specs[i] for i in sel], y=y, train_mask=train_mask,
            val_mask=val_mask, test_mask=test_mask, **pad_kwargs))
    return batches, index
