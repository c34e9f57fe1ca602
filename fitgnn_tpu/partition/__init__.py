from fitgnn_tpu.partition.subgraphs import (
    SubgraphSpec, extract_subgraphs, pad_subgraphs, MODES,
)
from fitgnn_tpu.partition.pipeline import (
    CoarseData, PartitionedDataset, coarsen_and_partition,
)

__all__ = [
    "SubgraphSpec", "extract_subgraphs", "pad_subgraphs", "MODES",
    "CoarseData", "PartitionedDataset", "coarsen_and_partition",
]
