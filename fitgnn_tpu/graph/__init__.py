from fitgnn_tpu.graph.container import Graph, SubgraphBatch
from fitgnn_tpu.graph.build import (
    build_graph,
    add_self_loops,
    gcn_normalize,
    pad_graph,
    to_undirected,
)

__all__ = [
    "Graph",
    "SubgraphBatch",
    "build_graph",
    "add_self_loops",
    "gcn_normalize",
    "pad_graph",
    "to_undirected",
]
