from fitgnn_tpu.parallel.mesh import make_mesh, DATA_AXIS
from fitgnn_tpu.parallel.shard import ShardedGraph, shard_graph
from fitgnn_tpu.parallel.dist_model import (
    DistGCNConv, DistConvStack, DistNodeModel,
)
from fitgnn_tpu.parallel.dist_train import (
    create_dist_state, make_dist_train_step, make_dist_eval_step,
)

__all__ = [
    "make_mesh", "DATA_AXIS", "ShardedGraph", "shard_graph",
    "DistGCNConv", "DistConvStack", "DistNodeModel",
    "create_dist_state", "make_dist_train_step", "make_dist_eval_step",
]
