from fitgnn_tpu.parallel.mesh import make_mesh, DATA_AXIS
from fitgnn_tpu.parallel.shard import (LAYER_SEMANTICS, ShardedGraph,
                                        shard_graph)
from fitgnn_tpu.parallel.dist_model import (
    DistGCNConv, DistConvStack, DistNodeModel,
    DistGCNConvHalo, DistNodeModelHalo,
    DistSAGEConv, DistGINConv, DistGATConv, make_dist_conv,
)
from fitgnn_tpu.parallel.dist_train import (
    create_dist_state, make_dist_train_step, make_dist_eval_step,
    make_halo_train_step,
)
from fitgnn_tpu.parallel.halo import HaloPlan, build_halo_plan, halo_exchange
from fitgnn_tpu.parallel.dist_subgraphs import (
    pad_batch_to_shards, make_dist_gs_train_step, make_dist_gs_eval_step,
    make_dist_gs_train_step_multi, make_dist_gs_eval_step_multi,
)
from fitgnn_tpu.parallel.hierarchical import (
    HierPlan, build_hier_plan, HierGCNConv, HierSAGEConv, HierGINConv,
    HierGATConv, HierNodeModel, hier_aggregate, hier_attention_aggregate,
    make_hier_mesh, make_hier_train_step, make_hier_eval_step,
    init_hier_params, hier_oracle_features, HOST_AXIS, CHIP_AXIS,
)

__all__ = [
    "make_mesh", "DATA_AXIS", "ShardedGraph", "shard_graph",
    "LAYER_SEMANTICS",
    "DistGCNConv", "DistConvStack", "DistNodeModel",
    "DistGCNConvHalo", "DistNodeModelHalo",
    "DistSAGEConv", "DistGINConv", "DistGATConv", "make_dist_conv",
    "create_dist_state", "make_dist_train_step", "make_dist_eval_step",
    "make_halo_train_step", "HaloPlan", "build_halo_plan", "halo_exchange",
    "pad_batch_to_shards", "make_dist_gs_train_step", "make_dist_gs_eval_step",
    "make_dist_gs_train_step_multi", "make_dist_gs_eval_step_multi",
    "HierPlan", "build_hier_plan", "HierGCNConv", "HierSAGEConv",
    "HierGINConv", "HierGATConv", "HierNodeModel",
    "hier_aggregate", "hier_attention_aggregate", "make_hier_mesh", "make_hier_train_step",
    "make_hier_eval_step", "init_hier_params",
    "hier_oracle_features", "HOST_AXIS", "CHIP_AXIS",
]
