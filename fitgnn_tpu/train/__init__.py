from fitgnn_tpu.train.losses import (
    masked_nll, masked_l1, masked_l1_std_normalized, masked_accuracy,
)
from fitgnn_tpu.train.steps import (
    TrainState, adam_l2, create_state, gc_train_step, gc_eval_step,
    gs_train_step_gd, gs_train_epoch_mb, gs_eval_step,
)
from fitgnn_tpu.train.loop import (
    NodeTaskConfig, TaskResult, RunResult, run_node_task, EXP_SETUPS,
)

__all__ = [
    "masked_nll", "masked_l1", "masked_l1_std_normalized", "masked_accuracy",
    "TrainState", "adam_l2", "create_state", "gc_train_step", "gc_eval_step",
    "gs_train_step_gd", "gs_train_epoch_mb", "gs_eval_step",
    "NodeTaskConfig", "TaskResult", "RunResult", "run_node_task", "EXP_SETUPS",
]
