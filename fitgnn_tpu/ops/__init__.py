from fitgnn_tpu.ops.segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_softmax,
)
from fitgnn_tpu.ops.spmm import spmm, spmm_coo
from fitgnn_tpu.ops.sddmm import sddmm_dot, gather_concat_score

__all__ = [
    "segment_sum", "segment_mean", "segment_max", "segment_softmax",
    "spmm", "spmm_coo", "sddmm_dot", "gather_concat_score",
]
