from fitgnn_tpu.ops.segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_softmax,
)
from fitgnn_tpu.ops.spmm import spmm, spmm_coo
from fitgnn_tpu.ops.sddmm import sddmm_dot, gather_concat_score
from fitgnn_tpu.ops.hybrid_spmm import HybridSpmm, build_hybrid, hybrid_spmm
from fitgnn_tpu.ops.ell_spmm import EllMatrix, build_ell, ell_spmm

__all__ = [
    "segment_sum", "segment_mean", "segment_max", "segment_softmax",
    "spmm", "spmm_coo", "sddmm_dot", "gather_concat_score",
    "HybridSpmm", "build_hybrid", "hybrid_spmm",
    "EllMatrix", "build_ell", "ell_spmm",
]
