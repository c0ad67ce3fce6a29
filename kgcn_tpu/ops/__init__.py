from kgcn_tpu.ops.spmm import spmm, spmm_multichannel, sddmm
from kgcn_tpu.ops.segment import segment_softmax, segment_sum, segment_max

__all__ = [
    "spmm",
    "spmm_multichannel",
    "sddmm",
    "segment_softmax",
    "segment_sum",
    "segment_max",
]
