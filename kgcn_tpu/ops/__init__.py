from kgcn_tpu.ops.spmm import spmm, spmm_multichannel, sddmm
from kgcn_tpu.ops.segment import (
    embed_rows,
    segment_max,
    segment_softmax,
    segment_sum,
    take_rows,
)

__all__ = [
    "spmm",
    "spmm_multichannel",
    "sddmm",
    "segment_softmax",
    "segment_sum",
    "segment_max",
    "take_rows",
    "embed_rows",
]
