from kgcn_tpu.data.dataset import (
    Dataset,
    DatasetInfo,
    load_jbl,
    build_dataset,
    split_dataset,
    kfold_indices,
)
from kgcn_tpu.data.batcher import Batcher

__all__ = [
    "Dataset",
    "DatasetInfo",
    "load_jbl",
    "build_dataset",
    "split_dataset",
    "kfold_indices",
    "Batcher",
]
