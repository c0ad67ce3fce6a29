from kgcn_tpu.graph.batch import GraphBatch, batch_graphs, pad_edge_budget
from kgcn_tpu.graph import transforms

__all__ = ["GraphBatch", "batch_graphs", "pad_edge_budget", "transforms"]
