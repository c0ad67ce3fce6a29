from kgcn_tpu.nn.layers import (
    GAT,
    DistMult,
    GINAggregate,
    GraphBatchNormalization,
    GraphConv,
    GraphDecoderDistMult,
    GraphDecoderInnerProd,
    GraphDense,
    GraphGather,
    GraphMaxPooling,
    NodeEmbedding,
)

__all__ = [
    "GAT",
    "DistMult",
    "GINAggregate",
    "GraphBatchNormalization",
    "GraphConv",
    "GraphDecoderDistMult",
    "GraphDecoderInnerProd",
    "GraphDense",
    "GraphGather",
    "GraphMaxPooling",
    "NodeEmbedding",
]
