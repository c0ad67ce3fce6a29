"""Block-diagonal sparse GCN for large-label classification (reaction
prediction: 20,014 classes).

Reference: example_model/sparse.py:14-139 driven by task_sparse_gcn.py
(``kgcn-sparse``): GraphConv stack over ONE block-diagonal sparse adjacency →
GraphDense + BN + relu → per-graph sum readout → tanh → Dense(num_classes),
sparse softmax CE summed over the batch, accuracy + top-30/top-50 metrics.

TPU-native differences: the reference builds the block-diagonal matrix
in-graph with CPU-pinned tf.scan offset arithmetic
(kgcn/data_util.py:698-845, sparse.py:83-93 CPU readout scan); here the
GraphBatch already IS the block-diagonal batch, and the readout is a free
reshape + masked sum.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from kgcn_tpu import nn as knn
from kgcn_tpu.data.batcher import Batch
from kgcn_tpu.models.base import ModelOutput


class SparseGCN(nn.Module):
    """3×GraphConv(256) + relu → GraphDense(256)+BN+relu → sum readout →
    tanh → Dense(num_classes)."""

    channels: int = 1
    num_classes: int = 2
    out_dims: Tuple[int, ...] = (256, 256, 256)
    dense_dim: int = 256
    batch_normalize: bool = True
    topk: Tuple[int, ...] = (30, 50)
    # up to this many (lane-aligned) nodes per graph, the dense-MXU
    # aggregation path beats every sparse layout by >10x (MEASURED.md);
    # beyond it, memory O(B·N²) forces the edge-list path
    dense_threshold: int = 256

    @nn.compact
    def __call__(self, batch: Batch, train: bool = False) -> ModelOutput:
        g = batch.graph
        if g.max_nodes <= self.dense_threshold:
            g = g.with_dense_adj()
        x = g.nodes
        for dim in self.out_dims:
            x = jax.nn.relu(knn.GraphConv(dim, self.channels)(x, g))
        x = knn.GraphDense(self.dense_dim)(x, g)
        if self.batch_normalize:
            x = knn.GraphBatchNormalization()(x, g, use_running_average=not train)
        x = jax.nn.relu(x)
        h = jnp.tanh(knn.GraphGather()(x, g))  # per-graph sum readout
        # the 20k-class head is the heaviest matmul after aggregation —
        # run it in the compute dtype, take the loss in float32
        logits = nn.Dense(self.num_classes, dtype=h.dtype)(h).astype(jnp.float32)

        labels = batch.labels
        if labels.ndim > 1:
            labels = labels[:, 0]  # first task column (sparse.py:108)
        labels = labels.astype(jnp.int32)
        pad = batch.pad_mask
        logp = jax.nn.log_softmax(logits, axis=-1)
        cost = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0] * pad
        probs = jax.nn.softmax(logits, axis=-1)

        pred_class = jnp.argmax(probs, axis=-1)
        metrics = {
            "correct_count": jnp.sum(pad * (pred_class == labels)),
            "count": jnp.sum(pad),
        }
        for k in self.topk:
            if k < self.num_classes:
                # in_top_k: label prob within top-k
                kth = -jnp.sort(-probs, axis=-1)[:, k - 1]
                label_p = jnp.take_along_axis(probs, labels[:, None], -1)[:, 0]
                metrics[f"top{k}_count"] = jnp.sum(pad * (label_p >= kth))
        # reference optimises the SUM of losses (sparse.py:109-110)
        return ModelOutput(probs, jnp.sum(cost), jnp.sum(cost), metrics)
