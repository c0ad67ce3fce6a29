"""Standard graph-classification model family.

TPU-native counterparts of the reference example models (each docstring cites
its source).  All follow the :class:`ModelOutput` protocol and take a
``Batch``; aggregation layers run on the cached dense adjacency (MXU path) by
default — models call ``batch.graph.with_dense_adj()`` once up front.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from kgcn_tpu import nn as knn
from kgcn_tpu.data.batcher import Batch
from kgcn_tpu.models.base import ModelOutput


def softmax_ce_cost(logits, labels, pad_mask):
    """Per-example masked softmax CE → (cost_opt, cost_sum, prediction,
    correct_count) — the recurring block of the reference models
    (example_model/model.py:57-69)."""
    logits = logits.astype(jnp.float32)  # losses always in full precision
    logp = jax.nn.log_softmax(logits, axis=-1)
    cost = -jnp.sum(labels * logp, axis=-1) * pad_mask
    prediction = jax.nn.softmax(logits, axis=-1)
    correct = pad_mask * (
        jnp.argmax(prediction, axis=-1) == jnp.argmax(labels, axis=-1)
    ).astype(jnp.float32)
    metrics = {
        "correct_count": jnp.sum(correct),
        "count": jnp.sum(pad_mask),
    }
    return jnp.mean(cost), jnp.sum(cost), prediction, metrics


def _maybe_embed(batch: Batch, all_node_num: Optional[int], embedding_dim: int):
    """Features, or an embedding lookup in featureless mode
    (reference: example_model/model_multitask.py:46-48)."""
    if batch.graph.nodes is not None:
        return batch.graph.nodes
    return knn.NodeEmbedding(all_node_num, embedding_dim)(batch.graph)


class GCN(nn.Module):
    """3-layer GCN binary graph classifier
    (reference: example_model/model.py:30-71)."""

    channels: int = 1
    label_dim: int = 2
    hidden: int = 50
    dropout_rate: float = 0.2
    all_node_num: Optional[int] = None
    embedding_dim: int = 10

    @nn.compact
    def __call__(self, batch: Batch, train: bool = False) -> ModelOutput:
        g = batch.graph.with_dense_adj()
        x = _maybe_embed(batch, self.all_node_num, self.embedding_dim)
        x = jax.nn.sigmoid(knn.GraphConv(self.hidden, self.channels)(x, g))
        x = jax.nn.sigmoid(knn.GraphConv(self.hidden, self.channels)(x, g))
        x = knn.GraphConv(self.hidden, self.channels)(x, g)
        x = knn.GraphBatchNormalization()(x, g, use_running_average=not train)
        x = jax.nn.sigmoid(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = jax.nn.sigmoid(knn.GraphDense(self.hidden)(x, g))
        x = knn.GraphGather()(x, g)
        logits = nn.Dense(self.label_dim)(x)
        cost_opt, cost_sum, pred, metrics = softmax_ce_cost(
            logits, batch.labels, batch.pad_mask
        )
        return ModelOutput(pred, cost_opt, cost_sum, metrics)


class RxnGCN(nn.Module):
    """Reaction-template classifier: 3×(GraphConv(128) + GraphBN + relu) →
    GraphDense(128) + relu → GraphGather → Dense(label_dim), masked softmax
    CE (reference: example_model/model_rxn_3layer.py — legacy-layer stack
    with fixed dropout_rate 0.3 declared but unused, which we mirror by not
    applying dropout).  Supports featureless embedding mode like the
    reference (Embedding(all_node_num, embedding_dim))."""

    channels: int = 1
    label_dim: int = 2
    hidden: int = 128
    all_node_num: Optional[int] = None
    embedding_dim: int = 10

    @nn.compact
    def __call__(self, batch: Batch, train: bool = False) -> ModelOutput:
        g = batch.graph.with_dense_adj()
        x = _maybe_embed(batch, self.all_node_num, self.embedding_dim)
        for _ in range(3):
            x = knn.GraphConv(self.hidden, self.channels)(x, g)
            x = knn.GraphBatchNormalization()(
                x, g, use_running_average=not train
            )
            x = jax.nn.relu(x)
        x = jax.nn.relu(knn.GraphDense(self.hidden)(x, g))
        h = knn.GraphGather()(x, g)
        logits = nn.Dense(self.label_dim)(h)
        cost_opt, cost_sum, pred, metrics = softmax_ce_cost(
            logits, batch.labels, batch.pad_mask
        )
        # reference optimises the MEAN of masked per-example costs
        # (model_rxn_3layer.py: cost_opt = reduce_mean)
        return ModelOutput(pred, cost_opt, cost_sum, metrics)


class GIN(nn.Module):
    """2-block GIN with per-block readout concat
    (reference: example_model/model_gin.py:29-78)."""

    channels: int = 1
    label_dim: int = 2
    hidden: int = 50
    num_blocks: int = 2

    @nn.compact
    def __call__(self, batch: Batch, train: bool = False) -> ModelOutput:
        g = batch.graph.with_dense_adj()
        x = batch.graph.nodes
        readouts = []
        for _ in range(self.num_blocks):
            x = knn.GINAggregate(self.channels)(x, g)
            x = jax.nn.relu(knn.GraphDense(self.hidden)(x, g))
            x = jax.nn.relu(knn.GraphDense(self.hidden)(x, g))
            readouts.append(knn.GraphGather()(x, g))
        h = jnp.concatenate(readouts, axis=1)
        logits = nn.Dense(self.label_dim)(h)
        cost_opt, cost_sum, pred, metrics = softmax_ce_cost(
            logits, batch.labels, batch.pad_mask
        )
        return ModelOutput(pred, cost_opt, cost_sum, metrics)


class GATModel(nn.Module):
    """GraphDense+GAT ×3; block readouts collected after blocks 2 and 3
    only — reference-exact (model_gat.py:44-54 appends ``block_out`` after
    the second and third GAT, not the first)."""

    channels: int = 1
    label_dim: int = 2
    hidden: int = 50
    # "sender" = the reference's denominator gather (kgcn/layers.py:530-531)
    # — it leaks degree information, which the shipped ring-classification
    # task needs (receiver softmax yields identical per-node values on
    # regular rings); "receiver" = the standard GAT edge softmax.
    gat_normalize: str = "sender"

    @nn.compact
    def __call__(self, batch: Batch, train: bool = False) -> ModelOutput:
        # dense [B,N,N] attention grid on the MXU for molecular sizes;
        # GAT falls back to the edge-list segment path when the dense
        # adjacency is disabled (config spmm_backend)
        g = batch.graph.with_dense_adj()
        x = batch.graph.nodes
        block_out = []
        x = knn.GraphDense(self.hidden)(x, g)
        x = knn.GAT(self.channels, normalize=self.gat_normalize)(x, g)
        x = knn.GraphDense(self.hidden)(x, g)
        x = knn.GAT(self.channels, normalize=self.gat_normalize)(x, g)
        block_out.append(x)
        x = knn.GraphDense(self.hidden)(x, g)
        x = knn.GAT(self.channels, normalize=self.gat_normalize)(x, g)
        block_out.append(x)
        read_out = [knn.GraphGather()(h, g) for h in block_out]
        h = jnp.concatenate(read_out, axis=1)
        logits = nn.Dense(self.label_dim)(h)
        cost_opt, cost_sum, pred, metrics = softmax_ce_cost(
            logits, batch.labels, batch.pad_mask
        )
        return ModelOutput(pred, cost_opt, cost_sum, metrics)


class GCNMultitask(nn.Module):
    """Tox21-style multitask head: sigmoid per task, masked labels,
    optional pos_weight weighted CE
    (reference: example_model/model_multitask.py:31-101)."""

    channels: int = 1
    label_dim: int = 12
    hidden: int = 50
    wide_hidden: int = 256
    dropout_rate: float = 0.2
    pos_weight: Optional[tuple] = None  # per-task positive-class weight
    all_node_num: Optional[int] = None
    embedding_dim: int = 10

    @nn.compact
    def __call__(self, batch: Batch, train: bool = False) -> ModelOutput:
        g = batch.graph.with_dense_adj()
        x = _maybe_embed(batch, self.all_node_num, self.embedding_dim)
        x = jax.nn.sigmoid(knn.GraphConv(self.wide_hidden, self.channels)(x, g))
        x = jax.nn.sigmoid(knn.GraphConv(self.wide_hidden, self.channels)(x, g))
        x = jax.nn.sigmoid(knn.GraphDense(self.wide_hidden)(x, g))
        x = knn.GraphConv(self.hidden, self.channels)(x, g)
        x = knn.GraphBatchNormalization()(x, g, use_running_average=not train)
        x = jax.nn.sigmoid(x)
        x = jax.nn.sigmoid(knn.GraphDense(self.hidden)(x, g))
        h = knn.GraphGather()(x, g)
        logits = nn.Dense(self.label_dim)(h).astype(jnp.float32)

        labels = batch.labels.astype(jnp.float32)
        mask_label = (
            batch.mask_label.astype(jnp.float32)
            if batch.mask_label is not None
            else jnp.ones_like(labels)
        )
        pad = batch.pad_mask
        if self.pos_weight is not None:
            # tf.nn.weighted_cross_entropy_with_logits semantics:
            # (1-l)·x + (1 + (pw-1)·l)·softplus(-x), stable form
            pw = jnp.asarray(self.pos_weight, jnp.float32)
            ce = (1 - labels) * (logits + jax.nn.softplus(-logits)) + (
                labels * pw * jax.nn.softplus(-logits)
            )
        else:
            # tf.nn.sigmoid_cross_entropy_with_logits stable form
            ce = (
                jnp.maximum(logits, 0)
                - logits * labels
                + jax.nn.softplus(-jnp.abs(logits))
            )
        cost = pad * jnp.sum(mask_label * ce, axis=1)
        prediction = jax.nn.sigmoid(logits)

        # exact match over LABELED tasks only — the reference scores masked
        # placeholder zeros too (model_multitask.py:90-93), deflating the
        # metric whenever a missing task is predicted positive
        task_hit = (prediction > 0.5) == (labels > 0.5)
        exact = pad * jnp.all(
            task_hit | (mask_label <= 0), axis=1
        ).astype(jnp.float32)
        # per-task correctness (masked)
        task_correct = (
            ((prediction > 0.5) == (labels > 0.5)).astype(jnp.float32)
            * mask_label
            * pad[:, None]
        )
        metrics = {
            "correct_count": jnp.sum(exact),
            "count": jnp.sum(pad),
            "each_correct_count": jnp.sum(task_correct, axis=0),
            "each_count": jnp.sum(mask_label * pad[:, None], axis=0),
        }
        pred2 = jnp.stack([1.0 - prediction, prediction], axis=-1)  # [B,T,2]
        return ModelOutput(pred2, jnp.mean(cost), jnp.sum(cost), metrics)


class GCNNodeLabel(nn.Module):
    """Node-centric classification: GraphConv stack → per-node softmax
    (reference: example_model/model_node_label.py:30-76)."""

    channels: int = 1
    label_dim: int = 2
    hidden: int = 64
    all_node_num: Optional[int] = None
    embedding_dim: int = 10

    @nn.compact
    def __call__(self, batch: Batch, train: bool = False) -> ModelOutput:
        g = batch.graph.with_dense_adj()
        x = _maybe_embed(batch, self.all_node_num, self.embedding_dim)
        for _ in range(2):
            x = knn.GraphConv(self.hidden, self.channels)(x, g)
            x = knn.GraphBatchNormalization()(x, g, use_running_average=not train)
            x = jax.nn.relu(x)
        logits_flat = knn.GraphConv(self.label_dim, self.channels)(x, g)
        B, N = g.n_graph, g.max_nodes
        logits = logits_flat.reshape(B, N, self.label_dim).astype(jnp.float32)
        labels = batch.node_label.astype(jnp.float32)
        pad = batch.pad_mask

        # valid-node mask: true nodes only (the reference averaged over ALL
        # padded slots, model_node_label.py:65-76, silently inflating both
        # cost denominator and accuracy — its node-label path is bit-rotted
        # and cannot run, so we fix rather than replicate), intersected with
        # mask_node_label when the dataset provides one
        node_valid = (
            jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
            < g.n_node[:, None]
        ).astype(jnp.float32)
        if batch.mask_node_label is not None:
            m = batch.mask_node_label.astype(jnp.float32)
            if m.ndim == 3:
                m = jnp.max(m, axis=-1)
            node_valid = node_valid * m
        denom = jnp.maximum(jnp.sum(node_valid, axis=1), 1.0)  # [B]

        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.sum(labels * logp, axis=-1)  # [B, N]
        cost = pad * (jnp.sum(node_valid * ce, axis=1) / denom)
        prediction = jax.nn.softmax(logits, axis=-1)
        node_correct = (
            jnp.argmax(prediction, -1) == jnp.argmax(labels, -1)
        ).astype(jnp.float32)
        correct = pad * (jnp.sum(node_valid * node_correct, axis=1) / denom)
        metrics = {"correct_count": jnp.sum(correct), "count": jnp.sum(pad)}
        return ModelOutput(prediction, jnp.mean(cost), jnp.sum(cost), metrics)
