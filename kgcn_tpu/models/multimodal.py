"""Multimodal (compound-protein interaction) models.

Reference: example_model/model_multimodal.py:32-126 (graph ‖ sequence),
model_multimodal_vec.py (graph ‖ vector modal), and the regression variant
(model_multimodal_*_regression).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from kgcn_tpu import nn as knn
from kgcn_tpu.data.batcher import Batch
from kgcn_tpu.models.base import ModelOutput
from kgcn_tpu.models.standard import softmax_ce_cost
from kgcn_tpu.nn.multimodal import SequenceEncoder, VectorModalEncoder


class GCNMultimodal(nn.Module):
    """Graph branch (GraphConv+GraphDense+Gather) ‖ sequence branch
    (Embed→Conv1D→MaxPool→backward LSTM) → concat → Dense(52) → Dense(labels)
    (reference: example_model/model_multimodal.py:32-126)."""

    channels: int = 1
    label_dim: int = 2
    hidden: int = 50
    sequence_symbol_num: int = 25
    embedding_dim: int = 10
    lstm_features: int = 32
    task: str = "classification"  # or "regression"

    def setup(self):
        self.gconv = knn.GraphConv(self.hidden, self.channels)
        self.gdense = knn.GraphDense(self.hidden)
        self.gather = knn.GraphGather()
        self.seq_enc = SequenceEncoder(
            vocab_size=self.sequence_symbol_num,
            embedding_dim=self.embedding_dim,
            lstm_features=self.lstm_features,
        )
        self.shared1 = nn.Dense(52)
        self.head = nn.Dense(self.label_dim)

    def graph_branch(self, batch: Batch):
        g = batch.graph.with_dense_adj()
        x = jax.nn.sigmoid(self.gconv(batch.graph.nodes, g))
        x = jax.nn.sigmoid(self.gdense(x, g))
        return self.gather(x, g)

    def __call__(self, batch: Batch, train: bool = False,
                 embedded: Optional[jnp.ndarray] = None) -> ModelOutput:
        gh = self.graph_branch(batch)
        sh = self.seq_enc(batch.sequences, embedded=embedded)
        h = jnp.concatenate([sh, gh], axis=1)
        h = jax.nn.relu(self.shared1(h))
        logits = self.head(h)
        if self.task == "regression":
            pred = logits
            err = jnp.sum((batch.labels - pred) ** 2, axis=1) * batch.pad_mask
            metrics = {
                "error_sum": jnp.sum(err),
                "count": jnp.sum(batch.pad_mask),
            }
            return ModelOutput(pred, jnp.mean(err), jnp.sum(err), metrics)
        cost_opt, cost_sum, pred, metrics = softmax_ce_cost(
            logits, batch.labels, batch.pad_mask
        )
        return ModelOutput(pred, cost_opt, cost_sum, metrics)

    def embedding(self, sequences):
        """Sequence-embedding hook for IG on embeddings (reference:
        model_multimodal.py:122-126)."""
        return self.seq_enc(sequences, return_embedded=True)


class GCNVectorModal(nn.Module):
    """Graph branch ‖ dense vector-modal branch(es)
    (reference: example_model/model_multimodal_vec.py)."""

    channels: int = 1
    label_dim: int = 2
    hidden: int = 50
    num_modals: int = 1
    task: str = "classification"

    def setup(self):
        self.gconv = knn.GraphConv(self.hidden, self.channels)
        self.gdense = knn.GraphDense(self.hidden)
        self.gather = knn.GraphGather()
        self.modal_encs = [
            VectorModalEncoder(features=32) for _ in range(self.num_modals)
        ]
        self.shared1 = nn.Dense(52)
        self.head = nn.Dense(self.label_dim)

    def __call__(self, batch: Batch, train: bool = False) -> ModelOutput:
        g = batch.graph.with_dense_adj()
        x = jax.nn.sigmoid(self.gconv(batch.graph.nodes, g))
        x = jax.nn.sigmoid(self.gdense(x, g))
        gh = self.gather(x, g)
        if batch.vector_modal is None:
            raise ValueError(
                "gcn_vector_modal needs a 'vector_modal' entry in the "
                "dataset (this batch carries none)"
            )
        if len(batch.vector_modal) != len(self.modal_encs):
            raise ValueError(
                f"dataset has {len(batch.vector_modal)} vector modalities "
                f"but the model was built with {len(self.modal_encs)} — "
                "zip would silently drop the extras"
            )
        parts = [gh]
        for enc, v in zip(self.modal_encs, batch.vector_modal):
            parts.append(enc(v, train=train))
        h = jax.nn.relu(self.shared1(jnp.concatenate(parts, axis=1)))
        logits = self.head(h)
        if self.task == "regression":
            pred = logits
            err = jnp.sum((batch.labels - pred) ** 2, axis=1) * batch.pad_mask
            metrics = {
                "error_sum": jnp.sum(err),
                "count": jnp.sum(batch.pad_mask),
            }
            return ModelOutput(pred, jnp.mean(err), jnp.sum(err), metrics)
        cost_opt, cost_sum, pred, metrics = softmax_ce_cost(
            logits, batch.labels, batch.pad_mask
        )
        return ModelOutput(pred, cost_opt, cost_sum, metrics)


class GCNRegression(nn.Module):
    """Graph-only regression head (reference: the *_regression example
    models — GCN stack → Gather → Dense(label_dim), MSE cost, error_sum
    metric protocol kgcn/core.py:185-196)."""

    channels: int = 1
    label_dim: int = 1
    hidden: int = 50
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(self, batch: Batch, train: bool = False) -> ModelOutput:
        g = batch.graph.with_dense_adj()
        x = batch.graph.nodes
        x = jax.nn.sigmoid(knn.GraphConv(self.hidden, self.channels)(x, g))
        x = jax.nn.sigmoid(knn.GraphConv(self.hidden, self.channels)(x, g))
        x = knn.GraphBatchNormalization()(x, g, use_running_average=not train)
        x = jax.nn.sigmoid(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = jax.nn.sigmoid(knn.GraphDense(self.hidden)(x, g))
        h = knn.GraphGather()(x, g)
        pred = nn.Dense(self.label_dim)(h)
        mask_label = (
            batch.mask_label.astype(jnp.float32)
            if batch.mask_label is not None
            else jnp.ones_like(pred)
        )
        diff = (batch.labels - pred) ** 2 * mask_label
        err = jnp.sum(diff, axis=1) * batch.pad_mask
        metrics = {"error_sum": jnp.sum(err), "count": jnp.sum(batch.pad_mask)}
        return ModelOutput(pred, jnp.mean(err), jnp.sum(err), metrics)


class SequenceCNN(nn.Module):
    """Sequence-only CNN baseline (reference:
    sample_protein/sequence/cnn.py:9-25 — embedding → Conv1D stack →
    global pooling → dense softmax head; no graph branch)."""

    vocab_size: int = 25
    label_dim: int = 2
    embedding_dim: int = 10
    conv_features: int = 64

    @nn.compact
    def __call__(self, batch: Batch, train: bool = False) -> ModelOutput:
        x = nn.Embed(self.vocab_size, self.embedding_dim)(batch.sequences)
        x = nn.relu(nn.Conv(self.conv_features, (5,), padding="SAME")(x))
        x = nn.max_pool(x, (2,), strides=(2,))
        x = nn.relu(nn.Conv(self.conv_features, (5,), padding="SAME")(x))
        h = jnp.max(x, axis=1)  # global max pool over sequence
        logits = nn.Dense(self.label_dim)(h)
        cost_opt, cost_sum, pred, metrics = softmax_ce_cost(
            logits, batch.labels, batch.pad_mask
        )
        return ModelOutput(pred, cost_opt, cost_sum, metrics)
