"""Sequence / vector-modal encoders for multimodal (CPI) models.

TPU-native counterparts of the reference sequence branch
(example_model/model_multimodal.py:72-92): Embedding → Conv1D → MaxPool1D →
LSTM(go_backwards).  The LSTM runs as a ``lax.scan``-based flax RNN — XLA
compiles the recurrence into a fused loop; sequences are scanned reversed to
match ``go_backwards=True``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class SequenceEncoder(nn.Module):
    """Embedding → Conv1D(relu) → MaxPool1D → backward LSTM → [B, out]."""

    vocab_size: int
    embedding_dim: int = 10
    conv_features: int = 50
    conv_kernel: int = 4
    pool_stride: int = 4
    lstm_features: int = 32

    @nn.compact
    def __call__(self, sequences, return_embedded: bool = False,
                 embedded: Optional[jnp.ndarray] = None):
        """sequences: [B, L] int32 token ids.  ``embedded`` feeds a
        pre-computed embedding instead (the IG-on-embeddings hook, reference
        model_multimodal.py:76-80 feed_embedded_layer)."""
        emb = nn.Embed(self.vocab_size, self.embedding_dim)
        x = embedded if embedded is not None else emb(sequences)
        if return_embedded:
            return x
        x = nn.relu(
            nn.Conv(self.conv_features, (self.conv_kernel,), padding="SAME")(x)
        )
        x = nn.max_pool(
            x, (self.pool_stride,), strides=(self.pool_stride,)
        )
        lstm = nn.RNN(nn.OptimizedLSTMCell(self.lstm_features), reverse=True)
        y = lstm(x)  # [B, L', H]
        return y[:, -1, :]  # final state of the reversed scan


class VectorModalEncoder(nn.Module):
    """Dense encoder for profeat/dragon/fingerprint vector modalities
    (reference: example_model/model_multimodal_vec.py)."""

    features: int = 32
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(self, v, train: bool = False):
        x = nn.relu(nn.Dense(self.features * 2)(v))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.relu(nn.Dense(self.features)(x))
        return x
