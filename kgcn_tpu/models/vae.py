"""Graph VAE (reference: example_model/model_vae.py:63-259, driven by
gcn_gen.py — the ``kgcn-gen`` engine).

Encoder: GraphConv×2 (BN+tanh) → GraphDense+sigmoid → GraphGather →
(μ, σ) heads with the reference's clipping; reparameterisation uses the
host-fed ε (``Batch.rng_normal``, mirroring the fed ``epsilon`` placeholder,
kgcn/feed_index.py:107-109).  Decoders: per-node GraphDense feature decoder +
per-channel DistMult link decoder.  Loss: BCE(features) + BCE(adjacency) +
the reference's (non-standard) KL term ``−½ Σ (1 + 2logσ − μ² − σ)``
replicated verbatim (model_vae.py:176-183).  Prediction is a dict
``{"feature", "dense_adj"}`` like the reference's dict-valued predictions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from kgcn_tpu import nn as knn
from kgcn_tpu.data.batcher import Batch
from kgcn_tpu.models.base import ModelOutput


def _bce(labels, logits):
    logits = logits.astype(jnp.float32)
    return (
        jnp.maximum(logits, 0)
        - logits * labels
        + jax.nn.softplus(-jnp.abs(logits))
    )


class GCNVAE(nn.Module):
    """Graph VAE with feature + link decoders."""

    channels: int = 1
    feature_dim: int = 0
    latent_dim: int = 64
    internal_dim: int = 64

    def setup(self):
        self.enc_conv1 = knn.GraphConv(self.internal_dim, self.channels)
        self.enc_bn1 = knn.GraphBatchNormalization()
        self.enc_conv2 = knn.GraphConv(self.internal_dim, self.channels)
        self.enc_bn2 = knn.GraphBatchNormalization()
        self.enc_dense = knn.GraphDense(self.internal_dim)
        self.gather = knn.GraphGather()
        self.mean_head = nn.Dense(
            self.latent_dim,
            kernel_init=nn.initializers.uniform(scale=0.05),
        )
        self.std_head = nn.Dense(self.latent_dim)
        self.node_decoder = knn.GraphDense(
            self.feature_dim, mask_output=False,
        )
        self.link_dense1 = [
            knn.GraphDense(self.internal_dim) for _ in range(self.channels)
        ]
        self.link_bn = [
            knn.GraphBatchNormalization() for _ in range(self.channels)
        ]
        self.link_dense2 = [
            knn.GraphDense(self.internal_dim) for _ in range(self.channels)
        ]
        self.link_decoder = [
            knn.GraphDecoderDistMult() for _ in range(self.channels)
        ]

    def encode(self, batch: Batch, train: bool):
        g = batch.graph.with_dense_adj()
        x = g.nodes
        x = jnp.tanh(self.enc_bn1(self.enc_conv1(x, g), g, use_running_average=not train))
        x = jnp.tanh(self.enc_bn2(self.enc_conv2(x, g), g, use_running_average=not train))
        x = jax.nn.sigmoid(self.enc_dense(x, g))
        h = self.gather(x, g)
        mean = jnp.clip(self.mean_head(h), -100.0, 100.0)
        std = jnp.clip(jnp.sqrt(jax.nn.softplus(self.std_head(h))), None, 5.0)
        return mean, std

    def decode(self, z, batch: Batch, train: bool):
        """z: [V, latent] per-node latents → (feature logits [B,N,F],
        adjacency logits [B,C,N,N])."""
        g = batch.graph
        B, N = g.n_graph, g.max_nodes
        feat_logits = self.node_decoder(z, g).reshape(B, N, self.feature_dim)
        adjs = []
        for c in range(self.channels):
            h = jax.nn.sigmoid(
                self.link_bn[c](self.link_dense1[c](z, g), g,
                                use_running_average=not train)
            )
            h = jax.nn.sigmoid(self.link_dense2[c](h, g))
            adjs.append(self.link_decoder[c](h, g))  # [B, N, N]
        return feat_logits, jnp.stack(adjs, axis=1)  # [B, C, N, N]

    def __call__(self, batch: Batch, train: bool = False) -> ModelOutput:
        g = batch.graph
        B, N = g.n_graph, g.max_nodes
        mean, std = self.encode(batch, train)
        # tile per node (reference: model_vae.py:168-173)
        mean_t = jnp.repeat(mean[:, None, :], N, axis=1)
        std_t = jnp.repeat(std[:, None, :], N, axis=1)
        eps = (
            batch.rng_normal
            if batch.rng_normal is not None
            else jnp.zeros((B, N, self.latent_dim))
        )
        z = (mean_t + std_t * eps).reshape(B * N, self.latent_dim)

        # reference's KL variant, verbatim (model_vae.py:176-183); the KL —
        # like every loss — accumulates in float32 even under bf16 compute
        e = 1.0e-10
        mean_t32 = mean_t.astype(jnp.float32)
        std_t32 = std_t.astype(jnp.float32)
        kl_el = 1.0 + 2.0 * jnp.log(std_t32 + e) - mean_t32**2 - std_t32
        klqp = -0.5 * jnp.mean(jnp.sum(kl_el, axis=(1, 2)))

        feat_logits, adj_logits = self.decode(z, batch, train)

        # reconstruction targets: the paired graph (identity pairing in
        # kgcn-gen, gcn_gen.py:89-92) — the batch's own features/adjacency
        target_feat = g.nodes.reshape(B, N, -1)
        target_adj = jnp.transpose(g.with_dense_adj().dense_adj, (1, 0, 2, 3))

        pad = batch.pad_mask
        cost_features = jnp.mean(_bce(target_feat, feat_logits), axis=2)  # [B,N]
        cost_links = jnp.mean(_bce(target_adj, adj_logits), axis=(2, 3))  # [B,C]
        cost = pad * (
            jnp.mean(cost_features, axis=1) + jnp.mean(cost_links, axis=1)
        )
        cost_opt = jnp.mean(cost) + klqp
        cost_sum = jnp.mean(cost)  # reference uses the mean here (model_vae.py:243)

        correct_exist = (
            (jnp.max(adj_logits, axis=1) > 0.0)
            == (jnp.max(target_adj, axis=1) > 0.5)
        ).astype(jnp.float32)
        correct = pad * jnp.mean(correct_exist, axis=(1, 2))
        metrics = {"correct_count": jnp.sum(correct), "count": jnp.sum(pad)}

        prediction = {
            "feature": jax.nn.sigmoid(feat_logits),
            "dense_adj": jax.nn.sigmoid(adj_logits),
        }
        return ModelOutput(prediction, cost_opt, cost_sum, metrics)

    def generate(self, batch: Batch, train: bool = False):
        """Decode from the prior: ε IS the latent (reference:
        example_model/model_vae_gen.py:16-33)."""
        g = batch.graph
        B, N = g.n_graph, g.max_nodes
        z = batch.rng_normal.reshape(B * N, self.latent_dim)
        feat_logits, adj_logits = self.decode(z, batch, train)
        return {
            "feature": jax.nn.sigmoid(feat_logits),
            "dense_adj": jax.nn.sigmoid(adj_logits),
        }
