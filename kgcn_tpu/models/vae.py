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


def _weighted_bce(labels, logits, pos_weight):
    """tf.nn.weighted_cross_entropy_with_logits, float32 accumulation."""
    logits = logits.astype(jnp.float32)
    log_weight = 1.0 + (pos_weight - 1.0) * labels
    return (1.0 - labels) * logits + log_weight * (
        jax.nn.softplus(-jnp.abs(logits)) + jnp.maximum(-logits, 0.0)
    )


class GCNVAE(nn.Module):
    """Graph VAE with feature + link decoders.

    ``link_only=True`` gives the reference's link-only variant
    (example_model/model_vae_onlylink.py:155-235): no feature decoder,
    pos_weight-weighted adjacency CE scaled by ``norm`` (both computed from
    edge density by the engine, gcn_gen.py:51-74), its KL variant
    ``(0.5/70)·mean_D(Σ_N 1 + 2logσ − z² − σ)`` and cost
    ``|mean(cost) − mean(kl)|`` replicated verbatim; the prediction's
    ``feature`` entry passes the input features through.
    """

    channels: int = 1
    feature_dim: int = 0
    latent_dim: int = 64
    internal_dim: int = 64
    link_only: bool = False
    pos_weight: float = 1.0
    norm: float = 1.0

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
        if not self.link_only:
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
        feat_logits = (
            None if self.link_only
            else self.node_decoder(z, g).reshape(B, N, self.feature_dim)
        )
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
        if self.link_only:
            # model_vae_onlylink.py:201-216: pos_weight CE on links only,
            # norm scaling, KL over the sampled z, |cost − kl| objective
            wce = _weighted_bce(target_adj, adj_logits, self.pos_weight)
            cost = pad * (self.norm * jnp.mean(wce, axis=(1, 2, 3)))
            z_b = z.reshape(B, N, self.latent_dim).astype(jnp.float32)
            # same ε guard as the main-branch KL — log(0) when std
            # underflows would make the |cost − kl| objective infinite
            kl_el = 1.0 + 2.0 * jnp.log(std_t.astype(jnp.float32) + e) \
                - z_b**2 - std_t.astype(jnp.float32)
            kl = (0.5 / 70.0) * jnp.mean(jnp.sum(kl_el, axis=1), axis=1)
            cost_opt = jnp.abs(jnp.mean(cost) - jnp.mean(kl))
            cost_sum = jnp.mean(cost)
        else:
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
            # link-only passes input features through (model_vae_onlylink.py:233)
            "feature": (target_feat if self.link_only
                        else jax.nn.sigmoid(feat_logits)),
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
        out = {"dense_adj": jax.nn.sigmoid(adj_logits)}
        if feat_logits is not None:
            out["feature"] = jax.nn.sigmoid(feat_logits)
        return out
