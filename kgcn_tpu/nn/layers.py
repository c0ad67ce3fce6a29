"""Graph NN layer library (flax.linen).

Functional parity with the reference layer zoo (kgcn/layers.py) with
TPU-native execution.  Every aggregating layer has two fused execution paths,
selected by whether the batch carries a cached dense adjacency
(``GraphBatch.with_dense_adj()``):

* **dense** — batched matmuls over ``[C, B, N, N]`` adjacency; for molecular
  graph sizes this is a pure MXU workload and the fastest option on TPU.
* **sparse** — gather/segment-scatter over the packed COO edge lists
  (``kgcn_tpu.ops``); used for block-diagonal mega-batches and giant KGs.

Both replace the reference's per-graph, per-channel Python loops
(kgcn/layers.py:107-115) with single batched ops.

Semantics notes (checked against the reference, see SURVEY.md §2.2):
* GraphConv: per-channel weights AND biases, channel outputs summed
  (kgcn/layers.py:52-62,107-115).
* GIN: ``Σ_c (ε_c·X + A_c X)`` with learnable scalar ε per channel, zeros
  init — the reference's *naive-path* semantics (kgcn/layers.py:464-471);
  its custom-op paths silently drop ε, which we do NOT replicate.
* GAT: single-head edge attention with sigmoid output per channel, channels
  summed (kgcn/layers.py:477-542).  The reference gathers the softmax
  denominator at the SENDER's group (kgcn/layers.py:530-531) — reproducible
  via ``normalize="sender"``; default is the standard receiver-normalised
  softmax.
* GraphBatchNormalization: statistics over valid (un-padded) node rows only
  (kgcn/layers.py:188-210), implemented as masked moments instead of the
  reference's unstack/slice/concat dance.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from kgcn_tpu.graph.batch import GraphBatch
from kgcn_tpu.ops import segment
from kgcn_tpu.ops.spmm import ell_aggregate, spmm_dense, spmm_multichannel


def _flat(x: jnp.ndarray, graph: GraphBatch) -> jnp.ndarray:
    """Accept [V, F] or [B, N, F]; return [V, F]."""
    if x.ndim == 3:
        return x.reshape(graph.total_nodes, x.shape[-1])
    return x


def per_channel_glorot():
    """Glorot-uniform computed over the LAST TWO dims only — a [C, Fin, Fout]
    kernel initialises each channel like the reference's independent
    per-channel (Fin, Fout) weights (kgcn/layers.py:52-57), whereas jax's
    default would fold C into the fan."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[-2], shape[-1]
        limit = (6.0 / (fan_in + fan_out)) ** 0.5
        return jax.random.uniform(key, shape, dtype, -limit, limit)

    return init


def glorot_uniform_nd():
    """Glorot-uniform matching Keras's fan computation for ANY rank —
    including the 1-D relation vectors the reference initialises this way
    (kgcn/layers.py:292-296, 344-347); jax's glorot requires rank ≥ 2."""

    def init(key, shape, dtype=jnp.float32):
        if len(shape) < 2:
            fan_in = fan_out = shape[0] if shape else 1
        else:
            receptive = 1
            for s in shape[:-2]:
                receptive *= s
            fan_in, fan_out = shape[-2] * receptive, shape[-1] * receptive
        limit = (6.0 / (fan_in + fan_out)) ** 0.5
        return jax.random.uniform(key, shape, dtype, -limit, limit)

    return init


class GraphConv(nn.Module):
    """Multi-channel Kipf graph convolution: ``Σ_c A_c (X W_c + b_c)``.

    Reference: kgcn/layers.py:32-119 (GraphConv).
    """

    features: int
    channels: int = 1
    kernel_init: Callable = per_channel_glorot()

    @nn.compact
    def __call__(self, x, graph: GraphBatch):
        x = _flat(x, graph)
        C, F_in, F_out = self.channels, x.shape[-1], self.features
        # Params live in float32; casting them to the activation dtype makes
        # every matmul a true mixed-precision (e.g. bf16) MXU op.
        w = self.param("kernel", self.kernel_init, (C, F_in, F_out)).astype(x.dtype)
        b = self.param("bias", nn.initializers.zeros, (C, F_out)).astype(x.dtype)
        if graph.dense_adj is not None:
            from kgcn_tpu.ops.spmm import gconv_dense

            xb = x.reshape(graph.n_graph, graph.max_nodes, F_in)
            out = gconv_dense(graph.dense_adj, xb, w, b)
            return out.reshape(graph.total_nodes, F_out)
        hw = jnp.einsum("vf,cfo->cvo", x, w) + b[:, None, :]
        if graph.stream_adj is not None:
            # streaming scatter kernel (spmm_backend: "stream") — static
            # adjacency weights are baked into the structures, so pass
            # weights=None to opt into the baked fast path
            return spmm_multichannel(
                graph.senders, graph.receivers, None, hw,
                graph.total_nodes, backend="stream", stream=graph.stream_adj,
            )
        if graph.tiled_adj is not None:
            # tiled one-hot MXU Pallas kernel (spmm_backend: "tiled")
            return spmm_multichannel(
                graph.senders, graph.receivers, graph.edge_weights, hw,
                graph.total_nodes, backend="tiled", tiled=graph.tiled_adj,
            )
        if graph.ell_senders is not None:
            # scatter-free padded-neighbour-list aggregation (Pallas kernel
            # when spmm_backend=pallas and it lowers; XLA gather otherwise)
            return ell_aggregate(graph.ell_senders, graph.ell_weights, hw)
        return spmm_multichannel(
            graph.senders, graph.receivers, graph.edge_weights, hw,
            graph.total_nodes,
        )


class GINAggregate(nn.Module):
    """GIN aggregation: ``Σ_c (ε_c X + A_c X)``; ε learnable scalar per
    channel (zeros init).  Reference: kgcn/layers.py:400-475 (naive path)."""

    channels: int = 1

    @nn.compact
    def __call__(self, x, graph: GraphBatch):
        x = _flat(x, graph)
        eps = self.param("epsilon", nn.initializers.zeros, (self.channels,))
        if graph.dense_adj is not None:
            xb = x.reshape(graph.n_graph, graph.max_nodes, -1)
            agg = spmm_dense(graph.dense_adj, xb).reshape(x.shape)
        elif graph.stream_adj is not None:
            # weights=None: opt into the baked static-weight fast path
            agg = spmm_multichannel(
                graph.senders, graph.receivers, None, x,
                graph.total_nodes, backend="stream", stream=graph.stream_adj,
            )
        elif graph.tiled_adj is not None:
            agg = spmm_multichannel(
                graph.senders, graph.receivers, graph.edge_weights, x,
                graph.total_nodes, backend="tiled", tiled=graph.tiled_adj,
            )
        elif graph.ell_senders is not None:
            agg = ell_aggregate(graph.ell_senders, graph.ell_weights, x)
        else:
            agg = spmm_multichannel(
                graph.senders, graph.receivers, graph.edge_weights, x,
                graph.total_nodes,
            )
        return jnp.sum(eps).astype(x.dtype) * x + agg


class GAT(nn.Module):
    """Single-head graph attention per adjacency channel, channel-summed,
    sigmoid output.  Reference: kgcn/layers.py:477-542.

    ``normalize='receiver'`` (default) is the standard GAT edge-softmax over
    each receiver's in-edges; ``'sender'`` reproduces the reference's
    denominator gather (kgcn/layers.py:530-531).
    """

    channels: int = 1
    normalize: str = "receiver"
    kernel_init: Callable = per_channel_glorot()

    @nn.compact
    def __call__(self, x, graph: GraphBatch):
        x = _flat(x, graph)
        F = x.shape[-1]
        a = self.param("attn", self.kernel_init, (self.channels, 2 * F, 1)).astype(
            x.dtype
        )
        V = graph.total_nodes
        if graph.dense_adj is not None:
            return self._dense(x, graph, a)
        outs = []
        edge_mask = graph.edge_mask()
        for c in range(self.channels):
            s, r = graph.senders[c], graph.receivers[c]
            # logits = leakyrelu([x_sender ‖ x_receiver] · a).  The bilinear
            # form factorises into per-NODE scores gathered per edge — two
            # [V] matvecs + scalar gathers instead of [E, 2F] concats.  The
            # softmax runs in float32 regardless of the compute dtype (exp
            # of bf16 logits loses too much resolution).
            ls = (x @ a[c, :F, 0]).astype(jnp.float32)   # sender score [V]
            lr = (x @ a[c, F:, 0]).astype(jnp.float32)   # receiver score
            # tf.nn.leaky_relu default alpha=0.2 (reference kgcn/layers.py:528)
            logit = nn.leaky_relu(ls[s] + lr[r], negative_slope=0.2)
            if self.normalize == "receiver":
                alpha = segment.segment_softmax(logit, r, V, mask=edge_mask[c])
            else:
                # reference: denom grouped by receiver, gathered at sender
                e = jnp.exp(logit) * edge_mask[c]
                denom = segment.segment_sum(e, r, V)
                alpha = e / (denom[s] + 1e-10)
            if graph.tiled_adj is not None:
                # attention-weighted aggregation through the tiled one-hot
                # MXU kernel; its VJP emits d(alpha) via the tiled SDDMM —
                # the reference's bspmm gradient pair fused into attention
                # (kgcn/bspmm_call.py:21-57, kgcn/layers.py:477-542)
                from kgcn_tpu.ops.tiled_spmm import tiled_spmm

                agg = tiled_spmm(graph.tiled_adj[c], alpha, x).astype(x.dtype)
            else:
                agg = segment.segment_sum(
                    alpha.astype(x.dtype)[:, None] * x[s], r, V
                )
            outs.append(jax.nn.sigmoid(agg))
        return sum(outs)

    def _dense(self, x, graph: GraphBatch, a):
        """Dense-MXU attention for small padded graphs (N ≤ ~256).

        The edge logit/softmax/aggregation runs on the full [B, N, N] grid
        masked by the adjacency — three batched matmuls on the MXU instead
        of gather/scatter chains, the same trade GraphConv's dense path
        makes.  Bit-equivalent to the COO path (tests/test_layers.py)."""
        F = x.shape[-1]
        B, N = graph.n_graph, graph.max_nodes
        xb = x.reshape(B, N, F)
        neg = jnp.float32(-1e30)
        out = jnp.zeros((B, N, F), x.dtype)
        for c in range(self.channels):
            adj = graph.dense_adj[c]          # [B, N, N], out[r] = Σ_s A[r,s]·
            mask = (adj != 0)
            ls = (xb @ a[c, :F, 0]).astype(jnp.float32)   # sender score [B,N]
            lr = (xb @ a[c, F:, 0]).astype(jnp.float32)   # receiver score
            logit = nn.leaky_relu(
                ls[:, None, :] + lr[:, :, None], negative_slope=0.2
            )                                  # [B, r, s]
            logit = jnp.where(mask, logit, neg)
            if self.normalize == "receiver":
                m = jnp.maximum(jnp.max(logit, axis=-1, keepdims=True), neg)
                e = jnp.exp(logit - m) * mask
                denom = jnp.sum(e, axis=-1, keepdims=True)
                alpha = e / jnp.where(denom == 0, 1.0, denom)
            else:  # reference's sender-gathered denominator
                e = jnp.exp(logit) * mask
                denom = jnp.sum(e, axis=-1)   # per-receiver sums [B, N]
                alpha = e / (denom[:, None, :] + 1e-10)
            out = out + jax.nn.sigmoid(
                jnp.einsum("brs,bsf->brf", alpha.astype(x.dtype), xb)
            )
        return out.reshape(graph.total_nodes, F)


class GraphMaxPooling(nn.Module):
    """Neighbourhood max of ``A ⊙ x`` per feature dim, channel-summed.

    The reference densifies each sparse row, so implicit zeros participate in
    the max (kgcn/layers.py:122-153); we reproduce that with a floor at 0.
    """

    channels: int = 1

    @nn.compact
    def __call__(self, x, graph: GraphBatch):
        x = _flat(x, graph)
        V = graph.total_nodes
        N = graph.max_nodes
        out = jnp.zeros_like(x)
        edge_mask = graph.edge_mask()
        for c in range(self.channels):
            s, r = graph.senders[c], graph.receivers[c]
            contrib = graph.edge_weights[c][:, None] * x[s]
            # mask padding edges to -inf so they never win the max
            valid = edge_mask[c][:, None]
            contrib = jnp.where(valid > 0, contrib, -jnp.inf)
            m = segment.segment_max(contrib, r, V)
            # The reference's densified row contains a 0 for every NON-edge,
            # so 0 competes in the max only when the row is not fully dense;
            # an edgeless row maxes to 0 outright.
            deg = segment.segment_sum(edge_mask[c], r, V)
            m = jnp.where(deg[:, None] < N, jnp.maximum(m, 0.0), m)
            m = jnp.where(deg[:, None] == 0, 0.0, m)
            out = out + m
        return out


class GraphGather(nn.Module):
    """Graph-level readout: masked sum over each graph's nodes.

    Reference sums over the padded node axis unconditionally
    (kgcn/layers.py:156-167); we mask padding nodes — identical whenever
    upstream layers zero padded rows (which adjacency aggregation does).
    """

    @nn.compact
    def __call__(self, x, graph: GraphBatch):
        x = _flat(x, graph)
        xb = x.reshape(graph.n_graph, graph.max_nodes, -1)
        mask = graph.mask_batched()[..., None]
        return jnp.sum(xb * mask, axis=1)


class GraphDense(nn.Module):
    """Per-node dense layer; padded node rows are zeroed afterwards, matching
    the reference's masked variant which re-pads with zeros
    (kgcn/layers.py:223-265)."""

    features: int
    use_bias: bool = True
    mask_output: bool = True

    @nn.compact
    def __call__(self, x, graph: Optional[GraphBatch] = None):
        if graph is not None:
            x = _flat(x, graph)
        out = nn.Dense(self.features, use_bias=self.use_bias, dtype=x.dtype)(x)
        if graph is not None and self.mask_output:
            out = out * graph.node_mask.astype(out.dtype)[:, None]
        return out


class GraphBatchNormalization(nn.Module):
    """Batch norm over valid node rows only (mask-aware moments).

    Reference: kgcn/layers.py:170-220 — it slices each graph to its
    ``enabled_node_num`` rows, BN-normalises the concatenation, then re-pads.
    Masked moments compute the same statistics with static shapes.
    """

    # Momentum note (validated, tests/test_reference_parity.py trajectory
    # test): the reference's BN momentum is IRRELEVANT to its behaviour —
    # it never feeds the Keras learning phase, so its BatchNormalization
    # resolves training=0 at graph build, creates NO update ops
    # (kgcn/core.py:122 collects an empty UPDATE_OPS), and normalises with
    # frozen initial statistics (mean 0, var 1) for its entire life: the
    # layer degenerates to ``x·γ/√(1+ε)+β``.  Our layer performs real
    # mask-aware batch normalisation; momentum 0.9 (vs Keras's 0.99) makes
    # the running statistics OUR eval path uses converge within the short
    # epoch counts typical of these workloads.  Reference-exact trajectories
    # are reproduced by running with ``use_running_average=True`` (frozen
    # stats) — 5-epoch Adam loss curves then match the reference to ~1e-5.
    momentum: float = 0.9
    epsilon: float = 1e-3
    use_running_average: Optional[bool] = None

    @nn.compact
    def __call__(self, x, graph: GraphBatch, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        in_dtype = x.dtype
        x = _flat(x, graph).astype(jnp.float32)  # moments in full precision
        F = x.shape[-1]
        mask = graph.node_mask.astype(jnp.float32)[:, None]
        count = jnp.maximum(jnp.sum(mask), 1.0)

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((F,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((F,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (F,))
        bias = self.param("bias", nn.initializers.zeros, (F,))

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.sum(x * mask, axis=0) / count
            var = jnp.sum(mask * (x - mean) ** 2, axis=0) / count
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return (y * mask).astype(in_dtype)


class NodeEmbedding(nn.Module):
    """Node-id embedding table for KG / featureless mode
    (reference: kgcn/default_model.py:24-27 ``with_node_embedding``)."""

    vocab_size: int
    features: int

    @nn.compact
    def __call__(self, graph: GraphBatch):
        emb = nn.Embed(self.vocab_size, self.features)(graph.node_ids)
        return emb * graph.node_mask[:, None]


class GraphDecoderInnerProd(nn.Module):
    """Adjacency reconstruction ``Z Zᵀ`` (graph-VAE decoder).
    Reference: kgcn/layers.py:268-282."""

    @nn.compact
    def __call__(self, z, graph: GraphBatch):
        z = _flat(z, graph)
        zb = z.reshape(graph.n_graph, graph.max_nodes, -1)
        return jnp.einsum("bnf,bmf->bnm", zb, zb)


class GraphDecoderDistMult(nn.Module):
    """``(w ⊙ Z) Zᵀ`` with a learned diagonal relation vector.
    Reference: kgcn/layers.py:285-305."""

    kernel_init: Callable = glorot_uniform_nd()

    @nn.compact
    def __call__(self, z, graph: GraphBatch):
        z = _flat(z, graph)
        zb = z.reshape(graph.n_graph, graph.max_nodes, -1)
        w = self.param("kernel", self.kernel_init, (zb.shape[-1],)).astype(z.dtype)
        return jnp.einsum("bnf,bmf->bnm", w * zb, zb)


class DistMult(nn.Module):
    """Multi-relation DistMult scorer (reference: kgcn/layers.py:307-358).

    ``w`` is ``[channels, dim]``; methods mirror the reference API:
    ``score`` for (h, t) pairs, ``left_prediction``/``right_prediction`` for
    all-entity scoring, ``__call__`` for full dense reconstruction.
    """

    dim: int = 0  # embedding dim; required for score/prediction methods
    channels: int = 1
    kernel_init: Callable = glorot_uniform_nd()

    def setup(self):
        assert self.dim > 0, "DistMult requires dim"
        self.kernel = self.param(
            "kernel", self.kernel_init, (self.channels, self.dim)
        )

    def __call__(self, z, graph: GraphBatch):
        z = _flat(z, graph)
        zb = z.reshape(graph.n_graph, graph.max_nodes, -1)
        return jnp.einsum("cf,bnf,bmf->bcnm", self.kernel, zb, zb)

    def score(self, z_head, z_tail, channel):
        """``Σ_f h_f · w_{r,f} · t_f`` per row (kgcn/layers.py:321-325).

        The per-row relation gather goes through ``segment.embed_rows``
        (one-hot matmul): with millions of triples hitting a handful of
        relation rows, the backward becomes an MXU matmul instead of a
        collision-heavy scatter-add (3.5× on TPU at L=1M, C=8).
        """
        wc = segment.embed_rows(self.kernel, channel)
        return jnp.sum(z_head * z_tail * wc, axis=-1)

    def left_prediction(self, z_all, z_tail, channel):
        """Score every entity as head: [batch, num_nodes]
        (kgcn/layers.py:327-337)."""
        wc = self.kernel[channel]
        return (z_tail * wc) @ z_all.T

    def right_prediction(self, z_head, z_all, channel):
        """Score every entity as tail (kgcn/layers.py:339-347)."""
        wc = self.kernel[channel]
        return (z_head * wc) @ z_all.T
