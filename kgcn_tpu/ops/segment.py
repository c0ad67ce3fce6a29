"""Segment reductions used by the sparse aggregation paths.

Thin wrappers over ``jax.ops.segment_*`` plus a numerically-stable
segment-softmax (the edge-softmax primitive behind GAT attention —
the reference built this via one-hot incidence matmuls per graph,
kgcn/layers.py:511-535; here it is three segment ops over the packed
edge list, which XLA lowers to efficient sorted-scatter code).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments: int):
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=False
    )


def segment_max(data, segment_ids, num_segments: int):
    return jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=False
    )


def segment_softmax(logits, segment_ids, num_segments: int, mask=None):
    """Softmax of ``logits`` within each segment.

    ``logits``: [E] (or [E, H] with per-head last axis), ``segment_ids``: [E].
    ``mask``: optional [E] float/bool; masked-out entries get probability 0.
    """
    neg = jnp.asarray(-1e30, logits.dtype)
    masked = logits if mask is None else jnp.where(mask > 0, logits, neg)
    seg_max = segment_max(masked, segment_ids, num_segments)
    # Empty segments produce -inf max; clamp so exp() stays finite.
    seg_max = jnp.maximum(seg_max, neg)
    shifted = masked - seg_max[segment_ids]
    exp = jnp.exp(shifted)
    if mask is not None:
        exp = exp * (mask > 0)
    denom = segment_sum(exp, segment_ids, num_segments)
    denom = jnp.where(denom == 0, 1.0, denom)
    return exp / denom[segment_ids]
