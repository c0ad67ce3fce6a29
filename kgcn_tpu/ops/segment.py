"""Segment reductions used by the sparse aggregation paths.

Thin wrappers over ``jax.ops.segment_*`` plus a numerically-stable
segment-softmax (the edge-softmax primitive behind GAT attention —
the reference built this via one-hot incidence matmuls per graph,
kgcn/layers.py:511-535; here it is three segment ops over the packed
edge list, which XLA lowers to efficient sorted-scatter code).
"""
from __future__ import annotations

from functools import partial

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


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def take_rows(table, idx, num_rows: int):
    """Row gather ``table[idx]`` with a sort-based backward.

    Forward is a plain gather.  Backward replaces XLA's unsorted
    scatter-add (what autodiff of a gather emits) with argsort + sorted
    ``segment_sum``.  Opt-in primitive: measured on the sharded KG train
    step (V=100k, 1M triples, TPU v5e) the four extra 1M-element argsorts
    made the step 27% SLOWER than XLA's native scatter, so the model code
    does not use it by default — it exists for workloads whose index
    distributions are far more collision-heavy than uniform (e.g. power-law
    entity frequencies), where sorted accumulation can win.  ``num_rows``
    must equal ``table.shape[0]`` (static).
    """
    return table[idx]


def _take_rows_fwd(table, idx, num_rows: int):
    return table[idx], idx


def _take_rows_bwd(num_rows: int, idx, g):
    perm = jnp.argsort(idx)
    grad = jax.ops.segment_sum(
        g[perm], idx[perm], num_segments=num_rows, indices_are_sorted=True
    )
    return grad, None


take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


def embed_rows(table, idx):
    """Gather rows from a SMALL table via one-hot matmul.

    For a [C, F] table with C small (relation/channel tables), both the
    forward (``one_hot @ table``) and the backward (``one_hotᵀ @ g``) are
    MXU matmuls — 3.5× faster on TPU than the collision-heavy scatter-add
    that autodiff of ``table[idx]`` produces when millions of rows hit a
    handful of table entries.  Falls back to a plain gather for scalar
    ``idx`` or large tables where the one-hot would dominate.
    """
    if jnp.ndim(idx) == 0 or table.shape[0] > 256:
        return table[idx]
    oh = jax.nn.one_hot(idx, table.shape[0], dtype=table.dtype)
    return oh @ table


def segment_softmax(logits, segment_ids, num_segments: int, mask=None):
    """Softmax of ``logits`` within each segment.

    ``logits``: [E] (or [E, H] with per-head last axis), ``segment_ids``: [E].
    ``mask``: optional [E] float/bool; masked-out entries get probability 0.
    """
    neg = jnp.asarray(-1e30, logits.dtype)
    if mask is not None and mask.ndim < logits.ndim:
        # [E] mask against [E, H] logits: align on the edge axis
        mask = mask.reshape(mask.shape + (1,) * (logits.ndim - mask.ndim))
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
