"""Edge-partitioned SpMM across a device mesh — the GNN analogue of
sequence/context parallelism (SURVEY.md §2.11: "graph/edge partitioning").

Workload: ONE giant graph (whole-KG training, protein-interaction networks —
the reference runs these batch=1 on a single device, sample_kg) whose nodes
and edges no longer fit one chip.

Design:

* nodes are partitioned into D contiguous blocks; device d owns feature rows
  ``x[d·V/D : (d+1)·V/D]``;
* edges are partitioned by RECEIVER block, so the scatter side of every
  aggregation is device-local;
* sender features may live on another device.  Two halo strategies:
  - ``allgather``: one ``all_gather`` of the node blocks, then a fully local
    gather/scatter.  Simple; memory O(V·F) per device.
  - ``ring``: D steps of ``ppermute`` rotate node blocks around the ring
    while each device aggregates the edge group whose sender block just
    arrived — compute overlaps the collective, and per-device memory stays
    O(V/D·F).  This is the ring-attention-style schedule adapted to
    segment-sum aggregation.

Host-side, edges of receiver-block d are grouped by sender-block *offset*
``o = (d − sender_block) mod D`` (the block a device holds after o ring
hops), padded to a common static budget per group.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


class PartitionedEdges(NamedTuple):
    """Static edge partition for a D-device ring.

    senders_local: [D, D, E] — ``[d, o]`` = edges of receiver-block d whose
        sender block is ``(d − o) mod D``, sender index local to that block.
    receivers_local: [D, D, E] — receiver index local to block d.
    weights: [D, D, E] — 0 marks padding.
    v_local: nodes per block (V must divide D·v_local).
    """

    senders_local: np.ndarray
    receivers_local: np.ndarray
    weights: np.ndarray
    v_local: int


def partition_edges(senders, receivers, weights, num_nodes: int,
                    num_devices: int) -> PartitionedEdges:
    """Host-side grouping of a COO edge list for the ring schedule."""
    D = num_devices
    assert num_nodes % D == 0, f"pad num_nodes {num_nodes} to a multiple of {D}"
    v_loc = num_nodes // D
    s = np.asarray(senders)
    r = np.asarray(receivers)
    w = np.asarray(weights)
    valid = w != 0
    s, r, w = s[valid], r[valid], w[valid]
    if len(s) and (int(s.max()) >= num_nodes or int(r.max()) >= num_nodes
                   or int(s.min()) < 0 or int(r.min()) < 0):
        # out-of-range ids would fall outside the D*D group table and
        # vanish silently from the partition
        raise ValueError(
            f"edge endpoints must lie in [0, {num_nodes}); got "
            f"senders [{s.min()}, {s.max()}], receivers [{r.min()}, {r.max()}]"
        )
    rb = r // v_loc
    sb = s // v_loc
    off = (rb - sb) % D

    # single pass: stable-sort edges by (receiver block, offset) group key,
    # then fill each group's slice — O(E log E) instead of O(D²·E) masks
    key = rb * D + off
    order = np.argsort(key, kind="stable")
    counts = np.bincount(key, minlength=D * D)
    budget = max(int(counts.max(initial=1)), 1)
    budget = ((budget + 127) // 128) * 128  # lane-round the static budget

    sl = np.zeros((D, D, budget), np.int32)
    rl = np.zeros((D, D, budget), np.int32)
    wl = np.zeros((D, D, budget), np.float32)
    pos = 0
    for g in range(D * D):
        k = int(counts[g])
        if k:
            d, o = divmod(g, D)
            sel = order[pos : pos + k]
            sl[d, o, :k] = s[sel] % v_loc
            rl[d, o, :k] = r[sel] % v_loc
            wl[d, o, :k] = w[sel]
            pos += k
    return PartitionedEdges(sl, rl, wl, v_loc)


def ring_spmm_local(x_blk, s_d, r_d, w_d, axis: str):
    """Per-device ring aggregation, usable INSIDE any enclosing shard_map.

    ``x_blk``: [v_loc, F] this device's node block; ``s_d/r_d/w_d``: [D, E]
    this device's edge groups by sender-block offset.  D steps of ``ppermute``
    rotate the node blocks while each offset group is gathered/segment-summed
    — compute overlaps the collective (statically unrolled so XLA can
    pipeline), per-device memory stays O(v_loc·F).
    """
    D = s_d.shape[0]
    v_loc = x_blk.shape[0]
    perm = [(i, (i + 1) % D) for i in range(D)]
    x_rot = x_blk
    acc = jnp.zeros_like(x_blk)
    for o in range(D):
        gathered = x_rot[s_d[o]] * w_d[o][:, None].astype(x_blk.dtype)
        acc = acc + jax.ops.segment_sum(gathered, r_d[o], num_segments=v_loc)
        if o + 1 < D:
            x_rot = jax.lax.ppermute(x_rot, axis, perm)
    return acc


def ring_spmm_local_channels(xs, s_cd, r_cd, w_cd, axis: str):
    """Channel-summed ring aggregation with ONE ppermute per hop.

    ``xs``: [C, v_loc, F] per-channel inputs (rotated as one stack) or
    [v_loc, F] shared input (GIN — rotated once, C× fewer halo bytes than
    per-channel rings).  ``s_cd/r_cd/w_cd``: [C, D, E].  Returns the
    channel SUM [v_loc, F] — per-channel ring loops would issue C·(D−1)
    collectives per layer for no algorithmic reason (multi-relation KGs).
    """
    C, D, _ = s_cd.shape
    shared = xs.ndim == 2
    v_loc = xs.shape[-2]
    perm = [(i, (i + 1) % D) for i in range(D)]
    rot = xs
    acc = jnp.zeros((v_loc, xs.shape[-1]), xs.dtype)
    for o in range(D):
        for c in range(C):
            xc = rot if shared else rot[c]
            g = xc[s_cd[c, o]] * w_cd[c, o][:, None].astype(xs.dtype)
            acc = acc + jax.ops.segment_sum(g, r_cd[c, o],
                                            num_segments=v_loc)
        if o + 1 < D:
            rot = jax.lax.ppermute(rot, axis, perm)
    return acc


def allgather_spmm_local_channels(xs, s_cd, r_cd, w_cd, axis: str):
    """Channel-summed all-gather aggregation: one collective for the whole
    stack.  Same contract as :func:`ring_spmm_local_channels`."""
    C, D, _ = s_cd.shape
    shared = xs.ndim == 2
    v_loc = xs.shape[-2]
    full = jax.lax.all_gather(xs, axis)  # [D, (C,) v_loc, F]
    d = jax.lax.axis_index(axis)
    acc = jnp.zeros((v_loc, xs.shape[-1]), xs.dtype)
    for o in range(D):
        blk = full[(d - o) % D]
        for c in range(C):
            xc = blk if shared else blk[c]
            g = xc[s_cd[c, o]] * w_cd[c, o][:, None].astype(xs.dtype)
            acc = acc + jax.ops.segment_sum(g, r_cd[c, o],
                                            num_segments=v_loc)
    return acc


def allgather_spmm_local(x_blk, s_d, r_d, w_d, axis: str):
    """Per-device all-gather aggregation (memory O(V·F), one collective)."""
    D = s_d.shape[0]
    v_loc = x_blk.shape[0]
    x_full = jax.lax.all_gather(x_blk, axis)  # [D, v_loc, F]
    d = jax.lax.axis_index(axis)
    acc = jnp.zeros_like(x_blk)
    for o in range(D):
        src_blk = (d - o) % D
        gathered = x_full[src_blk][s_d[o]] * w_d[o][:, None].astype(x_blk.dtype)
        acc = acc + jax.ops.segment_sum(gathered, r_d[o], num_segments=v_loc)
    return acc


def _compiled_spmm(mesh: Mesh, axis: str, strategy: str):
    """One jitted shard_map program per (mesh, axis, strategy) — jit's own
    cache then handles shape variation.  Rebuilding the closure per call
    would defeat the compile cache entirely (every invocation re-traces and
    re-compiles)."""
    key = (mesh, axis, strategy)
    fn = _SPMM_CACHE.get(key)
    if fn is not None:
        return fn
    local = ring_spmm_local if strategy == "ring" else allgather_spmm_local

    def body(x_blk, s_d, r_d, w_d):
        return local(x_blk, s_d[0], r_d[0], w_d[0], axis)

    fn = jax.jit(
        shard_map(
            body,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=P(axis),
            check_vma=False,
        )
    )
    _SPMM_CACHE[key] = fn
    return fn


_SPMM_CACHE: dict = {}
_DEVICE_CACHE: dict = {}  # id(part) -> (part, sl, rl, wl); part kept alive


def _device_arrays(part: PartitionedEdges):
    """Upload the static [D, D, E] edge partition once per PartitionedEdges
    instead of on every call."""
    key = id(part)
    ent = _DEVICE_CACHE.get(key)
    if ent is not None and ent[0] is part:
        # LRU: refresh recency so cycling through >16 live partitions
        # doesn't evict the hot ones (dict preserves insertion order)
        _DEVICE_CACHE.pop(key)
        _DEVICE_CACHE[key] = ent
        return ent[1:]
    arrs = (
        jnp.asarray(part.senders_local),
        jnp.asarray(part.receivers_local),
        jnp.asarray(part.weights),
    )
    if len(_DEVICE_CACHE) >= 16:  # bound the pin on host/device memory
        _DEVICE_CACHE.pop(next(iter(_DEVICE_CACHE)))
    _DEVICE_CACHE[key] = (part,) + arrs
    return arrs


def spmm_edge_partitioned(part: PartitionedEdges, x, mesh: Mesh,
                          axis: str = "data", strategy: str = "ring"):
    """Distributed ``out[r] = Σ w_e x[s_e]`` over the mesh.

    ``x``: [V, F] sharded row-blocks (or replicated host array; the shard_map
    in_spec slices it).  Returns [V, F] with the same block sharding.
    """
    if strategy not in ("ring", "allgather"):
        raise ValueError(f"unknown halo strategy {strategy!r}")
    D = part.senders_local.shape[0]
    if mesh.shape[axis] != D:
        # a mismatch would shard the [D, D, E] tables wrongly and return
        # silently wrong aggregation (each device reads the wrong groups)
        raise ValueError(
            f"partition built for {D} devices but mesh axis {axis!r} has "
            f"{mesh.shape[axis]}"
        )
    sl, rl, wl = _device_arrays(part)
    return _compiled_spmm(mesh, axis, strategy)(x, sl, rl, wl)
