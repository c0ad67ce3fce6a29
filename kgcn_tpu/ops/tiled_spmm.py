"""Tiled one-hot MXU SpMM — the Pallas sparse-aggregation kernel for graphs
of ANY size (replaces the VMEM-capped row-gather kernel in pallas_spmm.py,
which Mosaic rejects on this backend).

Semantics match the reference's native bspmm op
(``out[r] = Σ_e w_e · x[s_e]``, /root/reference/kgcn/bspmm_call.py:6-15) with
the same registered gradient pair — transpose-spmm for ``dx`` and SDDMM for
the values gradient (kgcn/bspmm_call.py:21-57) — both supplied here as
custom-VJP Pallas kernels sharing one edge structure.

Design (TPU-first, no dynamic gather/scatter anywhere):

* Edges are sorted host-side by ``(receiver_tile, sender_tile)`` and packed
  into fixed-size chunks that never cross a tile pair
  (:func:`build_tiled`).  The structure is topology-only and built once per
  dataset; edge weights stay a dynamic (differentiable) ``[E]`` input.
* A ``PrefetchScalarGridSpec`` kernel walks the chunk list: scalar-prefetched
  per-chunk tile ids drive the BlockSpec index maps, so Pallas's pipeline
  DMAs each ``x`` sender tile from HBM exactly once per (rt, st) pair and
  keeps the output receiver tile resident across its chunks.
* Inside the kernel the gather and scatter are **one-hot matmuls built from
  iota comparisons** — `(iota == s_loc) * w` times the x tile on the MXU,
  then `(iota == r_loc)` times the messages.  Mosaic lowers comparisons and
  matmuls unconditionally, which is what makes this kernel viable where the
  in-VMEM row gather was not.
* Feature matrices of any size work: only one ``[ts, F]`` sender tile and one
  ``[tr, F]`` accumulator live in VMEM at a time.

Cost model: per edge slot the MXU does ``2·F·(ts+tr)`` FLOPs and each
(rt, st) pair loads one ``ts×F`` x tile from HBM, so small tiles cut compute
while clustered graphs (block-diagonal molecular batches, reordered KGs) cut
both padding and tile reloads.  :func:`choose_tiling` picks the config from
the exact host-side pair histogram.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


@dataclasses.dataclass(frozen=True)
class TiledMeta:
    """Static (hashable) shape metadata for one tiled edge structure."""

    ts: int          # sender-tile rows (x tile height)
    tr: int          # receiver-tile rows (out tile height)
    chunk: int       # edge slots per grid step
    n_chunks: int
    n_st: int        # sender tiles  (x padded to n_st*ts rows)
    n_rt: int        # receiver tiles (out padded to n_rt*tr rows)
    num_senders: int     # true x row count
    num_receivers: int   # true out row count
    num_edges: int       # true E (slot_src sentinel value)


@struct.dataclass
class TiledCOO:
    """Device arrays of one tiled edge structure (weights NOT included —
    they are a dynamic per-call input, so learned/attention weights work).

    A registered pytree (``meta`` is static aux data), so it can live on a
    ``GraphBatch``, be a jit argument, and cross ``shard_map`` boundaries.

    s_loc/r_loc: [n_chunks, chunk] int32 — sender/receiver index local to the
        chunk's tile; padding slots are 0.
    slot_src: [n_chunks, chunk] int32 — original edge id per slot; padding
        slots carry the sentinel ``num_edges`` (maps to an appended zero
        weight).
    chunk_rt/chunk_st: [n_chunks] int32 — tile ids per chunk.
    chunk_first: [n_chunks] int32 — 1 on the first chunk of each rt (the
        kernel zeroes the accumulator there).
    meta: static shape info.
    transpose: the same edges with senders/receivers swapped (for dx);
        built once, itself has ``transpose=None``.
    """

    s_loc: jax.Array
    r_loc: jax.Array
    slot_src: jax.Array
    chunk_rt: jax.Array
    chunk_st: jax.Array
    chunk_first: jax.Array
    meta: TiledMeta = struct.field(pytree_node=False)
    transpose: Optional["TiledCOO"] = None
    # locality relabeling (build_tiled(locality=True)): node_perm[new] = old,
    # node_inv[old] = new.  The structure's tiles live in the relabeled
    # space; tiled_spmm permutes x in and the output back out.
    node_perm: Optional[jax.Array] = None
    # [E] flat slot of each original edge (sentinel = total slot count);
    # precomputed host-side at build time for tiled_sddmm's slot→edge map
    edge_slot: Optional[jax.Array] = None
    node_inv: Optional[jax.Array] = None


def _build_arrays(s, r, eid, num_senders, num_receivers, num_edges,
                  ts, tr, chunk):
    """Vectorised host-side packing of one direction. s/r/eid are the valid
    (nonzero-weight) edges; eid maps back to original edge positions."""
    n_st = max(_cdiv(num_senders, ts), 1)
    n_rt = max(_cdiv(num_receivers, tr), 1)
    st = s // ts
    rt = r // tr
    key = rt.astype(np.int64) * n_st + st
    order = np.argsort(key, kind="stable")
    key_sorted = key[order]

    # pairs present, their counts, and each edge's rank within its pair
    pair_keys, pair_starts, pair_counts = np.unique(
        key_sorted, return_index=True, return_counts=True
    )
    first_idx = np.searchsorted(key_sorted, key_sorted, side="left")
    rank = np.arange(len(order), dtype=np.int64) - first_idx

    # every receiver tile must own ≥1 chunk so its out block gets zeroed
    present_rt = np.unique(pair_keys // n_st)
    missing_rt = np.setdiff1d(
        np.arange(n_rt, dtype=np.int64), present_rt, assume_unique=True
    )
    all_keys = np.concatenate([pair_keys, missing_rt * n_st])  # filler st=0
    all_counts = np.concatenate(
        [pair_counts, np.zeros(len(missing_rt), np.int64)]
    )
    porder = np.argsort(all_keys, kind="stable")
    all_keys, all_counts = all_keys[porder], all_counts[porder]
    chunks_per_pair = np.maximum(_cdiv(all_counts, chunk), 1)
    chunk_base = np.concatenate([[0], np.cumsum(chunks_per_pair)])
    n_chunks = int(chunk_base[-1])

    chunk_rt = np.repeat(all_keys // n_st, chunks_per_pair).astype(np.int32)
    chunk_st = np.repeat(all_keys % n_st, chunks_per_pair).astype(np.int32)
    chunk_first = np.zeros(n_chunks, np.int32)
    if n_chunks:
        chunk_first[0] = 1
        chunk_first[1:][chunk_rt[1:] != chunk_rt[:-1]] = 1

    # slot of each sorted edge = (base chunk of its pair)·chunk + rank
    pair_rank = np.searchsorted(all_keys, key_sorted)
    slot = chunk_base[pair_rank] * chunk + rank

    slot_src = np.full(n_chunks * chunk, num_edges, np.int32)
    s_loc = np.zeros(n_chunks * chunk, np.int32)
    r_loc = np.zeros(n_chunks * chunk, np.int32)
    slot_src[slot] = eid[order]
    s_loc[slot] = (s[order] % ts).astype(np.int32)
    r_loc[slot] = (r[order] % tr).astype(np.int32)

    meta = TiledMeta(
        ts=ts, tr=tr, chunk=chunk, n_chunks=n_chunks, n_st=n_st, n_rt=n_rt,
        num_senders=num_senders, num_receivers=num_receivers,
        num_edges=num_edges,
    )
    return TiledCOO(
        s_loc=jnp.asarray(s_loc.reshape(n_chunks, chunk)),
        r_loc=jnp.asarray(r_loc.reshape(n_chunks, chunk)),
        slot_src=jnp.asarray(slot_src.reshape(n_chunks, chunk)),
        chunk_rt=jnp.asarray(chunk_rt),
        chunk_st=jnp.asarray(chunk_st),
        chunk_first=jnp.asarray(chunk_first),
        meta=meta,
        transpose=None,
    )


def build_tiled(senders, receivers, num_nodes: int, *,
                weights=None, num_sender_nodes: int | None = None,
                ts: int = 512, tr: int = 512, chunk: int = 128,
                with_transpose: bool = True,
                chunk_budget: int | None = None,
                locality: bool = False,
                valid_mask=None) -> TiledCOO:
    """Build the tiled chunk structure (host-side, topology only).

    ``valid_mask`` ([E], nonzero = real edge) names the PADDING edges to
    drop explicitly; prefer it when a valid edge may legitimately carry a
    zero weight (dynamic attention weights are independent of build-time
    adjacency values).  Without it,
    ``weights`` is only consulted to DROP padding edges (weight 0) from the
    structure; actual weight values are a dynamic input to
    :func:`tiled_spmm`.  ``num_sender_nodes`` defaults to ``num_nodes``
    (square adjacency).

    ``locality``: relabel nodes degree-descending (:func:`locality_order`)
    before tiling, so power-law graphs concentrate their edges into few
    (rt, st) tile pairs — fewer chunks, fewer x-tile reloads (measured
    2-3× on clustered vs uniform regimes, docs/performance.md).  The
    permutation is carried on the structure and applied transparently by
    :func:`tiled_spmm` (one V-row take in, one out — ~10× cheaper than the
    slot gather it shrinks).  Square adjacency only.
    """
    assert ts % 8 == 0 and tr % 8 == 0 and chunk % 8 == 0, (
        "tile/chunk sizes must be sublane-aligned (multiples of 8)"
    )
    if not _interpret():
        # compiled TPU mode with the default bf16 payload needs 16-sublane
        # x/out blocks (native bf16 tiling is (16, 128)); catch it at build
        # time instead of a Mosaic lowering failure on chip
        assert ts % 16 == 0 and tr % 16 == 0, (
            f"ts={ts}/tr={tr} must be multiples of 16 for compiled TPU "
            "mode (bf16 sublane tiling)"
        )
    s = np.asarray(senders).astype(np.int64)
    r = np.asarray(receivers).astype(np.int64)
    num_edges = len(s)
    if valid_mask is not None:
        valid = np.asarray(valid_mask) != 0
    elif weights is not None:
        valid = np.asarray(weights) != 0
    else:
        valid = np.ones(num_edges, bool)
    eid = np.arange(num_edges, dtype=np.int32)[valid]
    s_v, r_v = s[valid], r[valid]
    n_send = num_sender_nodes if num_sender_nodes is not None else num_nodes

    perm = inv = None
    if locality:
        assert n_send == num_nodes, "locality relabel needs square adjacency"
        perm = locality_order(s_v, r_v, num_nodes)       # perm[new] = old
        inv = np.empty_like(perm)
        inv[perm] = np.arange(num_nodes, dtype=perm.dtype)
        s_v, r_v = inv[s_v], inv[r_v]

    te = _build_arrays(s_v, r_v, eid, n_send, num_nodes, num_edges,
                       ts, tr, chunk)
    if chunk_budget is not None:
        te = _pad_chunks(te, chunk_budget)
    if with_transpose:
        tt = _build_arrays(r_v, s_v, eid, num_nodes, n_send, num_edges,
                           tr, ts, chunk)
        if chunk_budget is not None:
            tt = _pad_chunks(tt, chunk_budget)
        te = te.replace(transpose=tt)
    if perm is not None:
        te = te.replace(node_perm=jnp.asarray(perm.astype(np.int32)),
                        node_inv=jnp.asarray(inv.astype(np.int32)))
    # slot-of-edge map, precomputed host-side AFTER padding (the absent-edge
    # sentinel is the FINAL slot count) — tiled_sddmm's per-call device
    # scatter replaced by one numpy pass
    te = te.replace(edge_slot=jnp.asarray(_slot_of_edge_np(te)))
    return te


def _slot_of_edge_np(te: TiledCOO) -> np.ndarray:
    """[E] int32: flat slot of each original edge; absent (dropped) edges
    carry ``total`` — the index of the appended zero in the caller's
    extended per-slot value vector."""
    m = te.meta
    total = m.n_chunks * m.chunk
    src = np.asarray(te.slot_src).reshape(-1)
    out = np.full((m.num_edges + 1,), total, np.int64)
    out[src] = np.arange(total, dtype=np.int64)
    return out[: m.num_edges].astype(np.int32)


def _pad_chunks(te: TiledCOO, budget: int) -> TiledCOO:
    """Pad the chunk list to a fixed ``budget`` so different topologies share
    one static meta (one compiled executable across streaming batches).

    Filler chunks repeat the LAST chunk's (rt, st) with ``chunk_first=0`` and
    all-padding slots, so they re-visit the final output tile consecutively
    and add the appended zero weight — a no-op."""
    m = te.meta
    if m.n_chunks > budget:
        raise ValueError(
            f"chunk budget {budget} < required {m.n_chunks}; raise the "
            f"budget or the chunk size"
        )
    pad = budget - m.n_chunks
    if pad == 0:
        return te
    npad = np.zeros((pad, m.chunk), np.int32)
    last_rt = int(te.chunk_rt[-1]) if m.n_chunks else 0
    last_st = int(te.chunk_st[-1]) if m.n_chunks else 0
    return TiledCOO(
        s_loc=jnp.concatenate([te.s_loc, jnp.asarray(npad)]),
        r_loc=jnp.concatenate([te.r_loc, jnp.asarray(npad)]),
        slot_src=jnp.concatenate(
            [te.slot_src,
             jnp.full((pad, m.chunk), m.num_edges, jnp.int32)]
        ),
        chunk_rt=jnp.concatenate(
            [te.chunk_rt, jnp.full((pad,), last_rt, jnp.int32)]
        ),
        chunk_st=jnp.concatenate(
            [te.chunk_st, jnp.full((pad,), last_st, jnp.int32)]
        ),
        chunk_first=jnp.concatenate(
            [te.chunk_first, jnp.zeros((pad,), jnp.int32)]
        ),
        meta=dataclasses.replace(m, n_chunks=budget),
        transpose=te.transpose,
    )


# ---------------------------------------------------------------------------
# kernels


from kgcn_tpu.ops._kernel_common import (  # noqa: E402
    interpret_mode as _interpret,
    kernel_precision as _prec,
)


def _spmm_kernel(rt_ref, st_ref, first_ref, sloc_ref, rloc_ref, w_ref,
                 x_ref, out_ref, *, ts, tr, chunk, cdt):
    """One chunk: out[rt] += onehot(r_loc)ᵀ @ ((onehot(s_loc)·w) @ x[st]).

    Gather side folds the edge weight into the one-hot so the message matmul
    produces already-weighted rows.  One-hots are [chunk, tile] lane-dim iota
    comparisons against the (chunk, 1) metadata columns — Mosaic-friendly
    broadcasts, no relayout, no dynamic indexing.
    """
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    sl = sloc_ref[:]                      # (chunk, 1) int32
    rl = rloc_ref[:]
    w = w_ref[:]                          # (chunk, 1) f32
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (chunk, ts), 1)
    oh_sw = jnp.where(iota_s == sl, w, 0.0).astype(cdt)      # [chunk, ts]
    # messages[e] = w_e · x[s_e]  — one MXU matmul
    m = jnp.dot(oh_sw, x_ref[:], preferred_element_type=jnp.float32,
                precision=_prec(cdt))
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (chunk, tr), 1)
    oh_r = (iota_r == rl).astype(cdt)                         # [chunk, tr]
    out_ref[:] += jax.lax.dot_general(
        oh_r, m.astype(cdt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_prec(cdt),
    )


def _sddmm_kernel(rt_ref, st_ref, first_ref, sloc_ref, rloc_ref,
                  x_ref, g_ref, out_ref, *, ts, tr, chunk, cdt):
    """Values gradient: dw[e] = ⟨g[r_e], x[s_e]⟩ per chunk slot.

    Both row gathers are plain one-hot matmuls; the per-slot inner product is
    an elementwise multiply + lane reduction into a (chunk, 1) block.
    """
    sl = sloc_ref[:]                      # (chunk, 1)
    rl = rloc_ref[:]
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (chunk, ts), 1)
    oh_s = (iota_s == sl).astype(cdt)
    xs = jnp.dot(oh_s, x_ref[:], preferred_element_type=jnp.float32,
                 precision=_prec(cdt))
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (chunk, tr), 1)
    oh_r = (iota_r == rl).astype(cdt)
    gr = jnp.dot(oh_r, g_ref[:], preferred_element_type=jnp.float32,
                 precision=_prec(cdt))
    out_ref[:] = jnp.sum(xs * gr, axis=1, keepdims=True)      # [chunk, 1]


def _pad_rows(x, rows):
    if x.shape[0] == rows:
        return x
    return jnp.pad(x, ((0, rows - x.shape[0]), (0, 0)))


def _spmm_pallas_call(meta: TiledMeta, s_loc, r_loc, chunk_rt, chunk_st,
                      chunk_first, w_chunks, x, cdt):
    """Raw forward pallas_call. x: [num_senders, F] → [num_receivers, F]."""
    ts, tr, chunk = meta.ts, meta.tr, meta.chunk
    F = x.shape[1]
    Fp = _round_up(max(F, 1), 128)
    xp = _pad_rows(x, meta.n_st * ts)
    if Fp != F:
        xp = jnp.pad(xp, ((0, 0), (0, Fp - F)))
    xp = xp.astype(cdt)
    w_chunks = w_chunks.astype(jnp.float32)

    slot_col = pl.BlockSpec((chunk, 1), lambda i, rt, st, f: (i, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(meta.n_chunks,),
        in_specs=[
            slot_col, slot_col, slot_col,
            pl.BlockSpec((ts, Fp), lambda i, rt, st, f: (st[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr, Fp), lambda i, rt, st, f: (rt[i], 0),
                               memory_space=pltpu.VMEM),
    )
    kern = functools.partial(_spmm_kernel, ts=ts, tr=tr, chunk=chunk, cdt=cdt)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((meta.n_rt * tr, Fp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * meta.n_chunks * chunk * (ts + tr) * Fp,
            bytes_accessed=(
                meta.n_chunks * (ts * Fp * xp.dtype.itemsize + 3 * chunk * 4)
                + meta.n_rt * tr * Fp * 4
            ),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(chunk_rt, chunk_st, chunk_first,
      s_loc.reshape(-1, 1), r_loc.reshape(-1, 1),
      w_chunks.reshape(-1, 1), xp)
    return out[: meta.num_receivers, :F]


def _sddmm_pallas_call(meta: TiledMeta, s_loc, r_loc, chunk_rt, chunk_st,
                       chunk_first, x, g, cdt):
    """Raw SDDMM pallas_call → per-slot dw [n_chunks, chunk] (f32)."""
    ts, tr, chunk = meta.ts, meta.tr, meta.chunk
    F = x.shape[1]
    Fp = _round_up(max(F, 1), 128)
    xp = _pad_rows(x, meta.n_st * ts)
    gp = _pad_rows(g, meta.n_rt * tr)
    if Fp != F:
        xp = jnp.pad(xp, ((0, 0), (0, Fp - F)))
        gp = jnp.pad(gp, ((0, 0), (0, Fp - F)))
    xp = xp.astype(cdt)
    gp = gp.astype(cdt)

    slot_col = pl.BlockSpec((chunk, 1), lambda i, rt, st, f: (i, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(meta.n_chunks,),
        in_specs=[
            slot_col, slot_col,
            pl.BlockSpec((ts, Fp), lambda i, rt, st, f: (st[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, Fp), lambda i, rt, st, f: (rt[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, 1), lambda i, rt, st, f: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    kern = functools.partial(_sddmm_kernel, ts=ts, tr=tr, chunk=chunk,
                             cdt=cdt)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((meta.n_chunks * chunk, 1),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * meta.n_chunks * chunk * (ts + tr) * Fp,
            bytes_accessed=meta.n_chunks * (ts + tr) * Fp
            * xp.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(chunk_rt, chunk_st, chunk_first,
      s_loc.reshape(-1, 1), r_loc.reshape(-1, 1), xp, gp)
    return out.reshape(meta.n_chunks, chunk)


# ---------------------------------------------------------------------------
# differentiable core (custom VJP: transpose-spmm for dx, SDDMM for dw —
# the same gradient pair the reference registers, kgcn/bspmm_call.py:21-57)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _core(meta, metaT, cdt_name, fwd_ints, bwd_ints, w_chunks, wT_chunks, x):
    cdt = jnp.dtype(cdt_name)
    return _spmm_pallas_call(meta, *fwd_ints, w_chunks, x, cdt)


def _core_fwd(meta, metaT, cdt_name, fwd_ints, bwd_ints, w_chunks,
              wT_chunks, x):
    out = _core(meta, metaT, cdt_name, fwd_ints, bwd_ints, w_chunks,
                wT_chunks, x)
    return out, (fwd_ints, bwd_ints, wT_chunks, x)


def _core_bwd(meta, metaT, cdt_name, res, g):
    fwd_ints, bwd_ints, wT_chunks, x = res
    cdt = jnp.dtype(cdt_name)
    g32 = g.astype(jnp.float32)
    dx = _spmm_pallas_call(metaT, *bwd_ints, wT_chunks, g32, cdt)
    dw = _sddmm_pallas_call(meta, fwd_ints[0], fwd_ints[1], fwd_ints[2],
                            fwd_ints[3], fwd_ints[4], x.astype(jnp.float32),
                            g32, cdt)
    d_ints = jax.tree_util.tree_map(
        lambda a: jnp.zeros(a.shape, jax.dtypes.float0), fwd_ints
    )
    d_intsT = jax.tree_util.tree_map(
        lambda a: jnp.zeros(a.shape, jax.dtypes.float0), bwd_ints
    )
    dwT = jnp.zeros_like(wT_chunks)  # out does not depend on the transpose
    return d_ints, d_intsT, dw, dwT, dx.astype(x.dtype)


_core.defvjp(_core_fwd, _core_bwd)


_DEFAULT_COMPUTE_DTYPE = [jnp.bfloat16]


def set_compute_dtype(dtype) -> None:
    """Set the default MXU payload dtype for the tiled kernels (config key
    ``tiled_compute_dtype``).  ``bfloat16`` (default) halves HBM traffic and
    doubles MXU rate — max-abs error ~2.5e-2 vs the f32 XLA path at
    degree~10/F=128 (fine for GCN aggregation); ``float32`` is the exactness
    escape hatch for attention/gradient-sensitive uses."""
    _DEFAULT_COMPUTE_DTYPE[0] = jnp.dtype(dtype).type


def tiled_spmm(te: TiledCOO, weights, x, *, compute_dtype=None):
    """``out[r] = Σ_e w_e · x[s_e]`` through the tiled one-hot MXU kernel.

    ``weights``: [E] (dynamic, differentiable — attention/learned weights
    work); ``x``: [num_senders, F] → [num_receivers, F] float32.
    ``compute_dtype`` is the MXU payload dtype (one-hots, x tiles, message
    rows); accumulation is always float32.  None → the module default
    (``set_compute_dtype``).  Requires ``te.transpose``.
    """
    if compute_dtype is None:
        compute_dtype = _DEFAULT_COMPUTE_DTYPE[0]
    assert te.transpose is not None, "build_tiled(with_transpose=True) needed"
    meta, metaT = te.meta, te.transpose.meta
    assert x.shape[0] == meta.num_senders, (
        f"x rows {x.shape[0]} != structure num_senders {meta.num_senders} "
        "(a stale structure would silently aggregate zeros for the missing "
        "rows)"
    )
    w_ext = jnp.concatenate(
        [weights.astype(jnp.float32), jnp.zeros((1,), jnp.float32)]
    )
    w_chunks = w_ext[te.slot_src]                  # padding → appended 0
    wT_chunks = w_ext[te.transpose.slot_src]
    fwd_ints = (te.s_loc, te.r_loc, te.chunk_rt, te.chunk_st, te.chunk_first)
    tt = te.transpose
    bwd_ints = (tt.s_loc, tt.r_loc, tt.chunk_rt, tt.chunk_st, tt.chunk_first)
    if te.node_perm is not None:
        # locality-relabeled structure: permute x into the relabeled space
        # and the result back out (V-row takes — ~10× cheaper than the slot
        # gather the relabeling shrinks)
        x = jnp.take(x, te.node_perm, axis=0)
    out = _core(meta, metaT, jnp.dtype(compute_dtype).name,
                fwd_ints, bwd_ints, w_chunks, wT_chunks, x)
    if te.node_perm is not None:
        out = jnp.take(out, te.node_inv, axis=0)
    return out


def tiled_sddmm(te: TiledCOO, a, b, *, compute_dtype=None):
    """Per-edge inner products ``out[e] = ⟨a[r_e], b[s_e]⟩`` (reference
    values-grad pattern, kgcn/bspmm_call.py:49-54).  Returns [E] f32."""
    if compute_dtype is None:
        compute_dtype = _DEFAULT_COMPUTE_DTYPE[0]
    meta = te.meta
    if te.node_perm is not None:
        a = jnp.take(a, te.node_perm, axis=0)
        b = jnp.take(b, te.node_perm, axis=0)
    dw = _sddmm_pallas_call(
        meta, te.s_loc, te.r_loc, te.chunk_rt, te.chunk_st, te.chunk_first,
        b.astype(jnp.float32), a.astype(jnp.float32), jnp.dtype(compute_dtype)
    )
    flat = jnp.concatenate([dw.reshape(-1), jnp.zeros((1,), jnp.float32)])
    # map slots back to original edge order (host-precomputed at build time;
    # device fallback for structures built before edge_slot existed)
    inv = te.edge_slot if te.edge_slot is not None else _slot_of_edge(te)
    return flat[inv]


def _slot_of_edge(te: TiledCOO):
    """[E] int32: flat slot index of each original edge.  Edges absent from
    the structure (zero-weight padding) keep ``total`` — the index of the
    appended zero in the caller's extended value vector."""
    meta = te.meta
    total = meta.n_chunks * meta.chunk
    src = te.slot_src.reshape(-1)          # values in [0, E]; E = padding
    slot_ids = jnp.arange(total, dtype=jnp.int32)
    # scatter slot ids to bucket src; padding slots land in bucket E (dropped)
    inv = jnp.full((meta.num_edges + 1,), total, jnp.int32).at[src].set(
        slot_ids
    )
    return inv[: meta.num_edges]


# ---------------------------------------------------------------------------
# tiling selection + locality reordering


_CANDIDATES = (
    # clustered / block-diagonal regimes: small tiles, long chunks
    (128, 128, 1024), (256, 256, 512), (256, 256, 1024), (256, 256, 2048),
    (512, 512, 512),
    # scattered / uniform regimes: big tiles, short chunks
    (512, 512, 128), (1024, 1024, 128), (2048, 2048, 256),
)


def choose_tiling(senders, receivers, num_nodes: int, feature_dim: int,
                  *, weights=None, candidates=_CANDIDATES,
                  bytes_per_elt: int | None = None,
                  num_sender_nodes: int | None = None,
                  return_cost: bool = False):
    """Pick (ts, tr, chunk) minimising a measured-on-v5e cost model evaluated
    on the exact (rt, st) pair histogram of THIS edge list.

    Terms (calibrated against on-chip sweeps, docs/performance.md):
    * MXU: slots·2F(ts+tr) at ~2e14 bf16 FLOP/s (1e14 f32);
    * VPU one-hot construction: slots·(ts+tr) iota-compare+select lanes at
      ~1e12/s — the DOMINANT term at F≈128 (runs ~0.7-serial with the MXU);
    * HBM: one ts×F x-tile per (rt,st) pair;
    * grid: ~1 µs per chunk step (small-tile kernels are step-bound).

    ``F`` uses the kernel's actual lane padding (``_round_up(F, 128)``) and
    the chunk count includes the one forced chunk per edge-free receiver
    tile that ``build_tiled`` emits; ``bytes_per_elt`` defaults to the
    module's configured compute dtype (``set_compute_dtype``);
    ``num_sender_nodes`` keeps the pair histogram correct for rectangular
    adjacencies.
    """
    s = np.asarray(senders).astype(np.int64)
    r = np.asarray(receivers).astype(np.int64)
    if weights is not None:
        valid = np.asarray(weights) != 0
        s, r = s[valid], r[valid]
    if bytes_per_elt is None:
        bytes_per_elt = jnp.dtype(_DEFAULT_COMPUTE_DTYPE[0]).itemsize
    n_send = num_sender_nodes if num_sender_nodes is not None else num_nodes
    F = _round_up(max(feature_dim, 1), 128)
    MXU_FLOPS = 2.0e14 if bytes_per_elt == 2 else 1.0e14
    HBM_BPS = 8.0e11
    VPU_OPS = 1.0e12
    best, best_cost = candidates[0], float("inf")
    for ts, tr, chunk in candidates:
        n_st = max(_cdiv(n_send, ts), 1)
        n_rt = max(_cdiv(num_nodes, tr), 1)
        key = (r // tr) * n_st + (s // ts)
        uniq, counts = np.unique(key, return_counts=True)
        n_pairs = len(counts)
        n_chunks = int(np.sum(_cdiv(counts, chunk)))
        # build_tiled forces one (all-padding) chunk per edge-free receiver
        # tile so every out tile gets zeroed — charge them too
        empty_rt = n_rt - len(np.unique(uniq // n_st))
        n_chunks += empty_rt
        n_pairs += empty_rt
        slots = n_chunks * chunk
        t_mxu = slots * 2.0 * F * (ts + tr) / MXU_FLOPS
        t_vpu = slots * 3.0 * (ts + tr) / VPU_OPS
        t_hbm = n_pairs * ts * F * bytes_per_elt / HBM_BPS
        t_grid = n_chunks * 1.0e-6
        cost = max(t_mxu + 0.7 * t_vpu, t_hbm) + t_grid
        if cost < best_cost:
            best, best_cost = (ts, tr, chunk), cost
    if return_cost:
        return best, best_cost
    return best


def choose_tiling_with_locality(senders, receivers, num_nodes: int,
                                feature_dim: int, *, weights=None):
    """Pick (tiling, locality_flag) by evaluating the cost model BOTH on
    the raw edge list and on the degree-descending relabeled one.

    Measured on-chip (experiments/locality_bench.py, V=100k E=1M F=128):
    relabeling wins 1.6× on steep power laws (Zipf α=1.6: 140 vs 87 M
    edges/s, 2.3k vs 14k chunks) but is ~neutral-to-negative on mild skew
    (α=1.1: 0.95×) — degree skew alone is NOT a predictor, the pair
    histogram is, so the decision runs the real cost model on both and
    requires a ≥20% modeled win before paying the permutation takes.
    """
    s = np.asarray(senders).astype(np.int64)
    r = np.asarray(receivers).astype(np.int64)
    raw_t, raw_c = choose_tiling(s, r, num_nodes, feature_dim,
                                 weights=weights, return_cost=True)
    # filter BEFORE relabeling: the permutation is only defined over real
    # node ids (padding edges may carry sentinel endpoints)
    valid = (np.asarray(weights) != 0 if weights is not None
             else np.ones(len(s), bool))
    s_v, r_v = s[valid], r[valid]
    perm = locality_order(s_v, r_v, num_nodes)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(num_nodes, dtype=perm.dtype)
    loc_t, loc_c = choose_tiling(inv[s_v], inv[r_v], num_nodes, feature_dim,
                                 return_cost=True)
    if loc_c < 0.8 * raw_c:
        return loc_t, True
    return raw_t, False


def locality_order(senders, receivers, num_nodes: int) -> np.ndarray:
    """Degree-descending node permutation (perm[new] = old).

    Packs hub nodes into the first tiles so power-law graphs (real KGs,
    protein networks) concentrate their edges into few (rt, st) pairs —
    fewer x-tile reloads and less chunk padding.  Pure relabeling;
    aggregation results are permutation-equivariant.
    """
    deg = np.bincount(np.asarray(senders), minlength=num_nodes)
    deg = deg + np.bincount(np.asarray(receivers), minlength=num_nodes)
    return np.argsort(-deg, kind="stable").astype(np.int64)
