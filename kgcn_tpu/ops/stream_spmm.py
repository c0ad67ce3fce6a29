"""Streaming scatter SpMM — the scattered-regime Pallas kernel.

Semantics match the reference's native bspmm op
(``out[r] = Σ_e w_e · x[s_e]``, /root/reference/kgcn/bspmm_call.py:6-15) with
the registered gradient pair — transpose-spmm for ``dx``, SDDMM for ``dw``
(kgcn/bspmm_call.py:21-57) — as custom-VJP sibling kernels.

Why a second Pallas kernel next to ``tiled_spmm``: the tiled one-hot kernel
pays ``2F(ts+tr)`` MXU FLOPs per edge slot because BOTH the gather and the
scatter are one-hot matmuls over full tiles — on scattered (uniform-random)
graphs that is compute-bound ~4× under the HBM roofline.  This kernel splits
the two sides by their actual hardware costs:

* **Gather** = one XLA row-take ``g = x[slot_sender]`` — the TPU's native
  gather engine moves random rows at ~300 M rows/s (measured, issue-bound,
  independent of row width), 2.5× faster than any one-hot construction at
  F=128.
* **Scatter** = a Pallas kernel over RECEIVER-SORTED edge chunks.  Sorting
  makes each chunk's receivers fall inside one ``tr_w``-row window, so the
  scatter one-hot spans only ``tr_w=128`` rows (``2·F·tr_w`` ≈ 33 k
  FLOPs/edge, 16× below the tiled kernel) and ``g`` streams SEQUENTIALLY at
  full HBM bandwidth.  Macro-chunks batch ``mc`` sub-chunks per grid step
  (three ``dot_general``s, no inner loop) so the kernel is not
  grid-step-bound.

The slot layout is the canonical edge layout: ``build_stream`` sorts edges by
receiver and pads them into fixed chunks; padding slots carry weight 0 (the
framework-wide convention for padding edges).  Callers that keep their edge
arrays slot-aligned (``GraphBatch.with_stream`` does) pay ZERO per-edge
gathers on weights in the forward pass, and the values-gradient comes back
already slot-aligned.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

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


from kgcn_tpu.ops._kernel_common import (  # noqa: E402
    interpret_mode as _interpret,
    kernel_precision as _prec,
)


@dataclasses.dataclass(frozen=True)
class StreamMeta:
    """Static (hashable) shape metadata for one stream edge structure."""

    tr_w: int        # receiver-window rows (one-hot span)
    chunk: int       # edge slots per sub-chunk
    mc: int          # sub-chunks per macro grid step
    wb: int          # windows per output block (out block = wb·tr_w rows)
    n_macros: int
    n_rb: int        # output blocks (out padded to n_rb·wb·tr_w rows)
    num_senders: int
    num_receivers: int
    num_edges: int   # true E (slot_src sentinel value)

    @property
    def slots(self) -> int:
        return self.n_macros * self.mc * self.chunk

    @property
    def n_sub(self) -> int:
        return self.n_macros * self.mc


@struct.dataclass
class StreamCOO:
    """Device arrays of one stream edge structure (registered pytree; ``meta``
    is static aux data).

    slot_sender: [slots] int32 — sender node per slot; padding slots carry
        ``num_senders`` (gathers the appended zero row).
    r_loc: [slots, 1] int32 — receiver row within the slot's window.
    slot_src: [slots] int32 — original edge id per slot; padding slots carry
        ``num_edges``.
    sub_wid: [n_sub, 1] int32 — window index within the out block.
    macro_rb / macro_first: [n_macros] int32 — out-block id per macro step /
        1 on the first macro of each block (kernel zeroes the accumulator).
    t_from_f: [slots_T] int32 or None — for the TRANSPOSE structure: the
        forward-slot index feeding each transpose slot (sentinel
        ``slots_F`` → appended zero).  Lets the backward pass realign dynamic
        weights with one row-take.
    w_slots: [slots] f32 or None — weights baked in at build time
        (``build_stream(weights=...)``); the zero-per-step fast path for
        static adjacencies.
    transpose: the same edges sender-sorted (for dx); itself has
        ``transpose=None``.
    """

    slot_sender: jax.Array
    r_loc: jax.Array
    slot_src: jax.Array
    sub_wid: jax.Array
    macro_rb: jax.Array
    macro_first: jax.Array
    meta: StreamMeta = struct.field(pytree_node=False)
    t_from_f: Optional[jax.Array] = None
    w_slots: Optional[jax.Array] = None
    oh: Optional[jax.Array] = None
    transpose: Optional["StreamCOO"] = None


def _build_one(s, r, eid, num_senders, num_receivers, num_edges,
               tr_w, chunk, mc, wb):
    """Pack one direction: sort by r, window by tr_w, chunk, macro-chunk."""
    E = len(s)
    order = np.argsort(r, kind="stable")
    s_sorted, r_sorted = s[order], r[order]
    eid_sorted = eid[order]
    rw = r_sorted // tr_w
    n_rw = max(_cdiv(num_receivers, tr_w), 1)
    n_rb = max(_cdiv(n_rw, wb), 1)
    n_rw_pad = n_rb * wb                       # windows incl. block padding
    counts = np.bincount(rw, minlength=n_rw_pad)
    sub_per_w = np.maximum(_cdiv(counts, chunk), 1)
    wblock = np.arange(n_rw_pad) // wb
    sub_base = np.concatenate([[0], np.cumsum(sub_per_w)])
    n_sub = int(sub_base[-1])
    sub_w = np.repeat(np.arange(n_rw_pad), sub_per_w)
    subs_per_block = np.bincount(wblock[sub_w], minlength=n_rb)
    macros_per_block = np.maximum(_cdiv(subs_per_block, mc), 1)
    n_macros = int(macros_per_block.sum())
    total_subs = n_macros * mc
    block_sub_base = np.concatenate([[0], np.cumsum(macros_per_block * mc)])
    sub_block = wblock[sub_w]
    first_in_block = np.searchsorted(sub_block, sub_block, side="left")
    sub_rank = np.arange(n_sub) - first_in_block
    sub_pos = block_sub_base[sub_block] + sub_rank

    slots = total_subs * chunk
    slot_sender = np.full(slots, num_senders, np.int32)
    r_loc = np.zeros(slots, np.int32)
    slot_src = np.full(slots, num_edges, np.int32)
    sub_wid = np.zeros(total_subs, np.int32)
    sub_wid[sub_pos] = (sub_w % wb).astype(np.int32)

    wstart = np.concatenate([[0], np.cumsum(counts)])
    rank = np.arange(E) - wstart[rw]
    edge_sub = sub_base[rw] + rank // chunk
    slot = sub_pos[edge_sub] * chunk + rank % chunk
    slot_sender[slot] = s_sorted
    r_loc[slot] = (r_sorted % tr_w).astype(np.int32)
    slot_src[slot] = eid_sorted

    macro_rb = np.repeat(np.arange(n_rb), macros_per_block).astype(np.int32)
    macro_first = np.zeros(n_macros, np.int32)
    if n_macros:
        macro_first[0] = 1
        macro_first[1:][macro_rb[1:] != macro_rb[:-1]] = 1

    meta = StreamMeta(
        tr_w=tr_w, chunk=chunk, mc=mc, wb=wb, n_macros=n_macros, n_rb=n_rb,
        num_senders=num_senders, num_receivers=num_receivers,
        num_edges=num_edges,
    )
    return StreamCOO(
        slot_sender=jnp.asarray(slot_sender),
        r_loc=jnp.asarray(r_loc.reshape(-1, 1)),
        slot_src=jnp.asarray(slot_src),
        sub_wid=jnp.asarray(sub_wid.reshape(-1, 1)),
        macro_rb=jnp.asarray(macro_rb),
        macro_first=jnp.asarray(macro_first),
        meta=meta,
    ), slot_src


# one-hot materialisation budget: slots × tr_w × 2 bytes per direction.
# 512 MB covers E ≈ 2M at tr_w=128 — the big-graph regime this kernel owns.
_MATERIALIZE_BUDGET_BYTES = 512 * 1024 * 1024


def build_stream(senders, receivers, num_nodes: int, *,
                 weights=None, num_sender_nodes: int | None = None,
                 tr_w: int = 64, chunk: int = 64, mc: int = 24, wb: int = 16,
                 with_transpose: bool = True,
                 macro_budget: int | None = None,
                 materialize: bool | str = "auto",
                 valid_mask=None) -> StreamCOO:
    """Build the stream chunk structure (host-side).

    ``weights``: optional [E] — zero-weight (padding) edges are dropped from
    the structure AND, when given, the slot-aligned weight arrays are baked
    in (``w_slots`` on both directions) so static-adjacency callers pay no
    per-step weight realignment.  ``macro_budget`` pads the macro list so
    different topologies share one compiled executable.

    ``materialize`` (static weights only): precompute the weighted scatter
    one-hots as bf16 HBM arrays so the kernel streams them instead of
    constructing them on the VPU — measured +22% edges/s on the uniform
    regime (the VPU iota/compare/select was ~0.9 ms of the 1M-edge step).
    "auto" materialises when the arrays fit ``_MATERIALIZE_BUDGET_BYTES``.
    Defaults (tr_w=64, chunk=64, mc=24, wb=16) are the on-chip sweep optimum
    at V=100k/E=1M/F=128 (experiments/stream_variants.py + /tmp sweeps):
    271 M edges/s vs 72-78 M ELL-XLA; tr_w=64 halves the one-hot stream
    bytes, which beats the slightly higher padding (1.11 vs 1.05).
    NB ``mc`` and ``chunk`` must be multiples of 8 for compiled TPU mode
    (Mosaic block-shape constraint; interpret mode accepts any size).
    """
    assert tr_w % 8 == 0 and chunk % 8 == 0, "sublane alignment"
    if not _interpret():
        # compiled TPU mode also needs mc % 8 (Mosaic block-shape
        # constraint); catching it here instead of at lowering time —
        # interpret mode (CPU tests) accepts any mc
        assert mc % 8 == 0, (
            f"mc={mc} must be a multiple of 8 for compiled TPU mode"
        )
    s = np.asarray(senders).astype(np.int64)
    r = np.asarray(receivers).astype(np.int64)
    num_edges = len(s)
    w_np = (np.asarray(weights, np.float32)
            if weights is not None else None)
    if valid_mask is not None:
        # explicit padding mask: a VALID edge may legitimately carry a
        # zero adjacency weight (it still gets baked as 0, and dynamic
        # weights on it are honoured)
        valid = np.asarray(valid_mask) != 0
    elif w_np is not None:
        valid = w_np != 0
    else:
        valid = np.ones(num_edges, bool)
    eid = np.arange(num_edges, dtype=np.int32)[valid]
    s_v, r_v = s[valid], r[valid]
    n_send = num_sender_nodes if num_sender_nodes is not None else num_nodes

    fwd, slot_src_f = _build_one(s_v, r_v, eid, n_send, num_nodes, num_edges,
                                 tr_w, chunk, mc, wb)
    if macro_budget is not None:
        fwd = _pad_macros(fwd, macro_budget)
        slot_src_f = np.asarray(fwd.slot_src)
    if w_np is not None:
        w_ext = np.concatenate([w_np, np.zeros(1, np.float32)])
        fwd = fwd.replace(w_slots=jnp.asarray(w_ext[slot_src_f]))
        if _should_materialize(fwd.meta, materialize):
            fwd = fwd.replace(oh=_materialize_oh(fwd, w_ext[slot_src_f]))
    if with_transpose:
        bwd, slot_src_t = _build_one(r_v, s_v, eid, num_nodes, n_send,
                                     num_edges, tr_w, chunk, mc, wb)
        if macro_budget is not None:
            bwd = _pad_macros(bwd, macro_budget)
            slot_src_t = np.asarray(bwd.slot_src)
        # forward-slot index of each transpose slot (sentinel → slots_F)
        slots_f = fwd.meta.slots
        f_slot_of_edge = np.full(num_edges + 1, slots_f, np.int64)
        valid_f = slot_src_f != num_edges
        f_slot_of_edge[slot_src_f[valid_f]] = np.nonzero(valid_f)[0]
        t_from_f = f_slot_of_edge[slot_src_t].astype(np.int32)
        bwd = bwd.replace(t_from_f=jnp.asarray(t_from_f))
        if w_np is not None:
            bwd = bwd.replace(w_slots=jnp.asarray(w_ext[slot_src_t]))
            if _should_materialize(bwd.meta, materialize):
                bwd = bwd.replace(oh=_materialize_oh(bwd, w_ext[slot_src_t]))
        fwd = fwd.replace(transpose=bwd)
    return fwd


def _should_materialize(meta: StreamMeta, materialize) -> bool:
    if materialize is False:
        return False
    nbytes = meta.slots * meta.tr_w * 2
    if materialize == "auto":
        return nbytes <= _MATERIALIZE_BUDGET_BYTES
    return True


def _materialize_oh(ss: StreamCOO, w_slots_np) -> jax.Array:
    """[slots, tr_w] bf16 weighted scatter one-hot (padding slots all-zero)."""
    m = ss.meta
    r_loc = np.asarray(ss.r_loc).reshape(-1)
    oh = np.zeros((m.slots, m.tr_w), np.float32)
    oh[np.arange(m.slots), r_loc] = np.asarray(w_slots_np, np.float32)
    return jnp.asarray(oh.astype(jnp.bfloat16))


def _pad_macros(ss: StreamCOO, budget: int) -> StreamCOO:
    """Pad the macro list to ``budget`` macros (one static meta across
    streaming batches).  Filler macros revisit the LAST out block with
    all-padding slots — a no-op."""
    m = ss.meta
    if m.n_macros > budget:
        raise ValueError(
            f"macro budget {budget} < required {m.n_macros}"
        )
    pad = budget - m.n_macros
    if pad == 0:
        return ss
    spad = pad * m.mc * m.chunk
    last_rb = int(ss.macro_rb[-1]) if m.n_macros else 0
    return ss.replace(
        slot_sender=jnp.concatenate(
            [ss.slot_sender, jnp.full((spad,), m.num_senders, jnp.int32)]
        ),
        r_loc=jnp.concatenate(
            [ss.r_loc, jnp.zeros((spad, 1), jnp.int32)]
        ),
        slot_src=jnp.concatenate(
            [ss.slot_src, jnp.full((spad,), m.num_edges, jnp.int32)]
        ),
        sub_wid=jnp.concatenate(
            [ss.sub_wid, jnp.zeros((pad * m.mc, 1), jnp.int32)]
        ),
        macro_rb=jnp.concatenate(
            [ss.macro_rb, jnp.full((pad,), last_rb, jnp.int32)]
        ),
        macro_first=jnp.concatenate(
            [ss.macro_first, jnp.zeros((pad,), jnp.int32)]
        ),
        meta=dataclasses.replace(m, n_macros=budget),
    )


# ---------------------------------------------------------------------------
# kernels




def _scatter_kernel(rb_ref, first_ref, rloc_ref, w_ref, wid_ref, g_ref,
                    out_ref, *, chunk, tr_w, mc, wb, cdt):
    """One macro step: three matmuls, no inner loop.

    1. one-hot (slots × tr_w) from iota==r_loc with the weight folded in;
    2. batched MXU contraction over the chunk dim → per-sub (tr_w, F) slabs;
    3. window one-hot routes slabs into the (wb·tr_w, F) out block (f32 —
       partial sums are never rounded to bf16).
    """
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    rl = rloc_ref[:]                             # (mc·chunk, 1)
    w = w_ref[:]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (mc * chunk, tr_w), 1)
    oh = jnp.where(iota_r == rl, w, 0.0).astype(cdt)
    oh3 = oh.reshape(mc, chunk, tr_w)
    g3 = g_ref[:].reshape(mc, chunk, -1)
    slabs = jax.lax.dot_general(
        oh3, g3,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=_prec(cdt),
    )                                            # (mc, tr_w, F) f32
    wid = wid_ref[:]                             # (mc, 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (wb, mc), 0)
    oh_w = (iota_w == wid.reshape(1, mc)).astype(jnp.float32)
    blk = jax.lax.dot_general(
        oh_w, slabs,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_prec(cdt),
    )                                            # (wb, tr_w, F)
    out_ref[:] += blk.reshape(wb * tr_w, -1)


def _scatter_kernel_mat(rb_ref, first_ref, wid_ref, oh_ref, g_ref,
                        out_ref, *, chunk, tr_w, mc, wb):
    cdt = oh_ref.dtype
    """Materialised-one-hot variant: the weighted scatter one-hot streams
    from HBM (built once per static adjacency) instead of being constructed
    on the VPU each step — measured +22% on the uniform regime."""
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    oh3 = oh_ref[:].reshape(mc, chunk, tr_w)
    g3 = g_ref[:].reshape(mc, chunk, -1)
    slabs = jax.lax.dot_general(
        oh3, g3,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=_prec(cdt),
    )
    wid = wid_ref[:]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (wb, mc), 0)
    oh_w = (iota_w == wid.reshape(1, mc)).astype(jnp.float32)
    blk = jax.lax.dot_general(
        oh_w, slabs,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_prec(cdt),
    )
    out_ref[:] += blk.reshape(wb * tr_w, -1)


def _scatter_call_mat(meta: StreamMeta, sub_wid, macro_rb, macro_first,
                      oh, g):
    """Materialised path: g [slots, F] (cast to oh dtype) → [recv, F] f32."""
    tr_w, chunk, mc, wb = meta.tr_w, meta.chunk, meta.mc, meta.wb
    F = g.shape[1]
    Fp = _round_up(max(F, 1), 128)
    if Fp != F:
        g = jnp.pad(g, ((0, 0), (0, Fp - F)))
    g = g.astype(oh.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(meta.n_macros,),
        in_specs=[
            pl.BlockSpec((mc, 1), lambda i, rb, f: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mc * chunk, tr_w), lambda i, rb, f: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mc * chunk, Fp), lambda i, rb, f: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wb * tr_w, Fp), lambda i, rb, f: (rb[i], 0),
                               memory_space=pltpu.VMEM),
    )
    kern = functools.partial(_scatter_kernel_mat, chunk=chunk, tr_w=tr_w,
                             mc=mc, wb=wb)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((meta.n_rb * wb * tr_w, Fp),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * meta.slots * tr_w * Fp,
            bytes_accessed=meta.slots * (Fp + tr_w) * g.dtype.itemsize
            + meta.n_rb * wb * tr_w * Fp * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(macro_rb, macro_first, sub_wid, oh, g)
    return out[: meta.num_receivers, :F]


def _dw_kernel(rb_ref, first_ref, rloc_ref, wid_ref, g_ref, dy_ref,
               out_ref, *, chunk, tr_w, mc, wb, cdt):
    """Values gradient per slot: dw[slot] = ⟨g[slot], dy[r_slot]⟩.

    dy rows are pulled from the resident (wb·tr_w, F) block by the same two
    one-hot matmuls run in reverse (window select, then row select)."""
    wid = wid_ref[:]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (mc, wb), 1)
    oh_w = (iota_w == wid).astype(cdt)
    dyb = dy_ref[:].reshape(wb, tr_w * dy_ref.shape[-1]).astype(cdt)
    dyw = jnp.dot(oh_w, dyb, preferred_element_type=jnp.float32,
                  precision=_prec(cdt))
    dyw = dyw.reshape(mc, tr_w, -1)              # (mc, tr_w, F)
    rl = rloc_ref[:]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (mc * chunk, tr_w), 1)
    oh = (iota_r == rl).astype(cdt).reshape(mc, chunk, tr_w)
    gr = jax.lax.dot_general(
        oh, dyw.astype(cdt),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=_prec(cdt),
    )                                            # (mc, chunk, F)
    g3 = g_ref[:].astype(jnp.float32).reshape(mc, chunk, -1)
    out_ref[:] = jnp.sum(gr * g3, axis=2)        # (mc, chunk)


def _scatter_call(meta: StreamMeta, r_loc, sub_wid, macro_rb, macro_first,
                  w_slots, g, cdt):
    """g: [slots, F] (any dtype; cast to cdt) → [num_receivers, F] f32."""
    tr_w, chunk, mc, wb = meta.tr_w, meta.chunk, meta.mc, meta.wb
    F = g.shape[1]
    Fp = _round_up(max(F, 1), 128)
    if Fp != F:
        g = jnp.pad(g, ((0, 0), (0, Fp - F)))
    g = g.astype(cdt)
    w_col = w_slots.astype(jnp.float32).reshape(-1, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(meta.n_macros,),
        in_specs=[
            pl.BlockSpec((mc * chunk, 1), lambda i, rb, f: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mc * chunk, 1), lambda i, rb, f: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mc, 1), lambda i, rb, f: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mc * chunk, Fp), lambda i, rb, f: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wb * tr_w, Fp), lambda i, rb, f: (rb[i], 0),
                               memory_space=pltpu.VMEM),
    )
    kern = functools.partial(_scatter_kernel, chunk=chunk, tr_w=tr_w, mc=mc,
                             wb=wb, cdt=cdt)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((meta.n_rb * wb * tr_w, Fp),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * meta.slots * tr_w * Fp,
            bytes_accessed=meta.slots * (Fp * g.dtype.itemsize + 8)
            + meta.n_rb * wb * tr_w * Fp * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(macro_rb, macro_first, r_loc, w_col, sub_wid, g)
    return out[: meta.num_receivers, :F]


def _dw_call(meta: StreamMeta, r_loc, sub_wid, macro_rb, macro_first,
             g, dy, cdt):
    """g: [slots, F], dy: [num_receivers, F] → dw [slots] f32."""
    tr_w, chunk, mc, wb = meta.tr_w, meta.chunk, meta.mc, meta.wb
    F = g.shape[1]
    Fp = _round_up(max(F, 1), 128)
    dyp = dy
    rows = meta.n_rb * wb * tr_w
    if dyp.shape[0] != rows:
        dyp = jnp.pad(dyp, ((0, rows - dyp.shape[0]), (0, 0)))
    if Fp != F:
        g = jnp.pad(g, ((0, 0), (0, Fp - F)))
        dyp = jnp.pad(dyp, ((0, 0), (0, Fp - F)))
    g = g.astype(cdt)
    dyp = dyp.astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(meta.n_macros,),
        in_specs=[
            pl.BlockSpec((mc * chunk, 1), lambda i, rb, f: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mc, 1), lambda i, rb, f: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mc * chunk, Fp), lambda i, rb, f: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wb * tr_w, Fp), lambda i, rb, f: (rb[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mc, chunk), lambda i, rb, f: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    kern = functools.partial(_dw_kernel, chunk=chunk, tr_w=tr_w, mc=mc,
                             wb=wb, cdt=cdt)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((meta.n_sub, chunk), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * meta.slots * tr_w * Fp,
            bytes_accessed=meta.slots * Fp * g.dtype.itemsize
            + meta.n_rb * wb * tr_w * Fp * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(macro_rb, macro_first, r_loc, sub_wid, g, dyp)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# differentiable core


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _core(meta, cdt_name, fwd_ints, bwd_ints, w_slots, wT_slots, x):
    cdt = jnp.dtype(cdt_name)
    g = _take_rows(x, fwd_ints[0], cdt)
    return _scatter_call(meta[0], fwd_ints[1], fwd_ints[2], fwd_ints[3],
                         fwd_ints[4], w_slots, g, cdt)


def _take_rows(x, slot_sender, cdt):
    xe = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)])
    return jnp.take(xe.astype(cdt), slot_sender, axis=0)


def _core_fwd(meta, cdt_name, fwd_ints, bwd_ints, w_slots, wT_slots, x):
    cdt = jnp.dtype(cdt_name)
    g = _take_rows(x, fwd_ints[0], cdt)
    out = _scatter_call(meta[0], fwd_ints[1], fwd_ints[2], fwd_ints[3],
                        fwd_ints[4], w_slots, g, cdt)
    return out, (fwd_ints, bwd_ints, wT_slots, g,
                 jnp.zeros((0,), x.dtype))


def _core_bwd(meta, cdt_name, res, dy):
    fwd_ints, bwd_ints, wT_slots, g, x_proto = res
    meta_f, meta_t = meta
    cdt = jnp.dtype(cdt_name)
    dy32 = dy.astype(jnp.float32)
    # dx via transpose-spmm (reference: bspmm adjoint_a, bspmm_call.py:30-39)
    dg = _take_rows(dy32, bwd_ints[0], cdt)
    dx = _scatter_call(meta_t, bwd_ints[1], bwd_ints[2], bwd_ints[3],
                       bwd_ints[4], wT_slots, dg, cdt)
    # dw via SDDMM on the forward structure (bspmm_call.py:49-54)
    dw = _dw_call(meta_f, fwd_ints[1], fwd_ints[2], fwd_ints[3], fwd_ints[4],
                  g, dy32, cdt)
    d_ints = jax.tree_util.tree_map(
        lambda a: jnp.zeros(a.shape, jax.dtypes.float0), fwd_ints
    )
    d_intsT = jax.tree_util.tree_map(
        lambda a: jnp.zeros(a.shape, jax.dtypes.float0), bwd_ints
    )
    dwT = jnp.zeros_like(wT_slots)
    return d_ints, d_intsT, dw, dwT, dx.astype(x_proto.dtype)


_core.defvjp(_core_fwd, _core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _core_static(meta, cdt_name, fwd_ints, bwd_ints, ohF, ohT, x):
    """Static-weight fast path: materialised one-hots, no dw.

    fwd_ints/bwd_ints = (slot_sender, sub_wid, macro_rb, macro_first)."""
    cdt = jnp.dtype(cdt_name)
    g = _take_rows(x, fwd_ints[0], cdt)
    return _scatter_call_mat(meta[0], fwd_ints[1], fwd_ints[2], fwd_ints[3],
                             ohF, g)


def _core_static_fwd(meta, cdt_name, fwd_ints, bwd_ints, ohF, ohT, x):
    out = _core_static(meta, cdt_name, fwd_ints, bwd_ints, ohF, ohT, x)
    return out, (fwd_ints, bwd_ints, ohF, ohT, jnp.zeros((0,), x.dtype))


def _core_static_bwd(meta, cdt_name, res, dy):
    fwd_ints, bwd_ints, ohF, ohT, x_proto = res
    cdt = jnp.dtype(cdt_name)
    dg = _take_rows(dy.astype(jnp.float32), bwd_ints[0], cdt)
    dx = _scatter_call_mat(meta[1], bwd_ints[1], bwd_ints[2], bwd_ints[3],
                           ohT, dg)
    d_ints = jax.tree_util.tree_map(
        lambda a: jnp.zeros(a.shape, jax.dtypes.float0), fwd_ints
    )
    d_intsT = jax.tree_util.tree_map(
        lambda a: jnp.zeros(a.shape, jax.dtypes.float0), bwd_ints
    )
    # one-hot cotangents are never consumed (static structure) — XLA DCEs
    return (d_ints, d_intsT, jnp.zeros_like(ohF), jnp.zeros_like(ohT),
            dx.astype(x_proto.dtype))


_core_static.defvjp(_core_static_fwd, _core_static_bwd)


class _BakedArrays:
    """Identity-hashed holder for host-side structure arrays that should be
    embedded as COMPILE-TIME CONSTANTS.  Measured on-chip: XLA specialises a
    row-gather whose index vector is a constant — 0.8 ms faster at 1M rows
    than the same gather with the indices as a runtime argument (4.0 vs
    4.8 ms full pipeline).  Identity hashing is correct because a baked
    structure is built once per dataset and reused."""

    def __init__(self, **arrays):
        self.__dict__.update(arrays)


@struct.dataclass
class BakedStream:
    """Static-weight stream structure with int arrays baked as constants.

    Only the (large) one-hot arrays remain pytree leaves — they must stay
    runtime arguments, both to share executables and because embedding
    hundreds of MB of constants overflows compile RPCs on tunnel-attached
    backends."""

    oh: jax.Array
    ohT: jax.Array
    arrays: _BakedArrays = struct.field(pytree_node=False)
    meta: StreamMeta = struct.field(pytree_node=False)
    metaT: StreamMeta = struct.field(pytree_node=False)


def bake_stream(ss: StreamCOO) -> BakedStream:
    """Freeze a static-weight structure for closure-style use: int arrays
    become np constants (embedded at trace time), one-hots stay inputs."""
    assert ss.oh is not None and ss.transpose is not None
    assert ss.transpose.oh is not None
    tt = ss.transpose
    arrays = _BakedArrays(
        slot_sender=np.asarray(ss.slot_sender),
        sub_wid=np.asarray(ss.sub_wid),
        macro_rb=np.asarray(ss.macro_rb),
        macro_first=np.asarray(ss.macro_first),
        slot_senderT=np.asarray(tt.slot_sender),
        sub_widT=np.asarray(tt.sub_wid),
        macro_rbT=np.asarray(tt.macro_rb),
        macro_firstT=np.asarray(tt.macro_first),
    )
    return BakedStream(oh=ss.oh, ohT=tt.oh, arrays=arrays,
                       meta=ss.meta, metaT=tt.meta)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _core_baked(meta, cdt_name, arrays, ohF, ohT, x):
    cdt = jnp.dtype(cdt_name)
    a = arrays
    g = _take_rows(x, jnp.asarray(a.slot_sender), cdt)
    return _scatter_call_mat(meta[0], jnp.asarray(a.sub_wid),
                             jnp.asarray(a.macro_rb),
                             jnp.asarray(a.macro_first), ohF, g)


def _core_baked_fwd(meta, cdt_name, arrays, ohF, ohT, x):
    out = _core_baked(meta, cdt_name, arrays, ohF, ohT, x)
    return out, (ohF, ohT, jnp.zeros((0,), x.dtype))


def _core_baked_bwd(meta, cdt_name, arrays, res, dy):
    ohF, ohT, x_proto = res
    cdt = jnp.dtype(cdt_name)
    a = arrays
    dg = _take_rows(dy.astype(jnp.float32), jnp.asarray(a.slot_senderT), cdt)
    dx = _scatter_call_mat(meta[1], jnp.asarray(a.sub_widT),
                           jnp.asarray(a.macro_rbT),
                           jnp.asarray(a.macro_firstT), ohT, dg)
    return jnp.zeros_like(ohF), jnp.zeros_like(ohT), dx.astype(x_proto.dtype)


_core_baked.defvjp(_core_baked_fwd, _core_baked_bwd)


def stream_spmm_baked(bs: BakedStream, x):
    """Static-weight spmm through a baked structure (the fastest path:
    constant-specialised gather + materialised one-hots)."""
    assert x.shape[0] == bs.meta.num_senders
    return _core_baked((bs.meta, bs.metaT), bs.oh.dtype.name, bs.arrays,
                       bs.oh, bs.ohT, x)


_DEFAULT_COMPUTE_DTYPE = [jnp.bfloat16]


def set_compute_dtype(dtype) -> None:
    """Default MXU/gather payload dtype (config ``tiled_compute_dtype`` —
    shared with the tiled kernel).  Accumulation is always float32."""
    _DEFAULT_COMPUTE_DTYPE[0] = jnp.dtype(dtype).type


def transpose_w_slots(ss: StreamCOO, w_slots):
    """Realign slot-ordered weights to the transpose structure's slots with
    one row-take (needed only for DYNAMIC weights; static adjacencies use the
    baked-in ``w_slots`` on both directions)."""
    assert ss.transpose is not None and ss.transpose.t_from_f is not None
    we = jnp.concatenate(
        [w_slots.astype(jnp.float32), jnp.zeros((1,), jnp.float32)]
    )
    return jnp.take(we[:, None], ss.transpose.t_from_f, axis=0)[:, 0]


def stream_spmm(ss: StreamCOO, w_slots=None, x=None, *, wT_slots=None,
                compute_dtype=None):
    """``out[r] = Σ_e w_e · x[s_e]`` through the streaming scatter kernel.

    ``w_slots``: [slots] slot-aligned weights (None → the structure's
    baked-in static weights).  ``x``: [num_senders, F] → [num_receivers, F]
    float32.  Gradients: dx (transpose kernel), dw in SLOT order.
    """
    if compute_dtype is None:
        compute_dtype = _DEFAULT_COMPUTE_DTYPE[0]
    assert ss.transpose is not None, "build_stream(with_transpose=True) needed"
    assert x.shape[0] == ss.meta.num_senders, (
        f"x rows {x.shape[0]} != num_senders {ss.meta.num_senders}"
    )
    if (w_slots is None and ss.oh is not None
            and ss.transpose.oh is not None
            and jnp.dtype(compute_dtype) == ss.oh.dtype):
        # static-weight fast path: materialised one-hots, no per-step VPU
        # one-hot construction, no dw kernel
        tt = ss.transpose
        fwd_ints = (ss.slot_sender, ss.sub_wid, ss.macro_rb, ss.macro_first)
        bwd_ints = (tt.slot_sender, tt.sub_wid, tt.macro_rb, tt.macro_first)
        return _core_static((ss.meta, tt.meta),
                            jnp.dtype(compute_dtype).name,
                            fwd_ints, bwd_ints, ss.oh, tt.oh, x)
    if w_slots is None:
        assert ss.w_slots is not None, "no weights given or baked in"
        w_slots = ss.w_slots
        if wT_slots is None:
            wT_slots = ss.transpose.w_slots
    if wT_slots is None:
        wT_slots = transpose_w_slots(ss, w_slots)
    tt = ss.transpose
    fwd_ints = (ss.slot_sender, ss.r_loc, ss.sub_wid, ss.macro_rb,
                ss.macro_first)
    bwd_ints = (tt.slot_sender, tt.r_loc, tt.sub_wid, tt.macro_rb,
                tt.macro_first)
    return _core((ss.meta, tt.meta), jnp.dtype(compute_dtype).name,
                 fwd_ints, bwd_ints, w_slots.astype(jnp.float32),
                 wT_slots.astype(jnp.float32), x)


def stream_spmm_edges(ss: StreamCOO, weights, x, *, compute_dtype=None):
    """Compat shim: weights in ORIGINAL edge order ([E]).  Pays two row-takes
    to realign (use slot-aligned weights on hot paths)."""
    we = jnp.concatenate(
        [weights.astype(jnp.float32), jnp.zeros((1,), jnp.float32)]
    )
    w_slots = jnp.take(we[:, None], ss.slot_src, axis=0)[:, 0]
    wT_slots = jnp.take(we[:, None], ss.transpose.slot_src, axis=0)[:, 0]
    return stream_spmm(ss, w_slots, x, wT_slots=wT_slots,
                       compute_dtype=compute_dtype)


def edge_to_slot(ss: StreamCOO, values, fill=0.0):
    """Host-side: realign an original-edge-order numpy array to slot order."""
    v = np.asarray(values)
    ext = np.concatenate([v, np.full((1,), fill, v.dtype)])
    return ext[np.asarray(ss.slot_src)]


def stack_streams(structs: Sequence[StreamCOO]) -> StreamCOO:
    """Stack per-device structures along a leading device axis (SPMD use:
    shard the result over the mesh axis, then strip the local axis inside
    ``shard_map`` with ``local_stream``).  All structures must share one
    meta — build them with the same parameters and a common
    ``macro_budget``."""
    metas = {s.meta for s in structs}
    assert len(metas) == 1, (
        f"structures disagree on meta ({metas}); pin macro_budget"
    )
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *structs)


def local_stream(stacked: StreamCOO) -> StreamCOO:
    """Strip the leading (device-local, size-1) axis inside ``shard_map``."""
    return jax.tree_util.tree_map(lambda l: l[0], stacked)


def choose_stream(senders, receivers, num_nodes: int,
                  feature_dim: int) -> dict:
    """Default parameter choice — the on-chip sweep optimum at
    V=100k/E=1M/F=128 (experiments/stream_variants.py, docs/performance.md):
    tr_w=64 halves the materialised one-hot bytes streamed per edge slot,
    chunk=64 bounds window padding, mc=24 keeps the macro grid short."""
    return dict(tr_w=64, chunk=64, mc=24, wb=16)
