#!/usr/bin/env python
"""Prototype: receiver-sorted streaming scatter SpMM for scattered regimes.

Scheme: g = x[slot_sender] (XLA row-gather, issue-bound ~450M rows/s) then a
Pallas kernel scatter-accumulates receiver-sorted message chunks into
(tr_w, F) output windows via tiny one-hot matmuls.  Per-chunk compute is
2*chunk*tr_w*F MXU flops (tr_w=128 -> 33k flops/edge, ~20x below the tiled
kernel's 2F(ts+tr)=524k), and g streams sequentially at full HBM bandwidth.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from kgcn_tpu.runtime.jax_setup import setup_jax

setup_jax({})

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG = open("/tmp/stream_proto.log", "a")


def log(m):
    print(m, flush=True)
    LOG.write(m + "\n")
    LOG.flush()


def cdiv(a, b):
    return -(-a // b)


def build_stream(s, r, V, tr_w=128, chunk=128):
    """Host-side: sort edges by receiver, window receivers by tr_w rows,
    chunks of `chunk` slots per window (each chunk maps to ONE window)."""
    E = len(s)
    order = np.argsort(r, kind="stable")
    s_sorted, r_sorted = s[order], r[order]
    rw = r_sorted // tr_w
    n_rw = max(cdiv(V, tr_w), 1)
    # counts per window (all windows present so every out block is zeroed)
    counts = np.bincount(rw, minlength=n_rw)
    chunks_per_w = np.maximum(cdiv(counts, chunk), 1)
    chunk_base = np.concatenate([[0], np.cumsum(chunks_per_w)])
    n_chunks = int(chunk_base[-1])
    # rank within window
    wstart = np.concatenate([[0], np.cumsum(counts)])
    rank = np.arange(E) - wstart[rw]
    slot = chunk_base[rw] * chunk + rank
    slots = n_chunks * chunk
    slot_sender = np.full(slots, V, np.int32)       # sentinel -> zero row
    r_loc = np.zeros(slots, np.int32)
    slot_eid = np.full(slots, E, np.int32)          # sentinel -> zero weight
    slot_sender[slot] = s_sorted
    r_loc[slot] = (r_sorted % tr_w).astype(np.int32)
    slot_eid[slot] = order
    chunk_rw = np.repeat(np.arange(n_rw), chunks_per_w).astype(np.int32)
    chunk_first = np.zeros(n_chunks, np.int32)
    chunk_first[chunk_base[:-1]] = 1
    return dict(slot_sender=slot_sender, r_loc=r_loc, slot_eid=slot_eid,
                chunk_rw=chunk_rw, chunk_first=chunk_first,
                n_chunks=n_chunks, n_rw=n_rw, slots=slots)


def scatter_kernel(rw_ref, first_ref, rloc_ref, w_ref, g_ref, out_ref, *,
                   chunk, tr_w, cdt):
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    rl = rloc_ref[:]                        # (chunk, 1)
    w = w_ref[:]                            # (chunk, 1) f32
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (chunk, tr_w), 1)
    oh_rw = jnp.where(iota_r == rl, w, 0.0).astype(cdt)   # fold weight here
    out_ref[:] += jax.lax.dot_general(
        oh_rw, g_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def make_stream_spmm(st, V, F, tr_w, chunk, cdt):
    n_chunks = st["n_chunks"]
    Fp = cdiv(F, 128) * 128
    slot_col = pl.BlockSpec((chunk, 1), lambda i, rw, f: (i, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            slot_col, slot_col,
            pl.BlockSpec((chunk, Fp), lambda i, rw, f: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr_w, Fp), lambda i, rw, f: (rw[i], 0),
                               memory_space=pltpu.VMEM),
    )
    kern = functools.partial(scatter_kernel, chunk=chunk, tr_w=tr_w, cdt=cdt)
    slot_sender = jnp.asarray(st["slot_sender"])
    r_loc = jnp.asarray(st["r_loc"].reshape(n_chunks, chunk, 1)
                        .reshape(-1, 1))
    chunk_rw = jnp.asarray(st["chunk_rw"])
    chunk_first = jnp.asarray(st["chunk_first"])
    slot_eid = jnp.asarray(st["slot_eid"])

    def f(w, x):
        xe = jnp.concatenate([x, jnp.zeros((1, F), x.dtype)])
        g = jnp.take(xe, slot_sender, axis=0).astype(cdt)   # [slots, F]
        if Fp != F:
            g = jnp.pad(g, ((0, 0), (0, Fp - F)))
        g = g.reshape(n_chunks * chunk, Fp)
        we = jnp.concatenate([w.astype(jnp.float32), jnp.zeros((1,))])
        w_slots = we[slot_eid].reshape(-1, 1)
        out = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((st["n_rw"] * tr_w, Fp),
                                           jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * n_chunks * chunk * tr_w * Fp,
                bytes_accessed=n_chunks * chunk * (Fp * 2 + 8)
                + st["n_rw"] * tr_w * Fp * 4,
                transcendentals=0,
            ),
        )(chunk_rw, chunk_first, r_loc, w_slots, g)
        return out[:V, :F]

    return f


def bench(fn, args, iters=20):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    jax.block_until_ready(f(*args))
    jax.block_until_ready(f(*args))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters, tc


def main():
    V, E, F = 100_000, 1_000_000, 128
    rng = np.random.RandomState(0)
    s = rng.randint(0, V, E).astype(np.int32)
    r = rng.randint(0, V, E).astype(np.int32)
    w = np.ones(E, np.float32)
    x = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32))
    wj = jnp.asarray(w)
    jax.device_get(jnp.zeros(()))

    # 1) XLA take alone: issue-bound baseline for the gather stage
    sj = jnp.asarray(s)
    dt, tc = bench(lambda x_: jnp.take(x_, sj, axis=0).sum(), (x,))
    log(f"take[f32]: {E/dt/1e6:.1f} M rows/s ({dt*1e3:.2f} ms) compile {tc:.0f}s")

    # 2) XLA reference: take + segment_sum (the COO path)
    rj = jnp.asarray(r)
    dt, tc = bench(
        lambda w_, x_: jax.ops.segment_sum(
            jnp.take(x_, sj, axis=0) * w_[:, None], rj, num_segments=V),
        (wj, x))
    log(f"coo_xla: {E/dt/1e6:.1f} M e/s ({dt*1e3:.2f} ms)")

    # 3) stream kernel, a few configs
    for tr_w, chunk, cdt in [(128, 128, jnp.bfloat16),
                             (128, 256, jnp.bfloat16),
                             (256, 256, jnp.bfloat16),
                             (128, 128, jnp.float32)]:
        st = build_stream(s, r, V, tr_w=tr_w, chunk=chunk)
        pad = st["slots"] / E
        f = make_stream_spmm(st, V, F, tr_w, chunk, cdt)
        try:
            dt, tc = bench(f, (wj, x))
        except Exception as e:
            log(f"stream tr_w={tr_w} chunk={chunk} {np.dtype(cdt).name}: "
                f"FAIL {str(e)[:300]}")
            continue
        # correctness vs XLA
        ref = jax.ops.segment_sum(
            jnp.take(x, sj, axis=0) * wj[:, None], rj, num_segments=V)
        got = f(wj, x)
        err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
        log(f"stream tr_w={tr_w} chunk={chunk} {np.dtype(cdt).name}: "
            f"{E/dt/1e6:.1f} M e/s ({dt*1e3:.2f} ms) pad={pad:.2f} "
            f"err={err:.1e} compile {tc:.0f}s")


if __name__ == "__main__" and "v1" in sys.argv:
    main()


# ---------------------------------------------------------------------------
# v2: macro-chunked scatter — 3 matmuls per grid step, no inner loop


def build_stream_v2(s, r, V, tr_w=128, chunk=128, mc=32, wb=8):
    """Sort by receiver; windows of tr_w rows; sub-chunks of `chunk` slots per
    window; macro-chunks of `mc` sub-chunks per out block of wb windows."""
    E = len(s)
    TRB = tr_w * wb
    order = np.argsort(r, kind="stable")
    s_sorted, r_sorted = s[order], r[order]
    rw = r_sorted // tr_w
    n_rw = max(cdiv(V, tr_w), 1)
    n_rb = max(cdiv(n_rw, wb), 1)
    counts = np.bincount(rw, minlength=n_rw)
    sub_per_w = np.maximum(cdiv(counts, chunk), 1)
    # window -> (block, widx); sub-chunk list per block in window order
    wblock = np.arange(n_rw) // wb
    # sub-chunks laid out block-major then window order
    sub_base = np.concatenate([[0], np.cumsum(sub_per_w)])
    n_sub = int(sub_base[-1])
    sub_w = np.repeat(np.arange(n_rw), sub_per_w)
    # pad sub-chunks so each block owns a multiple of mc
    subs_per_block = np.bincount(wblock[sub_w], minlength=n_rb)
    macros_per_block = np.maximum(cdiv(subs_per_block, mc), 1)
    total_macros = int(macros_per_block.sum())
    total_subs = total_macros * mc
    # final sub slot layout: block-major, real subs first then padding subs
    block_sub_base = np.concatenate([[0], np.cumsum(macros_per_block * mc)])
    # map each real sub-chunk to its padded position
    sub_block = wblock[sub_w]
    # rank of sub within its block
    first_in_block = np.searchsorted(sub_block, sub_block, side="left")
    sub_rank = np.arange(n_sub) - first_in_block
    sub_pos = block_sub_base[sub_block] + sub_rank

    slots = total_subs * chunk
    slot_sender = np.full(slots, V, np.int32)
    r_loc = np.zeros(slots, np.int32)
    slot_eid = np.full(slots, E, np.int32)
    sub_wid = np.zeros(total_subs, np.int32)  # window idx within block
    sub_wid[sub_pos] = (sub_w % wb).astype(np.int32)

    wstart = np.concatenate([[0], np.cumsum(counts)])
    rank = np.arange(E) - wstart[rw]
    # slot of edge: position of its (window, sub-rank) sub-chunk
    edge_sub = sub_base[rw] + rank // chunk
    # edge_sub indexes the unpadded sub list; map through sub_pos
    slot = sub_pos[edge_sub] * chunk + rank % chunk
    slot_sender[slot] = s_sorted
    r_loc[slot] = (r_sorted % tr_w).astype(np.int32)
    slot_eid[slot] = order

    macro_rb = np.repeat(np.arange(n_rb), macros_per_block).astype(np.int32)
    macro_first = np.zeros(total_macros, np.int32)
    macro_first[0] = 1
    macro_first[1:][macro_rb[1:] != macro_rb[:-1]] = 1
    return dict(slot_sender=slot_sender, r_loc=r_loc, slot_eid=slot_eid,
                sub_wid=sub_wid, macro_rb=macro_rb, macro_first=macro_first,
                n_macros=total_macros, n_rb=n_rb, slots=slots,
                tr_w=tr_w, chunk=chunk, mc=mc, wb=wb, TRB=TRB)


def scatter_kernel_v2(rb_ref, first_ref, rloc_ref, w_ref, wid_ref, g_ref,
                      out_ref, *, chunk, tr_w, mc, wb, cdt):
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    rl = rloc_ref[:]                       # (mc*chunk, 1)
    w = w_ref[:]                           # (mc*chunk, 1)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (mc * chunk, tr_w), 1)
    oh = jnp.where(iota_r == rl, w, 0.0).astype(cdt)
    oh3 = oh.reshape(mc, chunk, tr_w)
    g3 = g_ref[:].reshape(mc, chunk, -1)
    # slabs[m] = oh3[m].T @ g3[m]  -> (mc, tr_w, F) f32
    slabs = jax.lax.dot_general(
        oh3, g3,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    wid = wid_ref[:]                       # (mc, 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (wb, mc), 0)
    oh_w = (iota_w == wid.reshape(1, mc)).astype(cdt)
    # out[wb, tr_w, F] += oh_w @ slabs (contract mc)
    blk = jax.lax.dot_general(
        oh_w, slabs.astype(cdt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] += blk.reshape(wb * tr_w, -1)


def make_stream_spmm_v2(st, V, F, cdt, take_dtype=None):
    tr_w, chunk, mc, wb = st["tr_w"], st["chunk"], st["mc"], st["wb"]
    n_macros = st["n_macros"]
    Fp = cdiv(F, 128) * 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_macros,),
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
    kern = functools.partial(scatter_kernel_v2, chunk=chunk, tr_w=tr_w,
                             mc=mc, wb=wb, cdt=cdt)
    slot_sender = jnp.asarray(st["slot_sender"])
    r_loc = jnp.asarray(st["r_loc"].reshape(-1, 1))
    sub_wid = jnp.asarray(st["sub_wid"].reshape(-1, 1))
    macro_rb = jnp.asarray(st["macro_rb"])
    macro_first = jnp.asarray(st["macro_first"])
    slot_eid = jnp.asarray(st["slot_eid"])
    tdt = take_dtype or cdt

    def f(w, x):
        xe = jnp.concatenate([x, jnp.zeros((1, F), x.dtype)]).astype(tdt)
        g = jnp.take(xe, slot_sender, axis=0)                  # [slots, F]
        if Fp != F:
            g = jnp.pad(g, ((0, 0), (0, Fp - F)))
        we = jnp.concatenate([w.astype(jnp.float32), jnp.zeros((1,))])
        w_slots = we[slot_eid].reshape(-1, 1)
        out = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((st["n_rb"] * wb * tr_w, Fp),
                                           jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * st["slots"] * tr_w * Fp,
                bytes_accessed=st["slots"] * (Fp * 2 + 8)
                + st["n_rb"] * wb * tr_w * Fp * 4,
                transcendentals=0,
            ),
        )(macro_rb, macro_first, r_loc, w_slots, sub_wid,
          g.astype(cdt))
        return out[:V, :F]

    return f


def main_v2():
    V, E, F = 100_000, 1_000_000, 128
    rng = np.random.RandomState(0)
    s = rng.randint(0, V, E).astype(np.int32)
    r = rng.randint(0, V, E).astype(np.int32)
    w = np.ones(E, np.float32)
    x = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32))
    wj = jnp.asarray(w)
    sj = jnp.asarray(s)
    rj = jnp.asarray(r)
    jax.device_get(jnp.zeros(()))

    xb = x.astype(jnp.bfloat16)
    dt, _ = bench(lambda x_: jnp.take(x_, sj, axis=0).sum(), (xb,))
    log(f"take[bf16]: {E/dt/1e6:.1f} M rows/s ({dt*1e3:.2f} ms)")

    ref = jax.ops.segment_sum(
        jnp.take(x, sj, axis=0) * wj[:, None], rj, num_segments=V)

    for tr_w, chunk, mc, wb in [(128, 128, 32, 8), (128, 128, 16, 8),
                                (128, 256, 16, 8), (256, 256, 16, 4)]:
        st = build_stream_v2(s, r, V, tr_w=tr_w, chunk=chunk, mc=mc, wb=wb)
        pad = st["slots"] / E
        f = make_stream_spmm_v2(st, V, F, jnp.bfloat16)
        try:
            dt, tc = bench(f, (wj, x))
        except Exception as e:
            log(f"v2 tr_w={tr_w} chunk={chunk} mc={mc} wb={wb}: FAIL "
                f"{str(e)[:300]}")
            continue
        got = f(wj, x)
        err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
        log(f"v2 tr_w={tr_w} chunk={chunk} mc={mc} wb={wb}: "
            f"{E/dt/1e6:.1f} M e/s ({dt*1e3:.2f} ms) pad={pad:.2f} "
            f"macros={st['n_macros']} err={err:.1e} compile {tc:.0f}s")


if __name__ == "__main__" and "v2" in sys.argv:
    main_v2()


# ---------------------------------------------------------------------------
# v3: w via contiguous slice-gather; decomposed timings; config sweep


def build_stream_v3(s, r, V, tr_w=128, chunk=128, mc=16, wb=8):
    """Like v2 but records per-sub-chunk edge spans (e0, count) so weights are
    fetched with a slice-gather instead of a per-slot scalar gather."""
    E = len(s)
    order = np.argsort(r, kind="stable")
    s_sorted, r_sorted = s[order], r[order]
    rw = r_sorted // tr_w
    n_rw = max(cdiv(V, tr_w), 1)
    n_rb = max(cdiv(n_rw, wb), 1)
    counts = np.bincount(rw, minlength=n_rw)
    sub_per_w = np.maximum(cdiv(counts, chunk), 1)
    wblock = np.arange(n_rw) // wb
    sub_base = np.concatenate([[0], np.cumsum(sub_per_w)])
    n_sub = int(sub_base[-1])
    sub_w = np.repeat(np.arange(n_rw), sub_per_w)
    subs_per_block = np.bincount(wblock[sub_w], minlength=n_rb)
    macros_per_block = np.maximum(cdiv(subs_per_block, mc), 1)
    total_macros = int(macros_per_block.sum())
    total_subs = total_macros * mc
    block_sub_base = np.concatenate([[0], np.cumsum(macros_per_block * mc)])
    sub_block = wblock[sub_w]
    first_in_block = np.searchsorted(sub_block, sub_block, side="left")
    sub_rank = np.arange(n_sub) - first_in_block
    sub_pos = block_sub_base[sub_block] + sub_rank

    slots = total_subs * chunk
    slot_sender = np.full(slots, V, np.int32)
    r_loc = np.zeros(slots, np.int32)
    sub_wid = np.zeros(total_subs, np.int32)
    sub_e0 = np.zeros(total_subs, np.int32)     # first sorted-edge of sub
    sub_cnt = np.zeros(total_subs, np.int32)    # valid edges in sub
    sub_wid[sub_pos] = (sub_w % wb).astype(np.int32)

    wstart = np.concatenate([[0], np.cumsum(counts)])
    # per real sub-chunk: e0 and count
    sub_rank_in_w = np.arange(n_sub) - sub_base[sub_w]
    e0 = wstart[sub_w] + sub_rank_in_w * chunk
    cnt = np.minimum(counts[sub_w] - sub_rank_in_w * chunk, chunk)
    sub_e0[sub_pos] = e0.astype(np.int32)
    sub_cnt[sub_pos] = np.maximum(cnt, 0).astype(np.int32)

    rank = np.arange(E) - wstart[rw]
    edge_sub = sub_base[rw] + rank // chunk
    slot = sub_pos[edge_sub] * chunk + rank % chunk
    slot_sender[slot] = s_sorted
    r_loc[slot] = (r_sorted % tr_w).astype(np.int32)

    macro_rb = np.repeat(np.arange(n_rb), macros_per_block).astype(np.int32)
    macro_first = np.zeros(total_macros, np.int32)
    macro_first[0] = 1
    macro_first[1:][macro_rb[1:] != macro_rb[:-1]] = 1
    return dict(slot_sender=slot_sender, r_loc=r_loc, sub_wid=sub_wid,
                sub_e0=sub_e0, sub_cnt=sub_cnt, order=order,
                macro_rb=macro_rb, macro_first=macro_first,
                n_macros=total_macros, n_rb=n_rb, slots=slots,
                tr_w=tr_w, chunk=chunk, mc=mc, wb=wb)


def scatter_kernel_v3(rb_ref, first_ref, rloc_ref, w_ref, wid_ref, g_ref,
                      out_ref, *, chunk, tr_w, mc, wb, cdt):
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    rl = rloc_ref[:]
    w = w_ref[:]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (mc * chunk, tr_w), 1)
    oh = jnp.where(iota_r == rl, w, 0.0).astype(cdt)
    oh3 = oh.reshape(mc, chunk, tr_w)
    g3 = g_ref[:].reshape(mc, chunk, -1)
    slabs = jax.lax.dot_general(
        oh3, g3,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (mc, tr_w, F) f32
    wid = wid_ref[:]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (wb, mc), 0)
    oh_w = (iota_w == wid.reshape(1, mc)).astype(jnp.float32)
    blk = jax.lax.dot_general(
        oh_w, slabs,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (wb, tr_w, F)
    out_ref[:] += blk.reshape(wb * tr_w, -1)


def make_stream_spmm_v3(st, V, F, cdt, parts=False):
    tr_w, chunk, mc, wb = st["tr_w"], st["chunk"], st["mc"], st["wb"]
    n_macros = st["n_macros"]
    Fp = cdiv(F, 128) * 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_macros,),
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
    kern = functools.partial(scatter_kernel_v3, chunk=chunk, tr_w=tr_w,
                             mc=mc, wb=wb, cdt=cdt)
    slot_sender = jnp.asarray(st["slot_sender"])
    r_loc = jnp.asarray(st["r_loc"].reshape(-1, 1))
    sub_wid = jnp.asarray(st["sub_wid"].reshape(-1, 1))
    macro_rb = jnp.asarray(st["macro_rb"])
    macro_first = jnp.asarray(st["macro_first"])
    sub_e0 = jnp.asarray(st["sub_e0"])
    sub_cnt = jnp.asarray(st["sub_cnt"])
    order = jnp.asarray(st["order"])
    total_subs = st["n_macros"] * mc

    def w_slots_fn(w):
        w_sorted = w.astype(jnp.float32)[order]
        w_pad = jnp.concatenate([w_sorted, jnp.zeros((chunk,), jnp.float32)])
        # [n_sub, chunk] slice-gather: contiguous spans, then mask padding
        sl = jax.lax.gather(
            w_pad, sub_e0[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(chunk,), mode="clip",
        )
        valid = (jax.lax.broadcasted_iota(jnp.int32, (total_subs, chunk), 1)
                 < sub_cnt[:, None])
        return jnp.where(valid, sl, 0.0).reshape(-1, 1)

    def gather_fn(x):
        xe = jnp.concatenate([x, jnp.zeros((1, F), x.dtype)]).astype(cdt)
        g = jnp.take(xe, slot_sender, axis=0)
        if Fp != F:
            g = jnp.pad(g, ((0, 0), (0, Fp - F)))
        return g

    def scatter_fn(w_slots, g):
        out = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((st["n_rb"] * wb * tr_w, Fp),
                                           jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * st["slots"] * tr_w * Fp,
                bytes_accessed=st["slots"] * (Fp * 2 + 8)
                + st["n_rb"] * wb * tr_w * Fp * 4,
                transcendentals=0,
            ),
        )(macro_rb, macro_first, r_loc, w_slots, sub_wid, g)
        return out[:V, :F]

    def f(w, x):
        return scatter_fn(w_slots_fn(w), gather_fn(x))

    if parts:
        return f, w_slots_fn, gather_fn, scatter_fn
    return f


def main_v3():
    V, E, F = 100_000, 1_000_000, 128
    rng = np.random.RandomState(0)
    s = rng.randint(0, V, E).astype(np.int32)
    r = rng.randint(0, V, E).astype(np.int32)
    w = np.ones(E, np.float32)
    x = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32))
    wj = jnp.asarray(w)
    sj = jnp.asarray(s)
    rj = jnp.asarray(r)
    jax.device_get(jnp.zeros(()))
    ref = jax.ops.segment_sum(
        jnp.take(x, sj, axis=0) * wj[:, None], rj, num_segments=V)

    first = True
    for tr_w, chunk, mc, wb in [(128, 128, 8, 8), (128, 128, 16, 8),
                                (128, 256, 8, 8), (256, 256, 8, 4),
                                (512, 512, 8, 2)]:
        log(f"v3 building tr_w={tr_w} chunk={chunk} mc={mc} wb={wb} ...")
        st = build_stream_v3(s, r, V, tr_w=tr_w, chunk=chunk, mc=mc, wb=wb)
        pad = st["slots"] / E
        log(f"   built: macros={st['n_macros']} pad={pad:.2f}; compiling...")
        f, wfn, gfn, sfn = make_stream_spmm_v3(st, V, F, jnp.bfloat16,
                                               parts=True)
        try:
            dt, tc = bench(f, (wj, x))
        except Exception as e:
            log(f"v3 tr_w={tr_w} chunk={chunk} mc={mc} wb={wb}: FAIL "
                f"{str(e)[:300]}")
            continue
        got = f(wj, x)
        err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
        log(f"v3 tr_w={tr_w} chunk={chunk} mc={mc} wb={wb}: "
            f"{E/dt/1e6:.1f} M e/s ({dt*1e3:.2f} ms) pad={pad:.2f} "
            f"macros={st['n_macros']} err={err:.1e} compile {tc:.0f}s")
        if first:
            first = False
            dtw, _ = bench(lambda w_: wfn(w_).sum(), (wj,))
            dtg, _ = bench(lambda x_: gfn(x_).astype(jnp.float32).sum(), (x,))
            ws = wfn(wj)
            g = gfn(x)
            dts, _ = bench(sfn, (ws, g))
            log(f"   parts: w_slots {dtw*1e3:.2f} ms, gather {dtg*1e3:.2f} ms"
                f" (incl sum), scatter {dts*1e3:.2f} ms")


if __name__ == "__main__" and "v3" in sys.argv:
    main_v3()
