#!/usr/bin/env python
"""A/B scatter-kernel variants for stream-spmm on the uniform regime.

Each variant measures the FULL pipeline (take + scatter) chained in one
fori_loop (dispatch-free).  Target: >=3x over ELL-XLA (~78 M e/s) at
V=100k, E=1M, F=128 -> total <= 4.25 ms.
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from kgcn_tpu.runtime.jax_setup import setup_jax

setup_jax({})

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kgcn_tpu.ops.stream_spmm import build_stream

LOG = open("/tmp/stream_variants.log", "a")


def log(m):
    print(m, flush=True)
    LOG.write(m + "\n")
    LOG.flush()


def timed_loop(body, init, iters=30, extra=None):
    from experiments._timing import slope_time

    if extra is None:
        f = jax.jit(lambda c, n: lax.fori_loop(
            0, n, lambda i, cc: body(cc), c))
        args = (init,)
    else:
        f = jax.jit(lambda c, ex, n: lax.fori_loop(
            0, n, lambda i, cc: body(cc, ex), c))
        args = (init, extra)
    return slope_time(f, args, iters)


def run_variant(name, ss, V, F, x, variant, take_dtype=jnp.bfloat16):
    m = ss.meta
    tr_w, chunk, mc, wb = m.tr_w, m.chunk, m.mc, m.wb
    Fp = 128
    slots = m.slots
    n_sub = m.n_sub
    rows = m.n_rb * wb * tr_w

    # host-side static one-hot materialisation (weights folded: all 1 here,
    # padding slots -> 0)
    r_loc = np.asarray(ss.r_loc).reshape(-1)
    valid = np.asarray(ss.slot_src) < m.num_edges
    w_slots = np.asarray(ss.w_slots)

    common = dict(
        macro_rb=ss.macro_rb, macro_first=ss.macro_first,
    )

    if variant in ("mat_bf16", "mat_bf16_pack"):
        if variant == "mat_bf16":
            oh = np.zeros((slots, tr_w), np.float32)
            oh[np.arange(slots), r_loc] = w_slots
            oh = jnp.asarray(oh.astype(jnp.bfloat16))
        else:
            # block-diag packed: 4 subs -> one (4*chunk, 4*tr_w) one-hot
            sub_wid = np.asarray(ss.sub_wid).reshape(-1)
            col = (sub_wid[np.arange(slots) // chunk] % 4) * tr_w + r_loc
            oh = np.zeros((slots, 4 * tr_w), np.float32)
            oh[np.arange(slots), col] = w_slots
            oh = jnp.asarray(oh.astype(jnp.bfloat16))

    if variant == "mat_bf16":
        # one-hot streamed from HBM; 2nd matmul routes windows as before
        def kern(rb_ref, first_ref, wid_ref, oh_ref, g_ref, out_ref):
            i = pl.program_id(0)

            @pl.when(first_ref[i] == 1)
            def _z():
                out_ref[:] = jnp.zeros_like(out_ref)

            oh3 = oh_ref[:].reshape(mc, chunk, tr_w)
            g3 = g_ref[:].reshape(mc, chunk, -1)
            slabs = jax.lax.dot_general(
                oh3, g3, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            wid = wid_ref[:]
            iota_w = jax.lax.broadcasted_iota(jnp.int32, (wb, mc), 0)
            oh_w = (iota_w == wid.reshape(1, mc)).astype(jnp.float32)
            blk = jax.lax.dot_general(
                oh_w, slabs, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[:] += blk.reshape(wb * tr_w, -1)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(m.n_macros,),
            in_specs=[
                pl.BlockSpec((mc, 1), lambda i, rb, f: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mc * chunk, tr_w), lambda i, rb, f: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mc * chunk, Fp), lambda i, rb, f: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((wb * tr_w, Fp),
                                   lambda i, rb, f: (rb[i], 0),
                                   memory_space=pltpu.VMEM),
        )

        def scatter(g, oh_):
            return pl.pallas_call(
                kern, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((rows, Fp), jnp.float32),
                cost_estimate=pl.CostEstimate(
                    flops=2 * slots * tr_w * Fp,
                    bytes_accessed=slots * (Fp + tr_w) * 2 + rows * Fp * 4,
                    transcendentals=0),
            )(ss.macro_rb, ss.macro_first, ss.sub_wid, oh_, g)[:V]

    elif variant == "mat_bf16_pack":
        # 4-sub packed: one (4*chunk, 4*tr_w) matmul per quad; mc must be
        # a multiple of 4; windows routed by quad then 2nd matmul over wb
        assert mc % 4 == 0
        q = mc // 4
        # wid of each quad slab row-block: precompute window of each sub
        sub_wid = np.asarray(ss.sub_wid).reshape(-1)

        def kern(rb_ref, first_ref, wid_ref, oh_ref, g_ref, out_ref):
            i = pl.program_id(0)

            @pl.when(first_ref[i] == 1)
            def _z():
                out_ref[:] = jnp.zeros_like(out_ref)

            oh3 = oh_ref[:].reshape(q, 4 * chunk, 4 * tr_w)
            g3 = g_ref[:].reshape(q, 4 * chunk, -1)
            slabs = jax.lax.dot_general(
                oh3, g3, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # (q, 4*tr_w, F)
            slabs = slabs.reshape(mc, tr_w, -1)
            wid = wid_ref[:]
            iota_w = jax.lax.broadcasted_iota(jnp.int32, (wb, mc), 0)
            oh_w = (iota_w == wid.reshape(1, mc)).astype(jnp.float32)
            blk = jax.lax.dot_general(
                oh_w, slabs, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[:] += blk.reshape(wb * tr_w, -1)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(m.n_macros,),
            in_specs=[
                pl.BlockSpec((mc, 1), lambda i, rb, f: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mc * chunk, 4 * tr_w),
                             lambda i, rb, f: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mc * chunk, Fp), lambda i, rb, f: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((wb * tr_w, Fp),
                                   lambda i, rb, f: (rb[i], 0),
                                   memory_space=pltpu.VMEM),
        )

        def scatter(g, oh_):
            return pl.pallas_call(
                kern, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((rows, Fp), jnp.float32),
                cost_estimate=pl.CostEstimate(
                    flops=2 * slots * 4 * tr_w * Fp,
                    bytes_accessed=slots * (Fp + 4 * tr_w) * 2
                    + rows * Fp * 4,
                    transcendentals=0),
            )(ss.macro_rb, ss.macro_first, ss.sub_wid, oh_, g)[:V]

    elif variant == "slice_acc":
        # wid in scalar prefetch; per-sub dynamic-slice accumulate
        sub_wid_sp = jnp.asarray(np.asarray(ss.sub_wid).reshape(-1))
        w_col = jnp.asarray(w_slots.reshape(-1, 1))

        def kern(rb_ref, first_ref, wid_ref, rloc_ref, w_ref, g_ref,
                 out_ref):
            i = pl.program_id(0)

            @pl.when(first_ref[i] == 1)
            def _z():
                out_ref[:] = jnp.zeros_like(out_ref)

            rl = rloc_ref[:]
            w = w_ref[:]
            iota_r = jax.lax.broadcasted_iota(
                jnp.int32, (mc * chunk, tr_w), 1)
            oh = jnp.where(iota_r == rl, w, 0.0).astype(jnp.bfloat16)
            oh3 = oh.reshape(mc, chunk, tr_w)
            g3 = g_ref[:].reshape(mc, chunk, -1)
            slabs = jax.lax.dot_general(
                oh3, g3, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            for k in range(mc):
                off = wid_ref[i * mc + k] * tr_w
                off = pl.multiple_of(off, tr_w)
                out_ref[pl.ds(off, tr_w), :] += slabs[k]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3, grid=(m.n_macros,),
            in_specs=[
                pl.BlockSpec((mc * chunk, 1), lambda i, rb, f, wd: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mc * chunk, 1), lambda i, rb, f, wd: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mc * chunk, Fp), lambda i, rb, f, wd: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((wb * tr_w, Fp),
                                   lambda i, rb, f, wd: (rb[i], 0),
                                   memory_space=pltpu.VMEM),
        )
        r_col = jnp.asarray(r_loc.reshape(-1, 1))

        def scatter(g, oh_):
            return pl.pallas_call(
                kern, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((rows, Fp), jnp.float32),
                cost_estimate=pl.CostEstimate(
                    flops=2 * slots * tr_w * Fp,
                    bytes_accessed=slots * (Fp * 2 + 8) + rows * Fp * 4,
                    transcendentals=0),
            )(ss.macro_rb, ss.macro_first, sub_wid_sp, r_col, w_col, g)[:V]

    else:
        raise ValueError(variant)

    sj = ss.slot_sender
    if variant == "slice_acc":
        oh = jnp.zeros((1, 1), jnp.bfloat16)   # unused placeholder

    def pipeline(c, oh_):
        xe = jnp.concatenate([c, jnp.zeros((1, F), c.dtype)])
        g = jnp.take(xe.astype(take_dtype), sj, axis=0)
        if take_dtype != jnp.bfloat16:
            g = g.astype(jnp.bfloat16)
        out = scatter(g, oh_)
        return out[:V]

    # correctness once
    ref_s = np.asarray(ss.slot_sender)
    ref = np.zeros((V, F), np.float32)
    xn = np.asarray(x)
    xe = np.concatenate([xn, np.zeros((1, F), np.float32)])
    gs = xe[ref_s] * w_slots[:, None]
    rl_glob = np.zeros(slots, np.int64)
    sub_of_slot = np.arange(slots) // chunk
    wid_np = np.asarray(ss.sub_wid).reshape(-1)
    rb_np = np.asarray(ss.macro_rb)
    rb_of_slot = rb_np[sub_of_slot // mc]
    rl_glob = (rb_of_slot * wb + wid_np[sub_of_slot]) * tr_w + r_loc
    np.add.at(ref, rl_glob[valid] % max(rows, 1) * 0 + rl_glob[valid], gs[valid])
    ref = ref[:V]
    try:
        got = np.asarray(jax.jit(pipeline)(x, oh))
    except Exception as e:
        log(f"{name}: FAIL {str(e)[:250]}")
        return
    err = float(np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9))
    dt = timed_loop(pipeline, x, extra=oh)
    E = m.num_edges
    log(f"{name}: {E/dt/1e6:.1f} M e/s ({dt*1e3:.2f} ms) pad={slots/E:.3f}"
        f" err={err:.1e}")


def main():
    V, E, F = 100_000, 1_000_000, 128
    rng = np.random.RandomState(0)
    s = rng.randint(0, V, E).astype(np.int32)
    r = rng.randint(0, V, E).astype(np.int32)
    w = np.ones(E, np.float32)
    x = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32))
    jax.device_get(jnp.zeros(()))

    which = sys.argv[1:] or ["mat_bf16", "slice_acc", "mat_bf16_pack",
                             "lowpad", "f32take"]
    ss = build_stream(s, r, V, weights=w, tr_w=128, chunk=128, mc=8, wb=8)
    if "mat_bf16" in which:
        run_variant("mat_bf16 128/128/mc8", ss, V, F, x, "mat_bf16")
    if "f32take" in which:
        run_variant("mat_bf16+f32take", ss, V, F, x, "mat_bf16",
                    take_dtype=jnp.float32)
    if "slice_acc" in which:
        run_variant("slice_acc 128/128/mc8", ss, V, F, x, "slice_acc")
    if "mat_bf16_pack" in which:
        run_variant("mat_pack4 128/128/mc8", ss, V, F, x, "mat_bf16_pack")
    if "lowpad" in which:
        ss2 = build_stream(s, r, V, weights=w, tr_w=128, chunk=64, mc=24,
                           wb=8)
        run_variant("mat_bf16 128/64/mc24", ss2, V, F, x, "mat_bf16")
        ss3 = build_stream(s, r, V, weights=w, tr_w=128, chunk=64, mc=16,
                           wb=8)
        run_variant("mat_bf16 128/64/mc16", ss3, V, F, x, "mat_bf16")


if __name__ == "__main__":
    main()
