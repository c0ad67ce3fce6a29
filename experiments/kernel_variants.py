#!/usr/bin/env python
"""On-chip A/B of tiled-SpMM kernel variants on the uniform regime."""
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

from kgcn_tpu.ops.tiled_spmm import build_tiled, _round_up

LOG = open("/tmp/kernel_variants.log", "w")


def log(m):
    print(m, flush=True)
    LOG.write(m + "\n")
    LOG.flush()


def make_kernel(variant, ts, tr, chunk, cdt):
    if variant == "baseline":
        def kern(rt_ref, st_ref, first_ref, sloc_ref, rloc_ref, w_ref,
                 x_ref, out_ref):
            i = pl.program_id(0)

            @pl.when(first_ref[i] == 1)
            def _zero():
                out_ref[:] = jnp.zeros_like(out_ref)

            sl = sloc_ref[:]
            rl = rloc_ref[:]
            w = w_ref[:]
            iota_s = jax.lax.broadcasted_iota(jnp.int32, (chunk, ts), 1)
            oh_sw = jnp.where(iota_s == sl, w, 0.0).astype(cdt)
            m = jnp.dot(oh_sw, x_ref[:], preferred_element_type=jnp.float32)
            iota_r = jax.lax.broadcasted_iota(jnp.int32, (chunk, tr), 1)
            oh_r = (iota_r == rl).astype(cdt)
            out_ref[:] += jax.lax.dot_general(
                oh_r, m.astype(cdt),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return kern
    if variant == "i16":
        def kern(rt_ref, st_ref, first_ref, sloc_ref, rloc_ref, w_ref,
                 x_ref, out_ref):
            i = pl.program_id(0)

            @pl.when(first_ref[i] == 1)
            def _zero():
                out_ref[:] = jnp.zeros_like(out_ref)

            sl = sloc_ref[:].astype(jnp.int16)
            rl = rloc_ref[:].astype(jnp.int16)
            w = w_ref[:]
            iota_s = jax.lax.broadcasted_iota(jnp.int16, (chunk, ts), 1)
            oh_s = (iota_s == sl).astype(cdt)
            m = jnp.dot(oh_s, x_ref[:], preferred_element_type=jnp.float32)
            m = m * w  # fold weights after the gather matmul (chunk, F)
            iota_r = jax.lax.broadcasted_iota(jnp.int16, (chunk, tr), 1)
            oh_r = (iota_r == rl).astype(cdt)
            out_ref[:] += jax.lax.dot_general(
                oh_r, m.astype(cdt),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return kern
    if variant == "wfold_after":
        def kern(rt_ref, st_ref, first_ref, sloc_ref, rloc_ref, w_ref,
                 x_ref, out_ref):
            i = pl.program_id(0)

            @pl.when(first_ref[i] == 1)
            def _zero():
                out_ref[:] = jnp.zeros_like(out_ref)

            sl = sloc_ref[:]
            rl = rloc_ref[:]
            w = w_ref[:]
            iota_s = jax.lax.broadcasted_iota(jnp.int32, (chunk, ts), 1)
            oh_s = (iota_s == sl).astype(cdt)
            m = jnp.dot(oh_s, x_ref[:], preferred_element_type=jnp.float32)
            m = m * w
            iota_r = jax.lax.broadcasted_iota(jnp.int32, (chunk, tr), 1)
            oh_r = (iota_r == rl).astype(cdt)
            out_ref[:] += jax.lax.dot_general(
                oh_r, m.astype(cdt),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return kern
    raise ValueError(variant)


def run(variant, te, w_chunks, x, cdt, iters=30):
    meta = te.meta
    ts, tr, chunk = meta.ts, meta.tr, meta.chunk
    F = x.shape[1]
    Fp = _round_up(F, 128)
    xp = x
    if xp.shape[0] != meta.n_st * ts:
        xp = jnp.pad(xp, ((0, meta.n_st * ts - xp.shape[0]), (0, 0)))
    xp = xp.astype(cdt)
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
    kern = make_kernel(variant, ts, tr, chunk, cdt)

    def call(x_):
        xpad = jnp.pad(x_, ((0, meta.n_st * ts - x_.shape[0]), (0, 0)))
        xpad = xpad.astype(cdt)
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((meta.n_rt * tr, Fp), jnp.float32),
        )(te.chunk_rt, te.chunk_st, te.chunk_first,
          te.s_loc.reshape(-1, 1), te.r_loc.reshape(-1, 1),
          w_chunks.reshape(-1, 1), xpad)[: meta.num_receivers, :F]

    f = jax.jit(call)
    looped = jax.jit(lambda x_, n: lax.fori_loop(
        0, n, lambda i, xx: f(xx), x_))
    try:
        t0 = time.perf_counter()
        jax.block_until_ready(looped(x, 2))
        tc = time.perf_counter() - t0
    except Exception as e:
        log(f"{variant}: FAIL {str(e)[:200]}")
        return None
    t0 = time.perf_counter()
    jax.block_until_ready(looped(x, iters))
    dt = (time.perf_counter() - t0) / iters
    return dt, tc


def main():
    V, E, F = 100_000, 1_000_000, 128
    rng = np.random.RandomState(0)
    s = rng.randint(0, V, E)
    r = rng.randint(0, V, E)
    x = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32))
    jax.device_get(jnp.zeros(()))
    te = build_tiled(s, r, V, ts=1024, tr=1024, chunk=128,
                     with_transpose=False)
    w_ext = jnp.concatenate([jnp.ones((E,), jnp.float32),
                             jnp.zeros((1,), jnp.float32)])
    w_chunks = w_ext[te.slot_src]
    for variant in sys.argv[1:] or ["baseline", "wfold_after", "i16"]:
        out = run(variant, te, w_chunks, x, jnp.bfloat16)
        if out:
            dt, tc = out
            log(f"{variant}: {E/dt/1e6:.1f} M e/s ({dt*1e3:.2f} ms) "
                f"compile {tc:.0f}s")


if __name__ == "__main__":
    main()
