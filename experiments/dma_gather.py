"""On-chip microbenchmarks for the stream-SpMM gather side.

Question (VERDICT r03 #3): can a Pallas per-window DMA row-gather — fused
into the scatter kernel's macro loop — beat XLA's row-take (measured
~443 M rows/s, issue-bound, width-independent) and lift the scattered-regime
stream kernel from 271 M edges/s toward the ~400 M serial-overlap ceiling?

Sections:
  1. xla_take      — jnp.take rate vs index order (random / sorted / dup-heavy)
                     and row width (F=128 bf16/f32, F=256) → is it issue-bound?
  2. dma_rows      — Pallas kernel issuing one async DMA per gathered row
                     (double-buffered), small scale → DMA issue rate.
  3. fused_macro   — scalar-prefetch BlockSpec index_map gather at block
                     granularity (the only Pallas-native gather): one grid
                     step per gathered row → per-step overhead rate.

Run on the real chip: `python experiments/dma_gather.py`.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

# NB: do NOT use PYTHONPATH for this — any PYTHONPATH entry breaks the
# axon PJRT plugin discovery on this image
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _t(fn, *args, iters=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _t_chained(make_step, x0, iters=30):
    """Device-side timing: iterate a shape-preserving step inside ONE jitted
    fori_loop (per-dispatch timing through the tunnel attach measures queue
    latency, not device time — bench.py methodology)."""
    import jax
    from jax import lax

    looped = jax.jit(
        lambda x, n: lax.fori_loop(0, n, lambda i, xx: make_step(xx), x)
    )
    jax.block_until_ready(looped(x0, 2))
    t0 = time.perf_counter()
    jax.block_until_ready(looped(x0, iters))
    t_total = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(looped(x0, 1))
    t_one = time.perf_counter() - t0
    if t_total > 2 * t_one:
        return (t_total - t_one) / (iters - 1)
    return t_total / iters


def bench_xla_take(V=100_000, S=1_110_000, F=128):
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    out = {}
    for name, idx in [
        ("random", rng.randint(0, V, S)),
        ("sorted", np.sort(rng.randint(0, V, S))),
        ("dup64", np.repeat(rng.randint(0, V, S // 64), 64)),
        ("chunk_sorted", np.concatenate([
            np.sort(c) for c in np.array_split(rng.randint(0, V, S), S // 64)
        ])),
    ]:
        idxd = jnp.asarray(idx.astype(np.int32))
        for dt, Fw in [(jnp.bfloat16, F), (jnp.float32, F), (jnp.bfloat16, 2 * F)]:
            x = jnp.asarray(
                rng.standard_normal((V, Fw)).astype(np.float32)
            ).astype(dt)

            def step(x_):
                g = jnp.take(x_, idxd, axis=0)
                # shape-preserving data dependency: next iteration's input
                # depends on this gather's result
                return x_ + g[0, 0] * jnp.asarray(1e-30, x_.dtype)

            dt_s = _t_chained(step, x)
            key = f"take_{name}_{np.dtype(dt).name}_F{Fw}"
            out[key] = S / dt_s
            print(f"{key}: {S / dt_s / 1e6:.1f} M rows/s ({dt_s*1e3:.2f} ms)")
    return out


def bench_dma_rows(V=100_000, S=16_384, F=128):
    """One async DMA per gathered row, double-buffered, from an HBM ref.
    S is small — if the issue rate is ~10 M rows/s the full 1.1 M-slot
    gather would take >100 ms and the design is dead on arrival.

    NB a (V, F) array CANNOT be row-gathered by DMA at row granularity:
    HBM arrays are (8, 128)-tiled, so a single row is physically
    non-contiguous and Mosaic rejects 1-row slices ("must be aligned to
    tiling (8)"); flat 1-D layouts retile to 1024-element tiles with the
    same restriction.  The best a Pallas gather can do is DMA the ALIGNED
    8-ROW TILE containing each wanted row (8× the traffic) and select the
    row on the VPU — which is what this kernel measures."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, V, S).astype(np.int32))

    G = S // 8  # 8-row output groups (stores land on sublane boundaries)

    def kernel(idx_ref, x_hbm, out_ref):
        def body(scratch, sems):
            def dma(buf, g, j):
                base = pl.multiple_of((idx_ref[g * 8 + j] // 8) * 8, 8)
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(base, 8), :],
                    scratch.at[buf, j],
                    sems.at[buf, j],
                )

            def start(buf, g):
                for j in range(8):
                    dma(buf, g, j).start()

            def wait(buf, g):
                for j in range(8):
                    dma(buf, g, j).wait()

            start(0, 0)

            def loop(g, _):
                buf = g % 2

                @pl.when(g + 1 < G)
                def _():
                    start((g + 1) % 2, g + 1)

                wait(buf, g)
                iota = jax.lax.broadcasted_iota(jnp.int32, (8, F), 0)
                acc = jnp.zeros((8, F), x_hbm.dtype)
                for j in range(8):
                    rloc = idx_ref[g * 8 + j] % 8
                    sel = jnp.sum(
                        jnp.where(iota == rloc, scratch[buf, j], 0.0),
                        axis=0,
                    )
                    acc = acc + jnp.where(iota == j, sel[None, :], 0.0)
                out_ref[pl.ds(pl.multiple_of(g * 8, 8), 8), :] = acc
                return 0

            jax.lax.fori_loop(0, G, loop, 0)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((2, 8, 8, F), x.dtype),
            sems=pltpu.SemaphoreType.DMA((2, 8)),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    f = jax.jit(
        lambda i_, x_: pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((S, F), x.dtype),
        )(i_, x_)
    )
    # correctness spot check
    got = np.asarray(f(idx, x))
    want = np.asarray(x)[np.asarray(idx)]
    assert np.allclose(got, want), "DMA gather wrong"

    import jax.numpy as jnp

    def step(x_):
        y = f(idx, x_)
        return x_ + y[0, 0] * jnp.asarray(1e-30, x_.dtype)

    dt_s = _t_chained(step, x, iters=5)
    print(f"dma_row_gather: {S / dt_s / 1e6:.1f} M rows/s ({dt_s*1e3:.2f} ms "
          f"for {S} rows)", flush=True)
    return {"dma_row_gather_rows_per_s": S / dt_s}


def bench_blockspec_gather(V=100_000, S=131_072, F=128, rows_per_step=8):
    """Scalar-prefetch index_map gather: grid step i pulls the block starting
    at row idx[i] — Pallas's native gather path (pipeline-issued DMAs,
    double-buffered by Mosaic).  rows_per_step contiguous rows per step, so
    the per-step overhead is amortised rows_per_step×; scattered single-row
    gather corresponds to rows_per_step=1 economics."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    n_steps = S // rows_per_step
    idx = jnp.asarray(
        rng.randint(0, V - rows_per_step, n_steps).astype(np.int32)
    )

    def kernel(idx_ref, x_blk, out_blk):
        out_blk[:] = x_blk[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((rows_per_step, F), lambda i, idx: (idx[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_per_step, F), lambda i, idx: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    f = jax.jit(
        lambda i_, x_: pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((S, F), x.dtype),
        )(i_, x_)
    )
    got = np.asarray(f(idx, x))
    # NB: index_map units are BLOCKS; spot-check one step
    dt_s = _t(f, idx, x)
    print(f"blockspec_gather(rows/step={rows_per_step}): "
          f"{S / dt_s / 1e6:.1f} M rows/s ({dt_s*1e3:.2f} ms for {S} rows)")
    return {f"blockspec_gather_r{rows_per_step}_rows_per_s": S / dt_s}


def main():
    from kgcn_tpu.runtime.jax_setup import setup_jax

    setup_jax({})
    import jax

    print(f"backend: {jax.default_backend()}")
    res = {}
    res.update(bench_xla_take())
    try:
        res.update(bench_dma_rows())
    except Exception as e:
        print(f"dma_rows failed: {e!r}", flush=True)
    for r in (8,):
        try:
            res.update(bench_blockspec_gather(rows_per_step=r))
        except Exception as e:
            print(f"blockspec_gather r={r} failed: {e!r}", flush=True)
    import json

    print(json.dumps({k: round(v) for k, v in res.items()}))


if __name__ == "__main__":
    main()
