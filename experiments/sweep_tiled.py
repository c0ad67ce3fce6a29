#!/usr/bin/env python
"""On-chip sweep of tiled SpMM configs on the scattered uniform regime
(V=100k, E=1M, F=128) — the BASELINE worst case.  Run on the real TPU:

    python experiments/sweep_tiled.py [--configs ...]

Prints one line per config: edges/s + a breakdown estimate.
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from kgcn_tpu.runtime.jax_setup import setup_jax
setup_jax({})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--V", type=int, default=100_000)
    ap.add_argument("--E", type=int, default=1_000_000)
    ap.add_argument("--F", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--configs", nargs="*", default=None,
                    help="ts,tr,chunk triples like 1024,1024,128")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from kgcn_tpu.ops.tiled_spmm import build_tiled, tiled_spmm

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)
    s = rng.randint(0, args.V, args.E)
    r = rng.randint(0, args.V, args.E)
    x = jnp.asarray(rng.standard_normal((args.V, args.F)).astype(np.float32))
    w = jnp.ones((args.E,), jnp.float32)
    jax.device_get(jnp.zeros(()))  # warm tunnel

    configs = []
    for cfg in args.configs or [
        "1024,1024,128", "2048,2048,256", "1024,2048,128", "2048,1024,128",
        "512,1024,64", "1024,1024,256", "1024,4096,128",
    ]:
        configs.append(tuple(int(v) for v in cfg.split(",")))

    cdt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    for ts, tr, chunk in configs:
        t_build0 = time.perf_counter()
        te = build_tiled(s, r, args.V, ts=ts, tr=tr, chunk=chunk,
                         with_transpose=False)
        t_build = time.perf_counter() - t_build0
        m = te.meta
        slots = m.n_chunks * m.chunk
        f = jax.jit(lambda x_: tiled_spmm_fwd_only(te, w, x_, cdt))
        looped = jax.jit(
            lambda x_, n: lax.fori_loop(0, n, lambda i, xx: f(xx), x_)
        )
        from experiments._timing import force, slope_time

        t0 = time.perf_counter()
        try:
            force(looped(x, 2))
        except Exception as e:
            print(f"ts={ts} tr={tr} chunk={chunk}: FAIL {str(e)[:120]}")
            continue
        t_compile = time.perf_counter() - t0
        dt = slope_time(looped, (x,), args.iters)
        print(
            f"ts={ts} tr={tr} chunk={chunk}: {args.E/dt/1e6:.1f} M e/s "
            f"({dt*1e3:.2f} ms)  slots={slots/1e6:.2f}M "
            f"n_chunks={m.n_chunks} pad={slots/args.E:.2f}x "
            f"build={t_build:.2f}s compile={t_compile:.1f}s",
            flush=True,
        )


def tiled_spmm_fwd_only(te, weights, x, cdt):
    """Forward-only path (no transpose needed)."""
    import jax.numpy as jnp

    from kgcn_tpu.ops import tiled_spmm as T

    w_ext = jnp.concatenate(
        [weights.astype(jnp.float32), jnp.zeros((1,), jnp.float32)]
    )
    w_chunks = w_ext[te.slot_src]
    return T._spmm_pallas_call(
        te.meta, te.s_loc, te.r_loc, te.chunk_rt, te.chunk_st,
        te.chunk_first, w_chunks, x, cdt,
    )


if __name__ == "__main__":
    main()
