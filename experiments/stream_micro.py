#!/usr/bin/env python
"""Dispatch-free microbenchmarks for the stream-spmm stages: the XLA
row-take (gather engine), the Pallas macro-scatter, and the fused pipeline —
all inside one fori_loop so tunnel dispatch overhead cancels."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from kgcn_tpu.runtime.jax_setup import setup_jax

setup_jax({})

import jax
import jax.numpy as jnp
from jax import lax

from kgcn_tpu.ops.stream_spmm import build_stream, stream_spmm

LOG = open("/tmp/stream_micro.log", "a")


def log(m):
    print(m, flush=True)
    LOG.write(m + "\n")
    LOG.flush()


def timed_loop(body, init, iters=30):
    """Wall time per iteration of body chained in ONE jitted fori_loop."""
    f = jax.jit(lambda c, n: lax.fori_loop(0, n, lambda i, cc: body(cc),
                                           c))
    jax.block_until_ready(f(init, 2))
    jax.block_until_ready(f(init, 2))
    t0 = time.perf_counter()
    jax.block_until_ready(f(init, iters))
    return (time.perf_counter() - t0) / iters


def main():
    V, E, F = 100_000, 1_000_000, 128
    rng = np.random.RandomState(0)
    s = rng.randint(0, V, E).astype(np.int32)
    r = rng.randint(0, V, E).astype(np.int32)
    w = np.ones(E, np.float32)
    x = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32))
    xb = x.astype(jnp.bfloat16)
    sj = jnp.asarray(s)
    jax.device_get(jnp.zeros(()))

    # 1) take alone, dispatch-free (result folded back into the carry)
    for name, xx in [("f32", x), ("bf16", xb)]:
        def body(c):
            g = jnp.take(c, sj, axis=0)
            return c + g[:V] * jnp.asarray(1e-30, c.dtype)
        dt = timed_loop(body, xx)
        log(f"take[{name}] fori: {E/dt/1e6:.1f} M rows/s ({dt*1e3:.2f} ms)")

    # 2) full stream_spmm chained (out feeds next x) for a few configs
    for kw in [dict(tr_w=128, chunk=128, mc=8, wb=8),
               dict(tr_w=128, chunk=128, mc=16, wb=8),
               dict(tr_w=128, chunk=256, mc=8, wb=8),
               dict(tr_w=128, chunk=128, mc=32, wb=8),
               dict(tr_w=256, chunk=256, mc=8, wb=4)]:
        ss = build_stream(s, r, V, weights=w, **kw)
        pad = ss.meta.slots / E

        def body(c):
            return stream_spmm(ss, x=c)[:V]

        try:
            dt = timed_loop(body, x)
        except Exception as e:
            log(f"stream {kw}: FAIL {str(e)[:200]}")
            continue
        log(f"stream {kw['tr_w']}/{kw['chunk']}/mc{kw['mc']}/wb{kw['wb']}: "
            f"{E/dt/1e6:.1f} M e/s ({dt*1e3:.2f} ms) pad={pad:.2f}")

    # 3) fwd+bwd through the custom VJP (training-step shape)
    ss = build_stream(s, r, V, weights=w, tr_w=128, chunk=128, mc=8, wb=8)
    cot = x

    def step(c):
        val, grad = jax.value_and_grad(
            lambda x_: jnp.vdot(stream_spmm(ss, x=x_), cot)
        )(c)
        return c + grad * jnp.asarray(1e-30, c.dtype)

    dt = timed_loop(step, x, iters=10)
    log(f"stream fwd+bwd(dx,dw): {E/dt/1e6:.1f} M e/s ({dt*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
