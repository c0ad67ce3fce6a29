"""Honest device timing on tunnel-attached backends (readback-slope).

Round-5 discovery: on the axon tunnel backend ``jax.block_until_ready``
resolves WITHOUT waiting for remote execution — loop timings were flat in
the iteration count until a readback was added.  A device→host fetch of
one element is the only reliable sync (the transfer cannot complete before
the producing computation has run).

Per-iteration cost is the two-point SLOPE between a short and a long run:
the slope cancels every fixed cost — dispatch, RPC, lazy-execution
trigger, and the readback itself — which through the tunnel attach are
~30 ms with ±2-3 ms jitter.  The long run is GROWN (doubling) until its
added compute clearly dominates that jitter; otherwise the slope is noise
(observed: impossible multi-hundred-TF/s readings when
t_long − t_short ≈ 2 ms).  Run lengths are perturbed per trial so the
remote runtime cannot serve a cached result for a repeated identical call
(observed: 0.17 → 0.06 ms across identical dispatches).

This is the ONE implementation; ``bench.py``, ``experiments/_timing.py``
and ``kgcn_tpu/tools/bench_scaling.py`` all import from here.
"""
from __future__ import annotations

import time

import numpy as np


def force(x) -> None:
    """Force real completion of x's computation via a tiny readback."""
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    if getattr(leaf, "ndim", 0):
        leaf = leaf[(0,) * leaf.ndim]
    np.asarray(leaf)


def slope_time(looped, args, iters, *, n1=None, trials=3):
    """Per-iteration seconds of ``looped(*args, n)`` (readback-slope).

    ``args`` is a tuple of loop-invariant inputs; the iteration count n
    rides last.  Median of ``trials`` slopes, each between a short run and
    a long run grown until its added compute ≥ max(50 ms, the whole fixed
    base cost).
    """
    n1 = n1 if n1 is not None else max(iters // 4, 1)
    force(looped(*args, n1))  # compile + warm
    t0 = time.perf_counter()
    force(looped(*args, n1 + 1))
    base = time.perf_counter() - t0
    n2 = max(iters, 2 * n1)
    for _ in range(14):
        t0 = time.perf_counter()
        force(looped(*args, n2))
        t_long = time.perf_counter() - t0
        # stop once the extra iterations cost >= max(50 ms, the whole
        # fixed base) — the slope is then signal, not jitter
        if t_long - base >= max(0.05, base):
            break
        n2 *= 2
    vals = []
    for k in range(trials):
        a, b = n1 + 1 + k, n2 + 1 + k
        t0 = time.perf_counter()
        force(looped(*args, a))
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        force(looped(*args, b))
        t_long = time.perf_counter() - t0
        vals.append((t_long - t_short) / (b - a))
    return max(float(np.median(vals)), 1e-12)


def chain_time(fn, x0, iters=1000):
    """Per-op seconds: iterate fn inside ONE jitted fori_loop, timed by
    the readback-slope methodology (see slope_time)."""
    import jax
    from jax import lax

    looped = jax.jit(
        lambda x, n: lax.fori_loop(0, n, lambda i, xx: fn(xx), x)
    )
    return slope_time(looped, (x0,), iters)
