"""Shared honest timing for on-chip experiments.

Round-5 discovery (see bench.py `_force`/`_slope_time`): on the axon
tunnel backend ``jax.block_until_ready`` resolves WITHOUT waiting for
remote execution, so loop timings were flat in the iteration count.  The
reliable sync is a one-element device→host readback, and the per-iteration
cost is the two-point SLOPE between a short and a long run (cancels the
~30 ms fixed dispatch/RPC/readback cost), with the long run grown until
its added compute dominates the ±2-3 ms jitter.
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

    ``args`` is a tuple of loop-invariant inputs; n rides last.  Lengths
    are perturbed per trial so a result cache cannot serve repeats.
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
