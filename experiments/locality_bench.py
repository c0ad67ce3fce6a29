"""On-chip: tiled kernel on a power-law graph, locality relabel on vs off.

The uniform-random numbers in docs/performance.md are the adversarial
floor; real KGs are power-law.  This measures what
``build_tiled(locality=True)`` (round 4 integration) buys on a Zipf-ish
graph at KG scale, plus the stream kernel on the same graph for reference.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def powerlaw_graph(V, E, alpha=1.1, seed=0):
    """Zipf-weighted endpoints over a SHUFFLED id space (hub ids scattered,
    as in real KGs)."""
    rng = np.random.RandomState(seed)
    w = 1.0 / np.arange(1, V + 1) ** alpha
    w /= w.sum()
    ids = rng.permutation(V)
    s = ids[rng.choice(V, E, p=w)]
    r = ids[rng.choice(V, E, p=w)]
    return s.astype(np.int64), r.astype(np.int64)


def main():
    from kgcn_tpu.runtime.jax_setup import setup_jax

    setup_jax({})
    import jax
    import jax.numpy as jnp
    from jax import lax

    from kgcn_tpu.ops.tiled_spmm import build_tiled, choose_tiling, tiled_spmm

    from kgcn_tpu.ops.tiled_spmm import locality_order

    alpha = float(os.environ.get("LOC_ALPHA", "1.1"))
    V, E, F = 100_000, 1_000_000, 128
    s, r = powerlaw_graph(V, E, alpha=alpha)
    w = np.ones(E, np.float32)
    x = jnp.asarray(np.random.RandomState(1)
                    .standard_normal((V, F)).astype(np.float32))
    out = {"alpha": alpha}
    for loc in (False, True):
        # pick the tiling for the graph AS THE KERNEL WILL SEE IT
        # (relabeled when locality is on)
        if loc:
            perm = locality_order(s, r, V)
            inv = np.empty_like(perm)
            inv[perm] = np.arange(V)
            s_c, r_c = inv[s], inv[r]
        else:
            s_c, r_c = s, r
        ts, tr, chunk = choose_tiling(s_c, r_c, V, F, weights=w)
        te = build_tiled(s, r, V, weights=w, ts=ts, tr=tr, chunk=chunk,
                         locality=loc)
        out[f"n_chunks_loc{int(loc)}"] = te.meta.n_chunks
        wd = jnp.asarray(w)
        f = jax.jit(lambda x_: tiled_spmm(te, wd, x_))
        looped = jax.jit(
            lambda x_, n: lax.fori_loop(
                0, n, lambda i, xx: xx + f(xx)[: xx.shape[0]] * 1e-30, x_
            )
        )
        from experiments._timing import slope_time

        dt = slope_time(looped, (x,), 20)
        out[f"tiled_powerlaw_loc{int(loc)}_edges_per_s"] = E / dt
        print(f"locality={loc}: tiling=({ts},{tr},{chunk}) "
              f"chunks={te.meta.n_chunks} -> {E/dt/1e6:.1f} M edges/s "
              f"({dt*1e3:.2f} ms)", flush=True)
    out["locality_speedup"] = (
        out["tiled_powerlaw_loc1_edges_per_s"]
        / out["tiled_powerlaw_loc0_edges_per_s"]
    )
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
