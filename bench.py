#!/usr/bin/env python
"""Benchmark: SpMM aggregation throughput + end-to-end GCN training throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Headline metric (BASELINE.json): SpMM edges/s/chip on a molecular-scale
block-diagonal batch.  ``vs_baseline`` is the speedup of the best execution
path over the naive XLA gather/segment-sum path — the reference framework's
own fallback strategy (kgcn/layers.py:113 per-graph sparse matmuls is far
slower still; its custom bspmm ops are not runnable here).
"""
from __future__ import annotations

import json
import time

import numpy as np


def _timeit(fn, *args, iters=30, warmup=5):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_spmm(B=256, N=128, F=128, avg_degree=8, seed=0):
    import jax
    import jax.numpy as jnp

    from kgcn_tpu.data import Batcher, build_dataset
    from kgcn_tpu.data.synthetic import make_random_graphs
    from kgcn_tpu.ops.spmm import spmm, spmm_dense

    data = make_random_graphs(B, N, F, avg_degree=avg_degree, seed=seed)
    ds, info = build_dataset(data, {})
    b = Batcher(ds, info, B, seed=seed)
    batch = b.make_batch(np.arange(B))
    g = batch.graph
    V = g.total_nodes
    x = jnp.asarray(
        np.random.RandomState(1).standard_normal((V, F)).astype(np.float32)
    )
    n_edges = int(np.asarray(g.n_edge)[0])

    xla_fn = jax.jit(
        lambda s, r, w, x: spmm(s, r, w, x, V, backend="xla")
    )
    t_xla = _timeit(xla_fn, g.senders[0], g.receivers[0], g.edge_weights[0], x)

    adj = jax.jit(lambda gb: gb.dense_adjacency())(g)
    xb = x.reshape(g.n_graph, g.max_nodes, F)
    dense_fn = jax.jit(lambda a, xx: spmm_dense(a, xx))
    t_dense = _timeit(dense_fn, adj, xb)

    results = {
        "edges": n_edges,
        "xla_segment_sum_s": t_xla,
        "dense_mxu_s": t_dense,
        "xla_edges_per_s": n_edges / t_xla,
        "dense_edges_per_s": n_edges / t_dense,
    }
    try:
        from kgcn_tpu.ops.pallas_spmm import spmm_pallas  # optional

        pl_fn = jax.jit(
            lambda s, r, w, x: spmm_pallas(s, r, w, x, V)
        )
        t_pl = _timeit(pl_fn, g.senders[0], g.receivers[0], g.edge_weights[0], x)
        results["pallas_s"] = t_pl
        results["pallas_edges_per_s"] = n_edges / t_pl
    except Exception:
        pass
    return results


def bench_train(B=256, N=64, F=32, epochs_iters=20, seed=0):
    import jax

    from kgcn_tpu.data import Batcher, build_dataset
    from kgcn_tpu.data.synthetic import make_random_graphs
    from kgcn_tpu.models.registry import build_model
    from kgcn_tpu.runtime.config import default_config
    from kgcn_tpu.runtime.train import Trainer

    cfg = default_config()
    cfg.update({"task": "classification", "learning_rate": 1e-3})
    data = make_random_graphs(B, N, F, avg_degree=6, seed=seed)
    ds, info = build_dataset(data, cfg)
    b = Batcher(ds, info, B, seed=seed)
    batch = b.make_batch(np.arange(B))
    model = build_model("gcn", info, cfg)
    trainer = Trainer(model, cfg, info)
    state = trainer.init_state(batch, seed=0)

    # non-donating step for repeat timing
    step = trainer.train_step
    state, *_ = step(state, batch)  # compile + warmup

    t0 = time.perf_counter()
    for _ in range(epochs_iters):
        state, cost, _ = step(state, batch)
    jax.block_until_ready(cost)
    dt = (time.perf_counter() - t0) / epochs_iters
    return {"train_step_s": dt, "graphs_per_s": B / dt}


def main():
    spmm_res = bench_spmm()
    train_res = bench_train()
    best_edges = max(
        spmm_res["dense_edges_per_s"],
        spmm_res["xla_edges_per_s"],
        spmm_res.get("pallas_edges_per_s", 0.0),
    )
    vs_baseline = best_edges / spmm_res["xla_edges_per_s"]
    print(
        json.dumps(
            {
                "metric": "spmm_edges_per_s_chip",
                "value": best_edges,
                "unit": "edges/s",
                "vs_baseline": vs_baseline,
                "extra": {**spmm_res, **train_res},
            }
        )
    )


if __name__ == "__main__":
    main()
