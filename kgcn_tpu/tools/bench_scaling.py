"""Scaling-efficiency benchmark harness (BASELINE.json: ≥80% edges/s scaling
1 chip → 1 host → N hosts).

Measures edge-partitioned SpMM throughput at mesh sizes 1, 2, 4, ... over the
available devices and reports efficiency vs linear scaling.  On this
environment only one real TPU chip is attached, so multi-device numbers come
from the virtual CPU mesh (functional validation + schedule sanity); run the
same harness unchanged on a pod slice for real numbers.

Usage: python -m kgcn_tpu.tools.bench_scaling [--nodes N] [--edges E]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


# readback sync — canonical impl (and the methodology rationale) lives in
# kgcn_tpu/runtime/timing.py
from kgcn_tpu.runtime.timing import force as _sync  # noqa: E402


def bench_one(D: int, V: int, E: int, F: int, strategy: str, iters: int = 20):
    import jax
    import jax.numpy as jnp

    from kgcn_tpu.parallel.edge_partition import (
        partition_edges,
        spmm_edge_partitioned,
    )
    from kgcn_tpu.parallel.mesh import make_mesh

    V = ((V + D - 1) // D) * D  # partition_edges needs V % D == 0
    rng = np.random.RandomState(0)
    s = rng.randint(0, V, E).astype(np.int32)
    r = rng.randint(0, V, E).astype(np.int32)
    w = rng.random_sample(E).astype(np.float32) + 0.1
    x = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32))

    mesh = make_mesh({"data": D})
    part = partition_edges(s, r, w, V, D)

    run = lambda xx: spmm_edge_partitioned(part, xx, mesh, strategy=strategy)
    out = run(x)
    _sync(out)
    t0 = time.perf_counter()
    cur = x
    for _ in range(iters):
        cur = run(cur)
    _sync(cur)
    dt = (time.perf_counter() - t0) / iters
    return E / dt


def bench_kg_step(D: int, V: int, E: int, dim: int, strategy: str,
                  encoder: str = "gcn", iters: int = 10):
    """Full sharded KG TRAIN step (parallel/big_graph.py): embedding gather,
    ring/allgather conv, DistMult scoring, backward, Adam — triples/s."""
    import jax

    from kgcn_tpu.models.kg import sample_negatives
    from kgcn_tpu.parallel.big_graph import BigGraphKGTrainer
    from kgcn_tpu.parallel.mesh import make_mesh

    rng = np.random.RandomState(0)
    V = ((V + D - 1) // D) * D
    s = rng.randint(0, V, E).astype(np.int32)
    r = rng.randint(0, V, E).astype(np.int32)
    w = np.ones(E, np.float32)
    ll = np.stack([s, np.zeros(E, np.int32), r] * 2, axis=1)
    ll = sample_negatives(ll, np.arange(V, dtype=np.int32), rng)

    mesh = make_mesh({"data": D})
    bg = BigGraphKGTrainer(
        num_nodes=V, channels=1, embedding_dim=dim, mesh=mesh,
        encoder=encoder, strategy=strategy,
    )
    bg.partition_graph(s, r, w)
    state = bg.init_state(seed=0)
    # device-resident measurement: shard the triple list ONCE and drive the
    # compiled step directly — no per-step host→device payload or readback
    # (the production fit() path resamples negatives on host per epoch; this
    # isolates the device step itself)
    import jax.numpy as jnp

    ll_dev, lv_dev, n = bg._shard_labels(ll)
    step = bg._build_step()
    inv_n = jnp.float32(1.0 / max(n, 1))
    # warm TWO calls: a state-leaf aval mismatch would compile a second
    # executable on call 1 and silently pollute the timed region (the
    # remote-compile tunnel here costs 10s+ per compilation)
    for _ in range(2):
        state, _ = step(state, ll_dev, lv_dev, inv_n)
    _sync(state["params"]["embed"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _ = step(state, ll_dev, lv_dev, inv_n)
    _sync(state["params"]["embed"])
    dt = (time.perf_counter() - t0) / iters
    return len(ll) / dt


def bench_dp_gnn(D: int, model_name: str, per_device_batch: int = 32,
                 num_nodes: int = 64, features: int = 32, iters: int = 10):
    """Full data-parallel GNN TRAIN step (parallel/dp.py) at mesh size D —
    the BASELINE.json scaling target workload (GIN / sparse-GCN edges/s).

    Global batch grows with D (weak scaling, the production regime); the
    reported edges/s counts every adjacency edge aggregated per step."""
    import jax

    from kgcn_tpu.data import Batcher, build_dataset
    from kgcn_tpu.data.synthetic import make_random_graphs
    from kgcn_tpu.models.registry import build_model
    from kgcn_tpu.parallel.dp import DPTrainer, ShardedBatcher
    from kgcn_tpu.parallel.mesh import make_mesh
    from kgcn_tpu.runtime.config import default_config

    cfg = default_config()
    cfg.update({"task": "classification", "learning_rate": 1e-3})
    B = per_device_batch * D
    data = make_random_graphs(B, num_nodes, features, avg_degree=8, seed=0)
    ds, info = build_dataset(data, cfg)
    mesh = make_mesh({"data": D})
    model = build_model(model_name, info, cfg)
    trainer = DPTrainer(model, cfg, info, mesh=mesh)
    sb = ShardedBatcher(Batcher(ds, info, per_device_batch, seed=0), D)
    batch = sb.make_batch(np.arange(B))
    n_edges = int(np.sum(np.asarray(batch.graph.edge_weights) != 0))
    state = trainer.init_state(batch, seed=0)
    for _ in range(2):  # compile + settle
        state, cost, _ = trainer.train_step(state, batch)
    _sync(cost)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, cost, _ = trainer.train_step(state, batch)
    _sync(cost)
    dt = (time.perf_counter() - t0) / iters
    return n_edges / dt


def analytic_model(D: int, workload: str, *, V: int = 1 << 17,
                   E: int = 1 << 20, F: int = 128,
                   params: int = 60_000, boundary_frac: float = 1.0,
                   t_step_chip: float = 290e-6,
                   edges_per_s_chip: float = 1.29e8,
                   ici_bw: float = 4.5e10) -> dict:
    """Analytic ICI scaling model for the BASELINE workloads on a v5e mesh
    axis, anchored on MEASURED single-chip step times (MEASURED.md) instead
    of idealised FLOP counts — dispatch/fusion overheads are real and they
    *help* scaling efficiency (comms is hidden behind them).

    Per-device step time = max(compute, comms), assuming the implemented
    overlap (DP gradient all-reduce overlaps the backward; the
    edge-partitioned ring overlaps each ppermute hop with the local
    offset-group aggregation — parallel/edge_partition.py:94-113).
    ``ici_bw`` = 45 GB/s per direction (one v5e ICI link; a torus axis has
    two links, so this is conservative).

    * dp (weak scaling): per-device compute CONSTANT at the measured
      single-chip step time; comms = ring all-reduce of the gradients,
      2·params·4·(D-1)/D bytes per device.
    * edge_partition: compute = (E/D) edges at the measured single-chip
      aggregation rate; comms = (D-1) ring hops of the **boundary** rows of
      the [V/D, F] block.  ``boundary_frac`` is the fraction of a block's
      rows any other block needs: 1.0 for an unpartitionable uniform-random
      graph (worst case), ~0.1-0.3 for locality-ordered real graphs
      (molecular block-diagonal batches are ~0 — they shard as DP).
    """
    if workload.startswith("dp"):
        t_comp = t_step_chip
        t_comm = 2 * params * 4 * (D - 1) / D / ici_bw
    else:
        t_comp = (E / D) / edges_per_s_chip
        t_comm = (D - 1) * (V / D) * boundary_frac * F * 4 / ici_bw
    t_step = max(t_comp, t_comm)  # overlapped
    eff = t_comp / t_step
    return {
        "D": D,
        "t_compute_us": t_comp * 1e6,
        "t_comms_us": t_comm * 1e6,
        "efficiency_overlapped": eff,
        "efficiency_serial": t_comp / (t_comp + t_comm),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=1 << 14)
    p.add_argument("--edges", type=int, default=1 << 18)
    p.add_argument("--features", type=int, default=64)
    p.add_argument("--strategy", default="ring", choices=["ring", "allgather"])
    p.add_argument("--workload", default="spmm",
                   choices=["spmm", "kg_step", "dp_gin", "dp_gcn"],
                   help="spmm: raw edge-partitioned aggregation; "
                        "kg_step: full sharded KG train step (big_graph); "
                        "dp_gin/dp_gcn: data-parallel GNN train step "
                        "(weak scaling, edges/s — the BASELINE target)")
    p.add_argument("--batch", type=int, default=32,
                   help="per-device batch for dp_* workloads")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--model", action="store_true",
                   help="print the analytic ICI scaling model instead of "
                        "measuring (for environments without a pod slice)")
    args = p.parse_args(argv)
    if args.model:
        kind = "dp" if args.workload.startswith("dp") else "edge_partition"
        out = {}
        betas = (None,) if kind == "dp" else (1.0, 0.3, 0.1)
        for beta in betas:
            kw = {} if beta is None else {"boundary_frac": beta}
            rows = [analytic_model(D, kind, F=args.features,
                                   V=args.nodes, E=args.edges, **kw)
                    for D in (1, 2, 4, 8, 16, 32)]
            tag = "dp" if beta is None else f"boundary_frac={beta}"
            print(f"-- {args.workload} ({tag}) --")
            for r in rows:
                print(f"D={r['D']}: compute {r['t_compute_us']:.1f} us, "
                      f"comms {r['t_comms_us']:.1f} us, "
                      f"efficiency {r['efficiency_overlapped']*100:.0f}% "
                      f"(serial {r['efficiency_serial']*100:.0f}%)")
            out[tag] = rows
        print(json.dumps({"workload": args.workload, "model": out}))
        return
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    n_dev = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    results = {}
    base = None
    unit = "triples_per_s" if args.workload == "kg_step" else "edges_per_s"
    for D in sizes:
        if args.workload == "spmm":
            eps = bench_one(
                D, args.nodes, args.edges, args.features, args.strategy
            )
        elif args.workload == "kg_step":
            eps = bench_kg_step(
                D, args.nodes, args.edges, args.features, args.strategy
            )
        else:  # dp_gin / dp_gcn: weak scaling — per-device work constant
            eps = bench_dp_gnn(
                D, args.workload.removeprefix("dp_"),
                per_device_batch=args.batch, features=args.features,
            )
        if base is None:
            base = eps
        results[D] = {
            unit: eps,
            "efficiency": eps / (base * D),
        }
        print(
            f"D={D}: {eps / 1e6:.2f} M {unit.split('_')[0]}/s, "
            f"scaling efficiency {eps / (base * D) * 100:.0f}%"
        )
    print(json.dumps(
        {"workload": args.workload, "strategy": args.strategy,
         "results": results}
    ))


if __name__ == "__main__":
    main()
