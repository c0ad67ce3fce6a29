"""Executable multi-process scenarios for the distributed runtime.

Run under the launcher (tests/test_multiprocess.py drives these, or by
hand):

    kgcn-tpu-launch --nprocs 2 --platform cpu --devices-per-process 2 -- \
        python -m kgcn_tpu.parallel._mp_worker dp_parity /tmp/out

Each scenario exercises one leg of the multi-controller story across REAL
OS processes (SURVEY §2.11 "jax.distributed multi-host runtime"; the
shell-parallel workload this replaces is the reference's
script_cv/02run_fold.sh):

* ``collectives``  — mesh bring-up + cross-process psum sanity.
* ``dp_parity``    — data-parallel training on the global mesh; process 0
  writes the final params so the test can compare against an identical
  single-process run (same global devices, same epoch-keyed data order).
* ``ingest``       — per-process sharded ingest: each process loads ONLY
  its ``process_index_range`` slice, one epoch consumes every global
  example exactly once.
* ``ckpt``         — checkpoint save (process-0 write + barrier), restore
  on every process, and continue-training parity vs the un-restored state.
* ``cv``           — fold-parallel CV over the multi-process mesh.

Success prints one ``[MPOK] <scenario> p<pid> {json}`` line per process.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np


def _bringup():
    from kgcn_tpu.parallel.launch import initialize_from_env

    initialize_from_env()
    import jax

    # match tests/conftest.py so parity comparisons are apples-to-apples
    jax.config.update("jax_default_matmul_precision", "highest")
    cache = os.environ.get(
        "KGCN_TEST_COMPILE_CACHE",
        os.path.expanduser("~/.cache/kgcn_tpu/xla-tests"),
    )
    if cache:
        try:
            from kgcn_tpu.runtime.jax_setup import cpu_fingerprint

            cache = os.path.join(cache, cpu_fingerprint())
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.2)
        except Exception:
            pass
    return jax


def _cfg(tmp: str) -> dict:
    from kgcn_tpu.runtime.config import default_config

    cfg = default_config()
    cfg.update({
        "epoch": 3, "batch_size": 5, "learning_rate": 0.01,
        "shuffle_data": True, "patience": 0, "save_interval": 0,
        "normalize_adj_flag": True, "task": "classification",
        "save_model_path": tmp, "model.py": "gin", "seed": 0,
    })
    return cfg


def _build(cfg, num_pairs=20):
    from kgcn_tpu.data import build_dataset
    from kgcn_tpu.data.synthetic import make_ring_dataset

    return build_dataset(make_ring_dataset(num_pairs=num_pairs, seed=0), cfg)


def _param_vec(jax, params) -> np.ndarray:
    from kgcn_tpu.parallel.mesh import host_view

    leaves = jax.tree_util.tree_leaves(host_view(params))
    return np.concatenate([np.asarray(x).ravel() for x in leaves])


def _ok(scenario: str, pid: int, payload: dict) -> None:
    print(f"[MPOK] {scenario} p{pid} {json.dumps(payload, sort_keys=True)}",
          flush=True)


def scenario_collectives(jax, tmp: str) -> None:
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from kgcn_tpu.parallel.mesh import barrier, make_mesh

    nproc, pid = jax.process_count(), jax.process_index()
    assert nproc > 1, "launcher did not form a multi-process job"
    mesh = make_mesh({"data": -1})
    D = mesh.shape["data"]
    local = np.full((len(jax.local_devices()), 4), pid + 1, np.float32)
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local, (D, 4))
    total = jax.jit(
        lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P())
    )(garr)
    got = float(np.asarray(total.addressable_shards[0].data))
    per = D // nproc
    want = 4.0 * per * sum(range(1, nproc + 1))
    assert got == want, (got, want)
    barrier("collectives-done")
    _ok("collectives", pid, {"devices": D, "sum": got})


def scenario_dp_parity(jax, tmp: str) -> None:
    from kgcn_tpu.data import Batcher
    from kgcn_tpu.models.registry import build_model
    from kgcn_tpu.parallel.dp import DPTrainer, GlobalShardedBatcher
    from kgcn_tpu.parallel.mesh import barrier, make_mesh

    cfg = _cfg(tmp)
    ds, info = _build(cfg)
    mesh = make_mesh({"data": -1})
    model = build_model("gin", info, cfg)
    trainer = DPTrainer(model, cfg, info, mesh=mesh)
    gb = GlobalShardedBatcher(
        Batcher(ds, info, cfg["batch_size"], seed=0), mesh)
    state = trainer.init_state(gb.host_sample(), seed=0)
    costs = []
    for ep in range(cfg["epoch"]):
        state, cost, _, n = trainer.run_epoch(
            state, gb, shuffle=True, epoch=ep)
        costs.append(float(cost))
    ev = trainer.evaluate(state, gb)
    vec = _param_vec(jax, state.params)
    if jax.process_index() == 0:
        np.save(os.path.join(tmp, "params_mp.npy"), vec)
        np.save(os.path.join(tmp, "costs_mp.npy"), np.asarray(costs))
    barrier("dp-parity-done")
    _ok("dp_parity", jax.process_index(),
        {"costs": costs, "n": n, "eval_num": int(ev["num"]),
         "eval_cost": float(ev["cost"])})


def scenario_ingest(jax, tmp: str) -> None:
    from kgcn_tpu.data import Batcher
    from kgcn_tpu.data.dataset import shard_for_host
    from kgcn_tpu.models.registry import build_model
    from kgcn_tpu.parallel.dp import DPTrainer, GlobalShardedBatcher
    from kgcn_tpu.parallel.mesh import host_view, make_mesh

    nproc, pid = jax.process_count(), jax.process_index()
    cfg = _cfg(tmp)
    full, info = _build(cfg, num_pairs=23)  # 46 examples, uneven over procs
    local = shard_for_host(full, pid, nproc)
    # per-host ingest: this process never materialises another host's rows
    mesh = make_mesh({"data": -1})
    gb = GlobalShardedBatcher(
        Batcher(local, info, cfg["batch_size"], seed=pid), mesh,
        mode="shard", global_num=full.num)
    # host-local permutation covers the local shard exactly once
    idx = gb.b.epoch_indices(shuffle=True, epoch=0)
    assert sorted(idx.tolist()) == list(range(local.num))
    seen = 0
    steps = 0
    for batch in gb.batches(shuffle=True, epoch=0):
        seen += float(np.sum(host_view(batch.pad_mask)))
        steps += 1
    assert int(seen) == full.num, (seen, full.num)
    # and the sharded stream actually trains
    model = build_model("gin", info, cfg)
    trainer = DPTrainer(model, cfg, info, mesh=mesh)
    state = trainer.init_state(gb.host_sample(), seed=0)
    state, cost, _, n = trainer.run_epoch(state, gb, shuffle=True, epoch=0)
    assert np.isfinite(cost)
    _ok("ingest", pid, {"local_num": local.num, "global_seen": int(seen),
                        "steps": steps, "epoch_cost": float(cost),
                        "n": int(n)})


def scenario_ckpt(jax, tmp: str) -> None:
    import kgcn_tpu.runtime.checkpoint as ckpt
    from kgcn_tpu.data import Batcher
    from kgcn_tpu.models.registry import build_model
    from kgcn_tpu.parallel.dp import DPTrainer, GlobalShardedBatcher
    from kgcn_tpu.parallel.mesh import barrier, make_mesh

    pid = jax.process_index()
    cfg = _cfg(tmp)
    ds, info = _build(cfg)
    mesh = make_mesh({"data": -1})
    model = build_model("gin", info, cfg)
    trainer = DPTrainer(model, cfg, info, mesh=mesh)
    gb = GlobalShardedBatcher(
        Batcher(ds, info, cfg["batch_size"], seed=0), mesh)
    state = trainer.init_state(gb.host_sample(), seed=0)
    for ep in range(2):
        state, _, _, _ = trainer.run_epoch(state, gb, shuffle=True, epoch=ep)
    path = ckpt.ckpt_name(tmp, "mp")
    # process 0 writes, everyone barriers inside save_checkpoint, then every
    # process restores the same file — the distributed resume contract
    ckpt.save_checkpoint(path, trainer.state_tree(state, 2, np.inf))
    state, cont_cost, _, _ = trainer.run_epoch(
        state, gb, shuffle=True, epoch=2)

    fresh = trainer.init_state(gb.host_sample(), seed=123)
    fresh = trainer.restore(fresh, path)
    fresh, resumed_cost, _, _ = trainer.run_epoch(
        fresh, gb, shuffle=True, epoch=2)
    assert np.isclose(cont_cost, resumed_cost, rtol=1e-5), (
        cont_cost, resumed_cost)
    # every process must agree on the resumed trajectory
    from jax.experimental import multihost_utils

    all_costs = np.asarray(multihost_utils.process_allgather(
        np.float32(resumed_cost)))
    assert np.allclose(all_costs, all_costs[0]), all_costs
    barrier("ckpt-done")
    _ok("ckpt", pid, {"continued": float(cont_cost),
                      "resumed": float(resumed_cost)})


def scenario_cv(jax, tmp: str) -> None:
    from kgcn_tpu.data import build_dataset
    from kgcn_tpu.data.dataset import kfold_indices
    from kgcn_tpu.data.synthetic import make_ring_dataset
    from kgcn_tpu.parallel.cv import FoldParallelCV
    from kgcn_tpu.parallel.mesh import barrier

    pid = jax.process_index()
    cfg = _cfg(tmp)
    cfg.update({"epoch": 3, "fold_parallel": "force"})
    ds, info = build_dataset(make_ring_dataset(num_pairs=20, seed=0), cfg)
    folds = kfold_indices(ds.num, len(jax.devices()), seed=0)
    cv = FoldParallelCV(cfg, info, ds, folds)
    results = cv.run(log=(print if pid == 0 else (lambda s: None)))
    assert all(r is not None for r in results)
    costs = [r[2]["history"][-1]["training_cost"] for r in results]
    assert all(np.isfinite(c) for c in costs), costs
    barrier("cv-done")

    # fewer folds than global devices: the fold axis must shrink to a
    # process multiple built from each process's OWN local devices (a mesh
    # sliced from the global, process-0-first device list would leave
    # process 1 contributing rows it owns no devices for)
    k_small = max(jax.process_count() + 1, 3)
    folds_s = kfold_indices(ds.num, k_small, seed=1)
    cv_s = FoldParallelCV(cfg, info, ds, folds_s)
    assert cv_s.D < len(jax.devices()), (cv_s.D, len(jax.devices()))
    results_s = cv_s.run(log=lambda s: None)
    assert all(r is not None for r in results_s)
    costs_s = [r[2]["history"][-1]["training_cost"] for r in results_s]
    assert all(np.isfinite(c) for c in costs_s), costs_s
    barrier("cv-small-done")
    _ok("cv", pid, {"folds": len(results),
                    "final_costs": [round(c, 6) for c in costs],
                    "folds_small": len(results_s),
                    "small_costs": [round(c, 6) for c in costs_s]})


SCENARIOS = {
    "collectives": scenario_collectives,
    "dp_parity": scenario_dp_parity,
    "ingest": scenario_ingest,
    "ckpt": scenario_ckpt,
    "cv": scenario_cv,
}


def scenario_all(jax, tmp: str) -> None:
    """Every scenario in one process pair: JAX import, gloo bring-up and
    the distributed coordination service are paid ONCE instead of once per
    scenario (the test suite's multi-process wall-time is dominated by that
    bring-up, not by the scenarios themselves)."""
    for name in ("collectives", "dp_parity", "ingest", "ckpt", "cv"):
        SCENARIOS[name](jax, tmp)


SCENARIOS["all"] = scenario_all


def main() -> int:
    scenario, tmp = sys.argv[1], sys.argv[2]
    jax = _bringup()
    SCENARIOS[scenario](jax, tmp)
    return 0


if __name__ == "__main__":
    sys.exit(main())
