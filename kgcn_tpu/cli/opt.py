"""``kgcn-tpu-opt`` — hyper-parameter optimisation driver.

Reference: ``kgcn-opt`` (opt_hyperparam.py): per trial, write the param JSON
into the config as ``info.param`` and run training in-process (the reference
shelled out a ``kgcn`` subprocess, :117-121), minimising ``validation_cost``;
saves the best param/config pair at the end (:168-199).
"""
from __future__ import annotations

import argparse
import copy
import json
import os

import numpy as np


def run_trial(base_config, params) -> float:
    """One training run; returns validation cost (the HPO objective)."""
    from kgcn_tpu.cli.main import cmd_train

    config = copy.deepcopy(base_config)
    config["param"] = dict(params)
    # common tunables map straight onto config keys
    for key in ("learning_rate", "batch_size", "dropout_rate", "epoch"):
        if key in params:
            config[key] = params[key]
    config["make_plot"] = False
    for k in list(config):
        if k.startswith("save_result") or k.startswith("save_info"):
            config[k] = None
    try:
        result = cmd_train(config)
    except Exception as e:
        # a diverged/raising trial must not abort the whole HPO run and
        # discard completed trials (the reference isolated each trial in a
        # subprocess for this reason); the GP clamps inf to "very bad"
        print(f"[opt] trial failed ({type(e).__name__}: {e}) — scoring inf")
        return float(np.inf)
    if "validation_cost" in result:
        return float(result["validation_cost"])
    if "ranking_accuracy" in result:  # KG runs report accuracy, not cost
        return -float(result["ranking_accuracy"])
    # a completed run without a validation split: fall back to the final
    # training cost so the GP still ranks trials (scoring it inf would
    # degenerate the whole HPO to random search with a meaningless 'best')
    hist = result.get("training_cost")
    if hist:
        print("[opt] no validation split — scoring trial by final "
              "training cost (add validation_data_rate for proper HPO)")
        return float(hist[-1] if isinstance(hist, (list, tuple)) else hist)
    return float(np.inf)


def _maybe_pool(base, parallel_trials: int):
    """Build the device-parallel trial pool, or None for the sequential
    path (parallel_trials<=1, single device, or a dataset the resident
    gate declines)."""
    if int(parallel_trials or 1) <= 1:
        return None
    import jax

    if len(jax.devices()) < 2:
        print("[opt] single device — sequential trials")
        return None
    try:
        from kgcn_tpu.cli.main import _prepare
        from kgcn_tpu.runtime.resident import resident_enabled
        from kgcn_tpu.tools.parallel_trials import DeviceTrialPool

        ds, info = _prepare(base)
        if not resident_enabled(base, ds, info):
            print("[opt] dataset not device-resident — sequential trials")
            return None
        return DeviceTrialPool(base, ds, info)
    except Exception as e:
        print(f"[opt] parallel trials unavailable "
              f"({type(e).__name__}: {e}) — sequential")
        return None


def main(argv=None):
    p = argparse.ArgumentParser(prog="kgcn-tpu-opt", description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--domain", required=True, help="domain JSON (reference format)")
    p.add_argument("--max-itr", type=int, default=10)
    p.add_argument("--output-dir", default="opt_result")
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--parallel-trials", type=int, default=1,
                   help="trials trained concurrently, one per device "
                        "(constant-liar batch acquisition; clamped to the "
                        "device count)")
    args = p.parse_args(argv)
    from kgcn_tpu.runtime.config import load_config
    from kgcn_tpu.tools.hpo import Domain, optimize, optimize_parallel

    base = load_config(args.config)
    from kgcn_tpu.runtime.jax_setup import setup_jax

    setup_jax(base, cpu=args.cpu)
    domain = Domain.from_json(args.domain)
    pool = _maybe_pool(base, args.parallel_trials)
    if pool is not None:
        import jax

        k = min(args.parallel_trials, len(jax.devices()))
        print(f"[opt] {k} trials per round, one per device")
        best_params, best_value, history = optimize_parallel(
            pool.run_batch,
            domain,
            max_iter=args.max_itr,
            batch=k,
            seed=args.seed,
        )
    else:
        best_params, best_value, history = optimize(
            lambda params: run_trial(base, params),
            domain,
            max_iter=args.max_itr,
            seed=args.seed,
        )
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "best_param.json"), "w") as f:
        json.dump(best_params, f, indent=2)
    best_config = dict(base)
    best_config["param"] = best_params
    with open(os.path.join(args.output_dir, "best_config.json"), "w") as f:
        json.dump(best_config, f, indent=2, default=str)
    with open(os.path.join(args.output_dir, "history.json"), "w") as f:
        json.dump(history, f, indent=2)
    print(f"[opt] best validation_cost={best_value:.6g} params={best_params}")
    print(f"[SAVE] {args.output_dir}/best_param.json")


if __name__ == "__main__":
    main()
