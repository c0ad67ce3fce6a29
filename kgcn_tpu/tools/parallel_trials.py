"""Device-parallel HPO/NAS trials: one trial per device, async dispatch.

The reference runs one subprocess per trial, strictly sequentially
(reference: opt_hyperparam.py:117-121) — on a multi-chip system every other
chip idles for the whole optimisation.  The fold-parallel CV trick
(parallel/cv.py: vmap-stacked states) does not transfer directly: HPO
trials legitimately differ in ARCHITECTURE (e.g. the reference domain tunes
``num_gcn_layer``), so their compiled programs differ and cannot share one
vmap.  Instead each trial's state and resident dataset live on their OWN
device and every epoch is one compiled dispatch per trial; dispatching all
trials' epochs BEFORE fetching any result lets XLA's async dispatch keep
every device busy concurrently — heterogeneous programs, concurrent
execution, single controller.

Used by ``kgcn-tpu-opt --parallel-trials k`` (cli/opt.py) together with the
constant-liar batch acquisition in tools/hpo.py, and by NAS
(tools/nas.py) through the same entry point.
"""
from __future__ import annotations

import copy
from typing import Any, Dict, List, Optional

import numpy as np


class DeviceTrialPool:
    """Train k configs concurrently, trial i pinned to device i.

    The dataset is uploaded once per device (cached across rounds); each
    round trains its trials epoch-by-epoch with per-trial early stopping
    and returns the best validation cost per trial — the same objective the
    sequential ``run_trial`` reports.
    """

    def __init__(self, base_config: Dict[str, Any], ds, info,
                 valid_ds=None, model_builder=None):
        import jax

        self.base = base_config
        self.info = info
        # model_builder(cfg, params, info) -> flax model; default: registry
        # lookup of cfg["model.py"].  NAS passes its SearchedGCN builder.
        self.model_builder = model_builder
        if valid_ds is None:
            from kgcn_tpu.data import split_dataset

            rate = float(base_config.get("validation_data_rate", 0.2) or 0.2)
            ds, valid_ds, _, _ = split_dataset(
                ds, rate, seed=int(base_config.get("seed", 0)))
        self.train_ds = ds
        self.valid_ds = valid_ds
        self.devices = jax.devices()
        self._dd_cache: Dict[int, Any] = {}   # device index -> (train, valid)

    # -- per-device resident data ---------------------------------------
    def _device_data(self, di: int):
        import jax

        if di not in self._dd_cache:
            from kgcn_tpu.runtime.resident import build_device_dataset

            put = lambda t: jax.device_put(t, self.devices[di])  # noqa: E731
            self._dd_cache[di] = (
                put(build_device_dataset(self.train_ds, self.info)),
                put(build_device_dataset(self.valid_ds, self.info)),
            )
        return self._dd_cache[di]

    def _trial_config(self, params: Dict[str, Any]) -> Dict[str, Any]:
        config = copy.deepcopy(self.base)
        config["param"] = dict(params)
        for key in ("learning_rate", "batch_size", "dropout_rate", "epoch"):
            if key in params:
                config[key] = params[key]
        return config

    def run_batch(self, param_dicts: List[Dict[str, Any]],
                  log=print) -> List[float]:
        """Train one round of trials concurrently; returns each trial's
        best validation cost (np.inf for trials that failed to build)."""
        import jax
        import jax.numpy as jnp

        from kgcn_tpu.models.registry import build_model
        from kgcn_tpu.runtime.resident import ResidentBatcher
        from kgcn_tpu.runtime.train import EarlyStopping, Trainer

        k = len(param_dicts)
        assert k <= len(self.devices), (k, len(self.devices))
        trials = []
        for i, params in enumerate(param_dicts):
            try:
                cfg = self._trial_config(params)
                dd_tr, dd_va = self._device_data(i)
                if self.model_builder is not None:
                    model = self.model_builder(cfg, params, self.info)
                else:
                    model = build_model(cfg["model.py"], self.info, cfg)
                trainer = Trainer(model, cfg, self.info)
                B = int(cfg["batch_size"])
                rb = ResidentBatcher(self.train_ds, self.info, B,
                                     seed=int(cfg.get("seed", 0)),
                                     device_data=dd_tr)
                vb = ResidentBatcher(self.valid_ds, self.info, B,
                                     device_data=dd_va)
                sample = rb.make_batch(
                    np.arange(min(B, self.train_ds.num)))
                state = trainer.init_state(
                    sample, seed=int(cfg.get("seed", 0)))
                state = jax.device_put(state, self.devices[i])
                trials.append({
                    "params": params, "cfg": cfg, "trainer": trainer,
                    "rb": rb, "vb": vb, "state": state,
                    "es": EarlyStopping(int(cfg.get("patience", 0) or 0),
                                        cfg.get("task", "")),
                    "best": np.inf, "done": False,
                    "epochs": int(cfg.get("epoch", 20)),
                    "epoch_fn": trainer._make_epoch_runner(),
                    "eval_fn": trainer._make_eval_runner(),
                })
            except Exception as e:
                log(f"[opt] trial {i} failed to build "
                    f"({type(e).__name__}: {e}) — scoring inf")
                trials.append({"params": params, "done": True,
                               "best": np.inf})

        epochs = max((t.get("epochs", 0) for t in trials), default=0)
        n_va = max(self.valid_ds.num, 1)
        v_scheds = {}
        for epoch in range(epochs):
            # phase 1: DISPATCH every live trial's train epoch + eval pass
            # (no host sync yet → all devices compute concurrently)
            pend = []
            for i, t in enumerate(trials):
                if t["done"] or epoch >= t.get("epochs", 0):
                    continue
                # a trial raising at trace/compile/run time must not abort
                # the whole optimisation (sequential-path invariant:
                # cli/opt.py run_trial scores such trials inf and moves on)
                try:
                    sched, valid = t["rb"].epoch_schedule(
                        shuffle=bool(t["cfg"].get("shuffle_data", True)),
                        epoch=epoch)
                    t["state"], costs, _ = t["epoch_fn"](
                        t["state"], t["rb"].device_data,
                        jnp.asarray(sched), jnp.asarray(valid))
                    key = id(t)
                    if key not in v_scheds:
                        v_scheds[key] = t["vb"].epoch_schedule(shuffle=False)
                    vs, vv = v_scheds[key]
                    _, v_costs, _ = t["eval_fn"](
                        t["state"].params, t["state"].batch_stats,
                        t["vb"].device_data, jnp.asarray(vs), jnp.asarray(vv))
                except Exception as e:
                    log(f"[opt] trial {i} failed at epoch {epoch} "
                        f"({type(e).__name__}: {e}) — scoring inf")
                    # sequential invariant (cli/opt.py run_trial): a RAISING
                    # trial scores inf even if earlier epochs looked good —
                    # its config crashes when trained to the full epoch count
                    t["best"] = np.inf
                    t["done"] = True
                    continue
                pend.append((t, i, costs, v_costs))
            if not pend:
                break
            # phase 2: FETCH results (each fetch only waits for its device;
            # async-dispatch errors also surface here, same per-trial guard)
            for t, i, costs, v_costs in pend:
                try:
                    tc = float(np.sum(jax.device_get(costs)))
                    vc = float(np.sum(jax.device_get(v_costs))) / n_va
                except Exception as e:
                    log(f"[opt] trial {i} failed at epoch {epoch} fetch "
                        f"({type(e).__name__}: {e}) — scoring inf")
                    t["best"] = np.inf
                    t["done"] = True
                    continue
                if not np.isfinite(tc):
                    t["done"] = True  # diverged; best stays whatever it was
                    continue
                t["best"] = min(t["best"], vc)
                if t["es"].update(vc):
                    t["done"] = True
        return [float(t["best"]) for t in trials]
