"""Neural architecture search over the GCN layer space.

Reference: neural_architecture_search/gcn_nas.py:129-196 — DBONAS (tfdbonas)
searches kGCN layer-graph architectures with a GCN surrogate.  Here the search
space is a parameterised GCN builder (depth, widths, activations, readout,
dense tail) explored with the same Gaussian-process Bayesian optimiser used
by ``kgcn-tpu-opt`` — surrogate-guided search without external deps.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from kgcn_tpu import nn as knn
from kgcn_tpu.data.batcher import Batch
from kgcn_tpu.models.base import ModelOutput
from kgcn_tpu.models.standard import softmax_ce_cost
from kgcn_tpu.tools.hpo import Domain, optimize

NAS_DOMAIN = [
    {"name": "num_gcn_layer", "type": "discrete", "domain": (1, 2, 3, 4),
     "data_type": "int"},
    {"name": "hidden", "type": "discrete", "domain": (16, 32, 50, 64, 128),
     "data_type": "int"},
    {"name": "activation", "type": "discrete", "domain": (0, 1, 2),
     "data_type": "int"},  # 0=sigmoid 1=relu 2=tanh
    {"name": "use_bn", "type": "discrete", "domain": (0, 1), "data_type": "int"},
    {"name": "num_dense_layer", "type": "discrete", "domain": (0, 1, 2),
     "data_type": "int"},
    {"name": "learning_rate", "type": "continuous", "domain": (1e-4, 3e-2)},
]

_ACTS = [jax.nn.sigmoid, jax.nn.relu, jnp.tanh]


class SearchedGCN(nn.Module):
    """A GCN instantiated from a NAS parameter dict."""

    channels: int
    label_dim: int
    arch: Tuple  # (num_gcn, hidden, act_idx, use_bn, num_dense)

    @nn.compact
    def __call__(self, batch: Batch, train: bool = False) -> ModelOutput:
        num_gcn, hidden, act_idx, use_bn, num_dense = self.arch
        act = _ACTS[act_idx]
        g = batch.graph.with_dense_adj()
        x = batch.graph.nodes
        for _ in range(num_gcn):
            x = knn.GraphConv(hidden, self.channels)(x, g)
            if use_bn:
                x = knn.GraphBatchNormalization()(x, g, use_running_average=not train)
            x = act(x)
        for _ in range(num_dense):
            x = act(knn.GraphDense(hidden)(x, g))
        h = knn.GraphGather()(x, g)
        logits = nn.Dense(self.label_dim)(h)
        cost_opt, cost_sum, pred, metrics = softmax_ce_cost(
            logits, batch.labels, batch.pad_mask
        )
        return ModelOutput(pred, cost_opt, cost_sum, metrics)


def build_from_params(params: Dict, info) -> SearchedGCN:
    return SearchedGCN(
        channels=info.adj_channel_num,
        label_dim=info.label_dim or 2,
        arch=(
            int(params["num_gcn_layer"]),
            int(params["hidden"]),
            int(params["activation"]),
            int(params["use_bn"]),
            int(params["num_dense_layer"]),
        ),
    )


def search(train_ds, valid_ds, info, config, max_iter: int = 10, seed: int = 0,
           log=print, parallel: int = 1):
    """NAS loop: each trial trains a candidate and reports validation cost.

    ``parallel>1``: candidates train concurrently, one architecture per
    device (tools/parallel_trials.py), with constant-liar batch
    acquisition — the heterogeneous-program case vmap-stacking can't serve.
    """
    import optax

    from kgcn_tpu.data import Batcher
    from kgcn_tpu.runtime.train import Trainer

    if int(parallel or 1) > 1:
        import jax

        if len(jax.devices()) > 1:
            from kgcn_tpu.tools.hpo import optimize_parallel
            from kgcn_tpu.tools.parallel_trials import DeviceTrialPool

            pool = DeviceTrialPool(
                dict(config), train_ds, info, valid_ds=valid_ds,
                model_builder=lambda cfg, params, inf:
                    build_from_params(params, inf),
            )
            k = min(int(parallel), len(jax.devices()))
            log(f"[nas] {k} candidates per round, one per device")
            return optimize_parallel(
                pool.run_batch, Domain(NAS_DOMAIN), max_iter=max_iter,
                batch=k, seed=seed, log=log)
        log("[nas] single device — sequential candidates")

    # batchers are data-only — build once, not per trial (Batcher.__init__
    # redoes the native edge concatenation + ELL precompute over the whole
    # dataset; only the model/Trainer is per-trial state)
    bs = int(config.get("batch_size", 10))
    tb = Batcher(train_ds, info, bs, seed=seed)
    vb = Batcher(valid_ds, info, bs)

    def objective(params: Dict) -> float:
        model = build_from_params(params, info)
        cfg = dict(config)
        cfg["learning_rate"] = float(params["learning_rate"])
        cfg["save_interval"] = 0
        trainer = Trainer(model, cfg, info,
                          tx=optax.adam(cfg["learning_rate"]))
        state = trainer.init_state(
            tb.make_batch(np.arange(min(bs, train_ds.num))), seed=seed
        )
        for _ in range(int(cfg.get("epoch", 10))):
            state, cost, _, _ = trainer.run_epoch(state, tb)
            if not np.isfinite(cost):
                return float("inf")
        ev = trainer.evaluate(state, vb)
        return ev["cost"]

    return optimize(objective, Domain(NAS_DOMAIN), max_iter=max_iter,
                    seed=seed, log=log)
