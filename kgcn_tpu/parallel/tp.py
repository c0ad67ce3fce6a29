"""Tensor-parallel parameter sharding (GSPMD) over a ``data × model`` mesh.

SURVEY §2.11 marks TP secondary for this workload (GNN layers are narrow),
but wide variants exist (256-wide multitask towers, 20k-class readout
heads).  Strategy: annotate large kernels with a ``model``-axis sharding on
their output feature dimension and let GSPMD insert the collectives — the
einsum-based layers need no code changes.

``TPTrainer`` extends the data-parallel trainer: batch on ``data``,
large parameters sharded on ``model``, small parameters replicated.
"""
from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kgcn_tpu.data.batcher import Batch
from kgcn_tpu.runtime.train import Trainer, TrainState


def param_sharding_rules(params, mesh: Mesh, axis: str = "model",
                         min_dim: int = 128):
    """A pytree of NamedShardings: shard the LAST dim of any kernel whose
    last dim is divisible by the mesh axis and ≥ min_dim; replicate the rest.
    """
    size = mesh.shape[axis]

    def rule(x):
        shape = np.shape(x)
        if (
            len(shape) >= 2
            and shape[-1] >= min_dim
            and shape[-1] % size == 0
        ):
            spec = [None] * (len(shape) - 1) + [axis]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def apply_shardings(tree, shardings):
    """Device-put a pytree onto its shardings."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), tree, shardings
    )


class TPTrainer(Trainer):
    """Trainer whose parameters are GSPMD-sharded over the ``model`` axis and
    whose batch is replicated (combine with larger per-step batches, or use
    DPTrainer for the data axis — for 2D data×model, shard batches with
    ShardedBatcher along ``data`` and params along ``model``)."""

    def __init__(self, model, config, info=None, tx=None, *, mesh: Mesh,
                 model_axis: str = "model", min_dim: int = 128):
        super().__init__(model, config, info, tx)
        self.mesh = mesh
        self.model_axis = model_axis
        self.min_dim = min_dim
        self._shardings = None

    def init_state(self, sample_batch: Batch, seed: int = 0) -> TrainState:
        state = super().init_state(sample_batch, seed)
        self._shardings = param_sharding_rules(
            state.params, self.mesh, self.model_axis, self.min_dim
        )
        params = apply_shardings(state.params, self._shardings)
        opt_state = self.tx.init(params)
        return state.replace(params=params, opt_state=opt_state)

    def _make_train_step(self):
        model, tx = self.model, self.tx
        mesh = self.mesh

        def loss_fn(params, batch_stats, batch, rng):
            variables = {"params": params, "batch_stats": batch_stats}
            out, updates = model.apply(
                variables, batch, train=True, rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            return out.cost_opt, (out, updates.get("batch_stats", batch_stats))

        cast = self._cast

        @partial(jax.jit, donate_argnums=(0,))
        def step(state: TrainState, batch: Batch):
            batch = cast(batch)  # honour precision: bfloat16
            rng, sub = jax.random.split(state.rng)
            grads, (out, new_stats) = jax.grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, batch, sub
            )
            # keep gradient/update shardings aligned with the params so the
            # optimizer update stays fully sharded
            grads = jax.lax.with_sharding_constraint(grads, self._shardings)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_params = jax.lax.with_sharding_constraint(
                new_params, self._shardings
            )
            return (
                state.replace(
                    params=new_params, batch_stats=new_stats,
                    opt_state=new_opt, step=state.step + 1, rng=rng,
                ),
                out.cost_sum,
                out.metrics,
            )

        return step
