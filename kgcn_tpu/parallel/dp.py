"""Data-parallel training over a device mesh (shard_map + psum).

The TPU-native replacement for the reference's shell-level multi-process
parallelism (SURVEY.md §2.11): the global batch is a stack of per-device
local ``Batch`` pytrees; ``shard_map`` places one local batch per device,
gradients/metrics are reduced with ``psum``/``pmean`` over the ICI, and
parameters stay replicated.  Because every local batch has identical static
shapes, the whole step is one compiled SPMD program.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from kgcn_tpu.data.batcher import Batch, Batcher
from kgcn_tpu.runtime.train import Trainer, TrainState


def stack_batches(batches) -> Batch:
    """Stack per-device local batches along a new leading device axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)


class ShardedBatcher:
    """Wraps a Batcher: each yielded batch is a [D, ...] stack of local
    batches (device d gets graphs d*B_loc:(d+1)*B_loc of the global batch)."""

    def __init__(self, batcher: Batcher, num_shards: int):
        self.b = batcher
        self.num_shards = num_shards
        self.ds = batcher.ds
        self.global_batch = batcher.batch_size * num_shards

    @property
    def batch_size(self):
        return self.global_batch

    @property
    def valid_per_epoch(self) -> int:
        return self.ds.num

    def batch_valid_counts(self):
        n, bs = self.ds.num, self.global_batch
        return [min(bs, n - s) for s in range(0, n, bs)]

    def make_batch(self, idx: np.ndarray) -> Batch:
        per = self.b.batch_size
        shards = []
        for d in range(self.num_shards):
            shards.append(self.b.make_batch(idx[d * per : (d + 1) * per]))
        self.last_valid = len(idx)
        return stack_batches(shards)

    def batches(self, shuffle: bool = True, epoch=None):
        # epoch-keyed permutation → deterministic resume, and step-for-step
        # data-order parity with ShardedResidentBatcher
        idx = self.b.epoch_indices(shuffle, epoch=epoch)
        for start in range(0, len(idx), self.global_batch):
            yield self.make_batch(idx[start : start + self.global_batch])


def _local(tree):
    """Strip the (now size-1) leading device axis inside shard_map."""
    return jax.tree_util.tree_map(lambda x: x[0], tree)


class GlobalShardedBatcher:
    """Multi-process global-batch assembly (the multi-controller analogue of
    ``ShardedBatcher``).

    Each process builds ONLY the local batches for its own devices and the
    global ``[D_global, ...]`` batch is assembled as a sharded ``jax.Array``
    with ``jax.make_array_from_process_local_data`` — no host ever
    materialises another host's shard.  Two ingest modes:

    * ``mode="full"`` — every process holds the full (small) dataset; the
      epoch-keyed global permutation is recomputed identically on every
      process (``Batcher.epoch_indices`` is (seed, epoch)-deterministic), so
      the global data order is bit-for-bit the single-process order and DP
      training matches the single-process run exactly.
    * ``mode="shard"`` — each process holds only its
      ``process_index_range`` slice (true per-host ingest for datasets too
      large for one host); permutation is host-local, every global example
      is still consumed exactly once per epoch.

    The reference has no counterpart — its multi-process runs are separate
    shell-launched jobs that never share a batch (run.sh:9-14).
    """

    def __init__(self, batcher: Batcher, mesh: Mesh, axis: str = "data", *,
                 mode: str = "full", global_num: Optional[int] = None):
        self.b = batcher
        self.mesh = mesh
        self.axis = axis
        self.mode = mode
        self.D_global = int(mesh.shape[axis])
        self.n_proc = jax.process_count()
        self.pid = jax.process_index()
        if self.D_global % self.n_proc:
            raise ValueError(
                f"{self.D_global}-way data axis does not divide over "
                f"{self.n_proc} processes")
        self.D_local = self.D_global // self.n_proc
        self.ds = batcher.ds
        self.global_batch = batcher.batch_size * self.D_global
        self._n_global = int(
            global_num if global_num is not None else batcher.ds.num
        )
        self._sharding = NamedSharding(mesh, P(axis))

    @property
    def batch_size(self) -> int:
        return self.global_batch

    @property
    def valid_per_epoch(self) -> int:
        return self._n_global

    def batch_valid_counts(self):
        n, bs = self._n_global, self.global_batch
        return [min(bs, n - s) for s in range(0, n, bs)]

    def _globalize(self, local_stack):
        def g(x):
            x = np.asarray(x)
            return jax.make_array_from_process_local_data(
                self._sharding, x, (self.D_global,) + x.shape[1:]
            )

        return jax.tree_util.tree_map(g, local_stack)

    def _local_stack(self, global_idx: np.ndarray) -> Batch:
        """Stack of this process's local batches for one global step."""
        B = self.b.batch_size
        shards = []
        for dl in range(self.D_local):
            d = self.pid * self.D_local + dl
            # a trailing device's slice can be EMPTY when the dataset is
            # smaller than the global batch — pad with an all-invalid batch
            shards.append(
                self._padded_local_batch(global_idx[d * B:(d + 1) * B]))
        return stack_batches(shards)

    def host_sample(self) -> Batch:
        """Host-local [D_local, ...] sample batch for parameter init (init
        must NOT touch the global mesh: params are created per-process from
        the same seed, then replicated by ``DPTrainer.globalize_state``)."""
        idx = np.arange(min(self.global_batch, self._n_global))
        if self.mode == "shard":
            # init only needs shapes; any local rows do
            idx = np.arange(min(self.D_local * self.b.batch_size,
                                self.b.ds.num))
            B = self.b.batch_size
            return stack_batches([
                self.b.make_batch(idx[dl * B:(dl + 1) * B])
                for dl in range(self.D_local)
            ])
        return self._local_stack(idx)

    def make_batch(self, idx: np.ndarray) -> Batch:
        self.last_valid = len(idx)
        return self._globalize(self._local_stack(np.asarray(idx)))

    def _padded_local_batch(self, rows: np.ndarray) -> Batch:
        """A local batch for possibly-EMPTY rows: shorter host slices pad
        trailing global steps with all-invalid batches (shapes must stay
        identical across processes — every device runs the same program)."""
        if len(rows):
            return self.b.make_batch(rows)
        import dataclasses

        b = self.b.make_batch(np.array([0]))
        return dataclasses.replace(b, pad_mask=jnp.zeros_like(b.pad_mask))

    def _steps_shard(self) -> int:
        base, extra = divmod(self._n_global, self.n_proc)
        max_local = base + (1 if extra else 0)
        per_step = self.D_local * self.b.batch_size
        return (max_local + per_step - 1) // per_step

    def batches(self, shuffle: bool = True, epoch=None):
        if self.mode == "shard":
            # host-local permutation over this process's slice; every
            # process yields the SAME number of global steps (padded with
            # all-invalid local batches where slices are shorter)
            idx = self.b.epoch_indices(shuffle, epoch=epoch)
            per_step = self.D_local * self.b.batch_size
            B = self.b.batch_size
            for s in range(self._steps_shard()):
                chunk = idx[s * per_step:(s + 1) * per_step]
                shards = [
                    self._padded_local_batch(chunk[dl * B:(dl + 1) * B])
                    for dl in range(self.D_local)
                ]
                yield self._globalize(stack_batches(shards))
            return
        idx = self.b.epoch_indices(shuffle, epoch=epoch)
        for start in range(0, len(idx), self.global_batch):
            yield self.make_batch(idx[start:start + self.global_batch])


class ShardedResidentBatcher:
    """Data-parallel device-resident batcher: the DeviceDataset is replicated,
    the epoch schedule is a ``[S, D, B_loc]`` index tensor sharded over the
    ``data`` axis, and DPTrainer scans the whole epoch in ONE jit — the
    multi-chip version of kgcn_tpu/runtime/resident.py."""

    def __init__(self, rb, num_shards: int):
        from kgcn_tpu.runtime.resident import gather_batch

        self.rb = rb
        self.num_shards = int(num_shards)
        self.ds = rb.ds
        self.device_data = rb.device_data
        self.global_batch = rb.batch_size * self.num_shards
        self._gather = jax.jit(jax.vmap(gather_batch, in_axes=(None, 0, 0)))

    @property
    def batch_size(self) -> int:
        return self.global_batch

    @property
    def valid_per_epoch(self) -> int:
        return self.ds.num

    def batch_valid_counts(self):
        n, bs = self.ds.num, self.global_batch
        return [min(bs, n - s) for s in range(0, n, bs)]

    def epoch_schedule(self, shuffle: bool = True, epoch=None):
        idx = self.rb.epoch_indices(shuffle, epoch=epoch)
        D, B = self.num_shards, self.rb.batch_size
        S = (len(idx) + self.global_batch - 1) // self.global_batch
        pad = S * D * B - len(idx)
        sched = np.concatenate([idx, np.zeros(pad, idx.dtype)]).astype(np.int32)
        valid = (np.arange(S * D * B) < len(idx)).astype(np.float32)
        return sched.reshape(S, D, B), valid.reshape(S, D, B)

    def make_batch(self, idx: np.ndarray) -> Batch:
        idx = np.asarray(idx)
        D, B = self.num_shards, self.rb.batch_size
        pad = D * B - len(idx)
        sched = np.concatenate([idx, np.zeros(pad, np.int64)]).astype(np.int32)
        valid = (np.arange(D * B) < len(idx)).astype(np.float32)
        self.last_valid = len(idx)
        return self._gather(
            self.device_data,
            jnp.asarray(sched.reshape(D, B)),
            jnp.asarray(valid.reshape(D, B)),
        )

    def batches(self, shuffle: bool = True, epoch=None):
        sched, valid = self.epoch_schedule(shuffle, epoch=epoch)
        for s in range(sched.shape[0]):
            yield self._gather(
                self.device_data, jnp.asarray(sched[s]), jnp.asarray(valid[s])
            )


class DPTrainer(Trainer):
    """Trainer whose steps are shard_mapped over a mesh's ``data`` axis."""

    def __init__(self, model, config, info=None, tx=None, *,
                 mesh: Mesh, axis: str = "data"):
        super().__init__(model, config, info, tx)
        self.mesh = mesh
        self.axis = axis

    def init_state(self, sample_batch: Batch, seed: int = 0) -> TrainState:
        # sample_batch is a stacked [D, ...] batch; init from one local shard
        state = super().init_state(_local(sample_batch), seed)
        if jax.process_count() > 1:
            state = self.globalize_state(state)
        return state

    def globalize_state(self, state: TrainState) -> TrainState:
        """Promote a process-local state to a mesh-replicated global state.

        Multi-controller contract: every process ran the same deterministic
        init (or restored the same checkpoint file), so the values are
        identical across processes and a replicated device_put is exact.
        """
        sh = jax.sharding.NamedSharding(self.mesh, P())

        def put(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return x  # already a global array
            return jax.device_put(np.asarray(x), sh)

        return jax.tree_util.tree_map(put, state)

    def restore(self, state: TrainState, path: str) -> TrainState:
        state = super().restore(state, path)
        if jax.process_count() > 1:
            state = self.globalize_state(state)
        return state

    def _make_train_step(self):
        model, tx, axis = self.model, self.tx, self.axis
        cast = self._cast

        def loss_fn(params, batch_stats, batch, rng):
            variables = {"params": params, "batch_stats": batch_stats}
            out, updates = model.apply(
                variables, batch, train=True, rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            return out.cost_opt, (out, updates.get("batch_stats", batch_stats))

        def local_step(params, batch_stats, opt_state, step, rng, batch):
            batch = cast(_local(batch))  # honour precision: bfloat16
            d = jax.lax.axis_index(axis)
            local_rng = jax.random.fold_in(jax.random.fold_in(rng, step), d)
            grads, (out, new_stats) = jax.grad(loss_fn, has_aux=True)(
                params, batch_stats, batch, local_rng
            )
            grads = jax.lax.pmean(grads, axis)
            new_stats = jax.lax.pmean(new_stats, axis)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            cost_sum = jax.lax.psum(out.cost_sum, axis)
            metrics = jax.lax.psum(out.metrics, axis)
            return new_params, new_stats, new_opt, cost_sum, metrics

        sharded = shard_map(
            local_step,
            mesh=self.mesh,
            in_specs=(P(), P(), P(), P(), P(), P(self.axis)),
            out_specs=(P(), P(), P(), P(), P()),
            check_vma=False,
        )

        @partial(jax.jit, donate_argnums=(0,))
        def step(state: TrainState, batch: Batch):
            rng, sub = jax.random.split(state.rng)
            new_params, new_stats, new_opt, cost_sum, metrics = sharded(
                state.params, state.batch_stats, state.opt_state, state.step,
                sub, batch,
            )
            new_state = state.replace(
                params=new_params, batch_stats=new_stats, opt_state=new_opt,
                step=state.step + 1, rng=rng,
            )
            return new_state, cost_sum, metrics

        return step

    def _make_epoch_runner(self):
        """Whole-epoch lax.scan INSIDE shard_map: per-device on-device batch
        assembly from the resident dataset, psum'd gradients per step — one
        dispatch per epoch across the whole mesh."""
        from kgcn_tpu.runtime.resident import gather_batch

        model, tx, axis = self.model, self.tx, self.axis
        cast = self._cast

        def loss_fn(params, batch_stats, batch, rng):
            out, updates = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch,
                train=True, rngs={"dropout": rng}, mutable=["batch_stats"],
            )
            return out.cost_opt, (out, updates.get("batch_stats", batch_stats))

        def local_epoch(params, batch_stats, opt_state, step0, rng0,
                        dd, sched, valid):
            d = jax.lax.axis_index(axis)

            def body(carry, sv):
                params, bstats, opt, step, rng = carry
                idxb, vb = sv  # [1, B] shards inside shard_map
                batch = cast(gather_batch(dd, idxb[0], vb[0]))
                rng, sub = jax.random.split(rng)
                local_rng = jax.random.fold_in(jax.random.fold_in(sub, step), d)
                grads, (out, new_stats) = jax.grad(loss_fn, has_aux=True)(
                    params, bstats, batch, local_rng
                )
                grads = jax.lax.pmean(grads, axis)
                new_stats = jax.lax.pmean(new_stats, axis)
                updates, new_opt = tx.update(grads, opt, params)
                new_params = optax.apply_updates(params, updates)
                return (
                    (new_params, new_stats, new_opt, step + 1, rng),
                    (jax.lax.psum(out.cost_sum, axis),
                     jax.lax.psum(out.metrics, axis)),
                )

            carry, (costs, metrics) = jax.lax.scan(
                body, (params, batch_stats, opt_state, step0, rng0),
                (sched, valid),
            )
            return (*carry, costs, metrics)

        sharded = shard_map(
            local_epoch,
            mesh=self.mesh,
            in_specs=(P(), P(), P(), P(), P(), P(), P(None, self.axis),
                      P(None, self.axis)),
            out_specs=(P(), P(), P(), P(), P(), P(), P()),
            check_vma=False,
        )

        @partial(jax.jit, donate_argnums=(0,))
        def epoch(state: TrainState, dd, sched, valid):
            (params, bstats, opt, step, rng, costs, metrics) = sharded(
                state.params, state.batch_stats, state.opt_state, state.step,
                state.rng, dd, sched, valid,
            )
            new_state = state.replace(
                params=params, batch_stats=bstats, opt_state=opt,
                step=step, rng=rng,
            )
            return new_state, costs, metrics

        return epoch

    def _make_eval_step(self):
        model, axis = self.model, self.axis
        cast = self._cast

        def local_eval(params, batch_stats, batch):
            batch = cast(_local(batch))
            out = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch,
                train=False,
            )
            cost_sum = jax.lax.psum(out.cost_sum, axis)
            metrics = jax.lax.psum(out.metrics, axis)
            # keep per-device predictions stacked so the caller sees [D, B, ...]
            pred = jax.tree_util.tree_map(lambda x: x[None], out.prediction)
            return pred, cost_sum, metrics

        sharded = shard_map(
            local_eval,
            mesh=self.mesh,
            in_specs=(P(), P(), P(self.axis)),
            out_specs=(P(self.axis), P(), P()),
            check_vma=False,
        )
        return jax.jit(sharded)

    def evaluate(self, state: TrainState, batcher, key_prefix=""):
        """Like Trainer.evaluate but flattens the device axis of predictions
        and pad masks."""
        from kgcn_tpu.runtime.metrics import aggregate_metrics

        cost_total, n_total = 0.0, 0
        metric_list, preds, costs, pads = [], [], [], []
        for batch in batcher.batches(shuffle=False):
            pred, cost_sum, metrics = self.eval_step(
                state.params, state.batch_stats, batch
            )
            costs.append(cost_sum)
            metric_list.append(metrics)
            preds.append(pred)
            pads.append(batch.pad_mask)
        from kgcn_tpu.parallel.mesh import host_view

        # costs/metrics are replicated (device_get safe on every process);
        # preds/pads are sharded over the data axis → allgather multi-process
        costs, metric_list = jax.device_get((costs, metric_list))
        preds, pads = host_view((preds, pads))
        cost_total = float(np.sum(costs))
        flat_preds = []
        for pred_np, pad in zip(preds, pads):
            pad = np.asarray(pad).reshape(-1)
            n_total += int(pad.sum())
            flat = (
                {k: v.reshape(-1, *v.shape[2:])[pad > 0] for k, v in pred_np.items()}
                if isinstance(pred_np, dict)
                else pred_np.reshape(-1, *pred_np.shape[2:])[pad > 0]
            )
            flat_preds.append(flat)
        preds = flat_preds
        agg = aggregate_metrics(
            metric_list, n_total, self.config.get("task", ""), key_prefix
        )
        if preds and isinstance(preds[0], dict):
            prediction = {k: np.concatenate([p[k] for p in preds]) for k in preds[0]}
        elif preds:
            prediction = np.concatenate(preds)
        else:
            prediction = None
        return {
            "cost": cost_total / max(n_total, 1),
            "metrics": agg or {},
            "prediction": prediction,
            "num": n_total,
        }
