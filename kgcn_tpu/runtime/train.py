"""Core training runtime: jit-compiled train/eval steps, epoch loop,
early stopping, checkpoint policy, NaN abort.

TPU-native redesign of ``CoreModel`` (reference: kgcn/core.py:129-511):

* one jit-compiled, buffer-donated train step replaces per-step
  ``sess.run`` + Python feed_dict rebuilds (the reference's bottleneck,
  kgcn/feed.py:112-126);
* every batch of an epoch has identical shapes (see
  ``kgcn_tpu.data.batcher``), so the step compiles exactly once;
* Adam + BN-statistics update ordering matches the reference's
  UPDATE_OPS control-dependency pattern (kgcn/core.py:121-127) — flax
  mutable collections update in the same step;
* checkpoints: best/last/interval with the reference's policy
  (kgcn/core.py:314-368), NaN abort (kgcn/core.py:336-337),
  restore-best-before-final-eval (kgcn/core.py:340-356).
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from kgcn_tpu.data.batcher import Batch, Batcher
from kgcn_tpu.data.prefetch import prefetch
from kgcn_tpu.runtime import checkpoint as ckpt
from kgcn_tpu.runtime.metrics import aggregate_metrics


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jnp.ndarray
    epoch: int = struct.field(pytree_node=False, default=0)


class EarlyStopping:
    """Stop when validation cost fails to improve ``patience`` consecutive
    epochs (reference: kgcn/core.py:15-76)."""

    def __init__(self, patience: int = 0, task: str = "classification"):
        self.patience = patience
        self.task = task
        self.prev_cost: Optional[float] = None
        self.count = 0

    def update(self, validation_cost: float) -> bool:
        stop = False
        if self.prev_cost is not None and self.prev_cost < validation_cost:
            self.count += 1
            if self.patience > 0 and self.count >= self.patience:
                stop = True
        else:
            self.count = 0
        self.prev_cost = validation_cost
        return stop


class EarlyStoppingMultiTask(EarlyStopping):
    """Per-task epoch reporting for multitask models (reference:
    ``EarlyStoppingMultiTask``, kgcn/core.py:78-117 — shipped commented-out
    at kgcn/core.py:236; selectable here via config
    ``early_stopping: "multitask"``).  The stopping decision is identical to
    the base class (single aggregated validation cost), matching the
    reference; only the epoch line gains ``each acc=[...]`` per-task
    readouts."""

    @staticmethod
    def each_bit(metrics: Optional[Dict[str, Any]], key: str) -> str:
        if not metrics or key not in metrics:
            return ""
        vals = np.asarray(metrics[key]).ravel()
        return " (each acc=[" + " ".join(f"{v:.3g}" for v in vals) + "])"


class CachedBatches:
    """Materialise a batcher's shuffle=False batches ONCE (device-resident)
    and replay them — validation batches are identical every epoch, so the
    host assembly + transfer cost is paid a single time."""

    def __init__(self, batcher):
        self._batcher = batcher
        self._cache = None
        self.ds = batcher.ds
        for attr in ("valid_per_epoch", "batch_size"):
            if hasattr(batcher, attr):
                setattr(self, attr, getattr(batcher, attr))

    def batch_valid_counts(self):
        return self._batcher.batch_valid_counts()

    def batches(self, shuffle: bool = False):
        assert not shuffle, (
            "CachedBatches replays a fixed shuffle=False cache — it must "
            "never stand in for a training batcher"
        )
        if self._cache is None:
            self._cache = list(self._batcher.batches(shuffle=False))
        return iter(self._cache)


def _cache_fits(batcher) -> bool:
    """Gate CachedBatches on the resident HBM budget: pinning a large
    validation split's device batches for the whole fit would otherwise
    evict working memory on datasets the resident path itself declines."""
    ds = getattr(batcher, "ds", None)
    if ds is None or getattr(ds, "adjs", None) is None:
        return True  # non-dataset batchers: small by construction
    try:
        from kgcn_tpu.runtime.resident import (
            DEFAULT_RESIDENT_BUDGET, estimate_bytes,
        )

        max_nodes = int(getattr(batcher, "max_nodes", 0) or 0) or 1
        return estimate_bytes(ds, max_nodes) <= DEFAULT_RESIDENT_BUDGET
    except Exception:
        return True


_CHANNEL_WARM = False


def _warm_readback_channel() -> None:
    """First device→host copy on a tunnel-attached TPU pays a large one-time
    channel-establishment cost (measured 14s..minutes under load).  Pay it at
    a defined point instead of inside the first epoch's timing."""
    global _CHANNEL_WARM
    if _CHANNEL_WARM:
        return
    _CHANNEL_WARM = True
    try:
        jax.device_get(jnp.zeros(()))
    except Exception:
        pass


class Trainer:
    """Builds jitted steps around a flax model following the
    :class:`kgcn_tpu.models.base.ModelOutput` protocol."""

    def __init__(self, model, config: Dict[str, Any], info=None, tx=None):
        _warm_readback_channel()
        self.model = model
        self.config = config
        self.info = info
        if tx is None:
            # TPU-build additions over the reference's bare Adam
            # (kgcn/core.py:121-127): configurable optimizer, LR schedule,
            # global-norm clipping, decoupled weight decay (runtime/optim.py)
            from kgcn_tpu.runtime.optim import make_optimizer

            tx = make_optimizer(config)
        self.tx = tx
        # Mixed precision: config "precision": "bfloat16" casts the compute
        # payload (features, adjacency, edge weights) to bf16 inside the
        # jitted step — params, optimizer state, and losses stay float32.
        self.compute_dtype = (
            jnp.bfloat16
            if str(config.get("precision", "float32")) == "bfloat16"
            else None
        )
        self._train_step = None
        self._eval_step = None
        self._epoch_runner = None
        self._eval_runner = None
        self._scan_runner = {}

    def _cast(self, batch: Batch) -> Batch:
        if self.compute_dtype is not None and hasattr(batch, "cast_compute"):
            return batch.cast_compute(self.compute_dtype)
        return batch

    # ---- state ---------------------------------------------------------
    def init_state(self, sample_batch: Batch, seed: int = 0) -> TrainState:
        rng = jax.random.PRNGKey(seed)
        p_rng, d_rng, s_rng = jax.random.split(rng, 3)
        variables = self.model.init(
            {"params": p_rng, "dropout": d_rng}, sample_batch, train=False
        )
        params = variables.get("params", {})
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
            rng=s_rng,
        )

    # ---- compiled steps ------------------------------------------------
    def _loss_fn(self):
        """The one training loss closure every runner shares (per-step jit,
        resident epoch scan, generic scan) — a fix here reaches all three."""
        model = self.model

        def loss_fn(params, batch_stats, batch, rng):
            out, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch,
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            return out.cost_opt, (out, updates.get("batch_stats", batch_stats))

        return loss_fn

    def _apply_step(self, state, batch, loss_fn):
        """grad → optimizer update → new TrainState (shared step body)."""
        rng, sub = jax.random.split(state.rng)
        grads, (out, new_stats) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, sub
        )
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        return state.replace(
            params=optax.apply_updates(state.params, updates),
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
            rng=rng,
        ), out

    def _make_train_step(self):
        loss_fn = self._loss_fn()

        def step(state: TrainState, batch: Batch):
            batch = self._cast(batch)
            new_state, out = self._apply_step(state, batch, loss_fn)
            return new_state, out.cost_sum, out.metrics

        return jax.jit(step, donate_argnums=(0,))

    def _make_eval_step(self):
        model = self.model

        def step(params, batch_stats, batch: Batch):
            batch = self._cast(batch)
            variables = {"params": params, "batch_stats": batch_stats}
            out = model.apply(variables, batch, train=False)
            return out.prediction, out.cost_sum, out.metrics

        return jax.jit(step)

    @property
    def train_step(self):
        if self._train_step is None:
            self._train_step = self._make_train_step()
        return self._train_step

    @property
    def eval_step(self):
        if self._eval_step is None:
            self._eval_step = self._make_eval_step()
        return self._eval_step

    # ---- whole-epoch scan (device-resident datasets) --------------------
    def _make_epoch_runner(self):
        """One jit: lax.scan of the train step over an epoch's schedule,
        assembling every batch ON DEVICE from the resident dataset — a single
        dispatch per epoch (see kgcn_tpu/runtime/resident.py)."""
        from kgcn_tpu.runtime.resident import gather_batch

        loss_fn = self._loss_fn()

        def epoch(state: TrainState, dd, sched, valid):
            def body(st, sv):
                idxb, vb = sv
                batch = self._cast(gather_batch(dd, idxb, vb))
                new_st, out = self._apply_step(st, batch, loss_fn)
                return new_st, (out.cost_sum, out.metrics)

            state, (costs, metrics) = jax.lax.scan(body, state, (sched, valid))
            return state, costs, metrics

        return jax.jit(epoch, donate_argnums=(0,))

    def _run_epoch_resident(self, state: TrainState, batcher, shuffle, epoch):
        sched, valid = batcher.epoch_schedule(shuffle=shuffle, epoch=epoch)
        if self._epoch_runner is None:
            self._epoch_runner = self._make_epoch_runner()
        state, costs, metrics = self._epoch_runner(
            state, batcher.device_data, jnp.asarray(sched), jnp.asarray(valid)
        )
        costs, metrics = jax.device_get((costs, metrics))
        S = len(costs)
        metric_list = [
            {k: v[s] for k, v in metrics.items()} for s in range(S)
        ]
        n_total = batcher.valid_per_epoch
        return state, float(np.sum(costs)) / max(n_total, 1), metric_list, n_total

    def _make_scan_runner(self, make_batch_fn):
        """Generic whole-epoch scan for batchers exposing the
        (constant batch, per-step xs) protocol (``epoch_scan_inputs`` /
        ``make_scan_batch``) — e.g. KG whole-graph training where only the
        label slice varies per step."""
        loss_fn = self._loss_fn()

        def epoch(state: TrainState, const_batch, xs):
            def body(st, x):
                batch = self._cast(make_batch_fn(const_batch, x))
                new_st, out = self._apply_step(st, batch, loss_fn)
                return new_st, (out.cost_sum, out.metrics)

            state, (costs, metrics) = jax.lax.scan(body, state, xs)
            return state, costs, metrics

        return jax.jit(epoch, donate_argnums=(0,))

    def _run_epoch_scanned(self, state: TrainState, batcher, shuffle, epoch):
        const_batch, xs = batcher.epoch_scan_inputs(shuffle=shuffle, epoch=epoch)
        # one compiled runner PER BATCHER TYPE — each type's make_scan_batch
        # assembles a different Batch layout
        key = type(batcher)
        runner = self._scan_runner.get(key)
        if runner is None:
            runner = self._make_scan_runner(key.make_scan_batch)
            self._scan_runner[key] = runner
        state, costs, metrics = runner(state, const_batch, xs)
        costs, metrics = jax.device_get((costs, metrics))
        S = len(costs)
        metric_list = [{k: v[s] for k, v in metrics.items()} for s in range(S)]
        n_total = getattr(batcher, "valid_per_epoch", S)
        return state, float(np.sum(costs)) / max(n_total, 1), metric_list, n_total

    def _make_eval_runner(self):
        """Whole-evaluation scan over the resident dataset: batches gathered
        on device, eval steps scanned — ONE dispatch for the full pass."""
        from kgcn_tpu.runtime.resident import gather_batch

        model = self.model

        def run(params, batch_stats, dd, sched, valid):
            def body(_, sv):
                idxb, vb = sv
                batch = self._cast(gather_batch(dd, idxb, vb))
                out = model.apply(
                    {"params": params, "batch_stats": batch_stats}, batch,
                    train=False,
                )
                return None, (out.prediction, out.cost_sum, out.metrics)

            _, outs = jax.lax.scan(body, None, (sched, valid))
            return outs

        return jax.jit(run)

    # ---- loops ---------------------------------------------------------
    def run_epoch(self, state: TrainState, batcher: Batcher, shuffle=True,
                  epoch: Optional[int] = None):
        if hasattr(batcher, "epoch_schedule"):
            return self._run_epoch_resident(state, batcher, shuffle, epoch)
        if hasattr(batcher, "epoch_scan_inputs"):
            return self._run_epoch_scanned(state, batcher, shuffle, epoch)
        # Keep per-step outputs on device and fetch once at epoch end — a
        # per-step float() would synchronise with the device every batch
        # (30 ms/step through a tunnel-attached TPU).
        costs, valid_counts = [], []
        metric_list = []
        known = getattr(batcher, "valid_per_epoch", None)
        try:
            it = batcher.batches(shuffle=shuffle, epoch=epoch)
        except TypeError:  # batchers without deterministic epoch support
            it = batcher.batches(shuffle=shuffle)
        for batch in prefetch(it):
            state, cost_sum, metrics = self.train_step(state, batch)
            costs.append(cost_sum)
            if known is None:
                # keep the count on device — a per-step int() would block on
                # a device→host sync every batch (the readback the comment
                # above exists to avoid); fetched once below
                valid_counts.append(jnp.sum(batch.pad_mask))
            metric_list.append(metrics)
        costs, metric_list, valid_counts = jax.device_get(
            (costs, metric_list, valid_counts)
        )
        n_total = known if known is not None else int(np.sum(valid_counts))
        return state, float(np.sum(costs)) / max(n_total, 1), metric_list, n_total

    def _evaluate_resident(self, state: TrainState, batcher, key_prefix=""):
        if self._eval_runner is None:
            self._eval_runner = self._make_eval_runner()
        sched, valid = batcher.epoch_schedule(shuffle=False)
        preds, costs, metrics = self._eval_runner(
            state.params, state.batch_stats, batcher.device_data,
            jnp.asarray(sched), jnp.asarray(valid),
        )
        preds, costs, metrics = jax.device_get((preds, costs, metrics))
        counts = batcher.batch_valid_counts()
        n_total = sum(counts)
        S = len(costs)
        metric_list = [{k: v[s] for k, v in metrics.items()} for s in range(S)]
        # trim batch padding rows and flatten the step axis
        # (reference: kgcn/core.py:409-414)
        if isinstance(preds, dict):
            prediction = {
                k: np.concatenate([v[s][: counts[s]] for s in range(S)])
                for k, v in preds.items()
            }
        else:
            prediction = np.concatenate(
                [preds[s][: counts[s]] for s in range(S)]
            )
        agg = aggregate_metrics(
            metric_list, n_total, self.config.get("task", ""), key_prefix
        )
        return {
            "cost": float(np.sum(costs)) / max(n_total, 1),
            "metrics": agg or {},
            "prediction": prediction,
            "num": n_total,
        }

    def evaluate(self, state: TrainState, batcher: Batcher, key_prefix=""):
        # resident datasets: the entire pass is one jitted scan
        inner = getattr(batcher, "_batcher", batcher)  # unwrap CachedBatches
        if hasattr(inner, "epoch_schedule") and type(self) is Trainer:
            return self._evaluate_resident(state, inner, key_prefix)
        # device outputs are collected and fetched ONCE at the end (one sync
        # instead of one per batch — significant on tunnel-attached TPUs)
        cost_total, n_total = 0.0, 0
        metric_list, preds = [], []
        costs, valid_counts = [], []
        known_counts = (
            batcher.batch_valid_counts()
            if hasattr(batcher, "batch_valid_counts")
            else None
        )
        for bi, batch in enumerate(prefetch(batcher.batches(shuffle=False))):
            pred, cost_sum, metrics = self.eval_step(
                state.params, state.batch_stats, batch
            )
            n_valid = (
                known_counts[bi]
                if known_counts is not None
                else int(np.asarray(batch.pad_mask).sum())
            )
            valid_counts.append(n_valid)
            n_total += n_valid
            costs.append(cost_sum)
            metric_list.append(metrics)
            preds.append(pred)
        costs, metric_list, preds = jax.device_get((costs, metric_list, preds))
        cost_total = float(np.sum(costs))
        # trim padding rows (reference: kgcn/core.py:409-414)
        preds = [
            {k: v[:n] for k, v in p.items()} if isinstance(p, dict) else p[:n]
            for p, n in zip(preds, valid_counts)
        ]
        agg = aggregate_metrics(
            metric_list, n_total, self.config.get("task", ""), key_prefix
        )
        if preds and isinstance(preds[0], dict):
            prediction = {
                k: np.concatenate([p[k] for p in preds]) for k in preds[0]
            }
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

    def fit(
        self,
        state: TrainState,
        train_batcher: Batcher,
        valid_batcher: Optional[Batcher] = None,
        fold: Optional[int] = None,
        log: Callable[[str], None] = print,
    ):
        """Epoch loop with validation / early stopping / checkpoints
        (reference: kgcn/core.py:211-370)."""
        cfg = self.config
        epochs = int(cfg.get("epoch", 50))
        patience = int(cfg.get("patience", 0))
        save_interval = int(cfg.get("save_interval", 10) or 0)
        model_dir = cfg.get("save_model_path") or "model"
        task = cfg.get("task", "multitask_classification")

        if str(cfg.get("early_stopping", "")) == "multitask":
            es = EarlyStoppingMultiTask(patience, task)
        else:
            es = EarlyStopping(patience, task)
        if valid_batcher is not None and hasattr(valid_batcher, "batch_valid_counts"):
            if _cache_fits(valid_batcher):
                valid_batcher = CachedBatches(valid_batcher)
        # resume carries the checkpointed best validation cost forward so a
        # resumed run cannot overwrite a genuinely better best.ckpt with a
        # worse model (restore() stashes it)
        best_cost = float(getattr(self, "_restored_best_cost", np.inf))
        self._restored_best_cost = np.inf
        best_epoch = -1
        aborted = False
        history: List[Dict[str, Any]] = []
        t0 = time.time()

        start_epoch = int(getattr(state, "epoch", 0) or 0)
        last_epoch = start_epoch - 1  # last successfully completed epoch
        for epoch in range(start_epoch, epochs):
            state, train_cost, train_metrics, n_train = self.run_epoch(
                state, train_batcher, shuffle=cfg.get("shuffle_data", True),
                epoch=epoch,
            )
            if not np.isfinite(train_cost):
                log(f"[abort] non-finite training cost at epoch {epoch}")
                aborted = True
                break
            last_epoch = epoch
            train_agg = aggregate_metrics(train_metrics, n_train, task, "training_")

            row = {"epoch": epoch, "training_cost": train_cost}
            if train_agg:
                row.update(
                    {
                        k: v
                        for k, v in train_agg.items()
                        if np.asarray(v).ndim == 0
                    }
                )
            valid_cost = None
            if valid_batcher is not None and valid_batcher.ds.num > 0:
                ev = self.evaluate(state, valid_batcher, "validation_")
                valid_cost = ev["cost"]
                row["validation_cost"] = valid_cost
                row.update(
                    {
                        k: float(np.asarray(v))
                        for k, v in ev["metrics"].items()
                        if np.asarray(v).ndim == 0
                    }
                )
                if valid_cost < best_cost:
                    best_cost = valid_cost
                    best_epoch = epoch
                    ckpt.save_checkpoint(
                        ckpt.ckpt_name(model_dir, "best", fold),
                        self.state_tree(state, epoch, best_cost),
                    )
            history.append(row)

            save_path = None
            if save_interval and (epoch + 1) % save_interval == 0:
                save_path = ckpt.save_checkpoint(
                    ckpt.ckpt_name(model_dir, f"{epoch + 1:05d}", fold),
                    self.state_tree(state, epoch, best_cost),
                )

            acc_bit = ""
            if "training_accuracy" in row:
                acc_bit = f" (acc={row['training_accuracy']:.4g})"
            if isinstance(es, EarlyStoppingMultiTask):
                acc_bit += es.each_bit(train_agg, "training_each_accuracy")
            v_bit = ""
            if valid_cost is not None:
                vacc = row.get("validation_accuracy")
                v_bit = f", validation cost {valid_cost:.6g}" + (
                    f" (acc={vacc:.4g})" if vacc is not None else ""
                )
                if isinstance(es, EarlyStoppingMultiTask):
                    v_bit += es.each_bit(
                        ev["metrics"], "validation_each_accuracy"
                    )
            s_bit = f" ([SAVE] {save_path})" if save_path else ""
            # update the early-stopping counter BEFORE logging so the
            # printed count reflects this epoch's outcome (matches the
            # reference's ordering, kgcn/core.py)
            stop = valid_cost is not None and es.update(valid_cost)
            log(
                f"epoch {epoch}, training cost {train_cost:.6g}{acc_bit}"
                f"{v_bit} (count={es.count}){s_bit}"
            )
            if stop:
                log("[stop] by validation")
                break

        # the 'last' checkpoint records the FINAL training state at the last
        # completed epoch — captured BEFORE the best-restore below, so a
        # resume continues the true trajectory (best-epoch params paired
        # with final opt_state never existed in training).  After a NaN
        # abort the final state is poisoned: skip the save (any interval/
        # best checkpoints on disk stay usable) unless a finite best exists.
        last_tree = self.state_tree(state, last_epoch, best_cost)

        # restore best before final eval (reference: kgcn/core.py:340-356)
        if best_epoch >= 0:
            tree = ckpt.load_checkpoint(
                ckpt.ckpt_name(model_dir, "best", fold),
                self.state_tree(state, 0, 0.0),
            )
            state = state.replace(
                params=tree["params"], batch_stats=tree["batch_stats"]
            )
            log(f"[restore] best epoch {best_epoch} (cost {best_cost:.6g})")
            if aborted:
                # final opt_state/rng are NaN-poisoned — the best
                # checkpoint's FULL (consistent, finite) tree is the only
                # resumable state
                last_tree = tree
        if aborted and best_epoch < 0:
            log("[abort] skipping the 'last' checkpoint (non-finite state); "
                "resume from an interval/best checkpoint instead")
        else:
            ckpt.save_checkpoint(
                ckpt.ckpt_name(model_dir, "last", fold), last_tree
            )
        return state, {
            "history": history,
            "best_epoch": best_epoch,
            "best_validation_cost": None if best_epoch < 0 else float(best_cost),
            "training_time": time.time() - t0,
        }

    def state_tree(self, state: TrainState, epoch: int, best_cost: float):
        return {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
            "rng": state.rng,
            "epoch": np.int32(epoch),
            "best_cost": np.float32(best_cost),
        }

    def restore(self, state: TrainState, path: str) -> TrainState:
        tree = ckpt.load_checkpoint(path, self.state_tree(state, 0, 0.0))
        # carry the checkpointed best validation cost into the next fit()
        # so a resumed run cannot overwrite a better best.ckpt
        self._restored_best_cost = float(
            np.asarray(tree.get("best_cost", np.inf))
        )
        return state.replace(
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"],
            step=jnp.asarray(tree["step"]),
            rng=jnp.asarray(tree["rng"]),
            # resume AFTER the saved epoch; combined with the (seed, epoch)
            # deterministic shuffle this replays the exact data order
            epoch=int(tree.get("epoch", -1)) + 1,
        )
