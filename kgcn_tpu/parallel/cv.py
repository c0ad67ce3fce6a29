"""Fold-parallel cross-validation: one CV fold per mesh device.

The reference's ONLY fold parallelism is shell-level per-fold processes
(/root/reference/sample_chem/compound-protein_interaction/run.sh:9-14,
/root/reference/script_cv/02run_fold.sh) — on a multi-chip system that
leaves every other chip idle for the whole CV protocol.  SURVEY §2.11 names
"embarrassingly-parallel CV folds mapped to pod slices" as the cheap win to
keep; this module is that win as ONE SPMD program:

* the full dataset is device-resident and **replicated** (CV datasets are
  small by construction — they must fit k-fold resampling);
* per-fold train states and per-epoch schedules are stacked on a leading
  ``fold`` axis **sharded** over a ``fold`` mesh axis;
* each epoch is one jit dispatch: ``vmap`` of the scanned train step over
  the fold axis — under GSPMD every device executes exactly its own fold's
  scan, so k folds cost the wall-clock of one (plus the replicated upload);
* per-epoch validation on each fold's held-out split rides the same
  dispatch pattern (vmapped eval scan).

Early stopping is per-fold control flow, kept OUTSIDE the compiled epoch:
the epoch loop is host-driven, so a stopped fold simply gets an all-invalid
(zero ``valid``) train schedule from its stop epoch on — the padded-dead-
step machinery in the scan body already makes those steps true no-ops —
while its held-out eval keeps running unchanged (frozen params → constant
cost → never a new best).  Stop decisions use the exact sequential
``EarlyStopping`` objects, one per fold.
More folds than devices run in groups of ``len(devices)``.

Multi-process (``kgcn-tpu-launch`` / multi-host pods): the fold mesh spans
every process's devices; per-fold states and schedules become fold-sharded
global arrays (each process contributes its own folds' rows), the dataset
is replicated across the mesh, and host fetches ride
``mesh.host_view`` — exercised for real in tests/test_multiprocess.py.
"""
from __future__ import annotations

import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from kgcn_tpu.runtime.metrics import aggregate_metrics


def fold_parallel_flag(config) -> str:
    flag = config.get("fold_parallel", "auto")
    if flag in (False, "false", "off", 0, "0"):
        return "off"
    if flag in (True, "true", "force", 1, "1"):
        return "force"
    return "auto"


def fold_parallel_enabled(config, ds, info, n_folds: int) -> bool:
    """Gate: explicit off wins; auto requires >1 device, a resident-capable
    dataset, and no DP mesh config (early stopping IS supported — per-fold
    stop masking inside the vmapped epoch)."""
    flag = fold_parallel_flag(config)
    if flag == "off":
        return False
    from kgcn_tpu.runtime.resident import resident_enabled

    if config.get("retrain"):
        # resume is a per-fold sequential-protocol feature (_fit_once
        # restores the checkpoint before fit); the parallel path would
        # silently restart from scratch — fall back
        if flag == "force":
            print("[fold_parallel] retrain (resume) set; sequential")
        return False
    if not resident_enabled(config, ds, info):
        if flag == "force":
            print("[fold_parallel] dataset not device-resident; sequential")
        return False
    if flag == "force":
        if config.get("mesh"):
            # visible protocol change, like the retrain/resident notices:
            # the fold axis takes the whole device set; a DP mesh config
            # cannot compose with it and is ignored
            print("[fold_parallel] forced; the 'mesh' (data-parallel) "
                  "config is ignored on the fold-parallel path")
        return True
    return (
        len(jax.devices()) > 1
        and n_folds > 1
        and not config.get("mesh")
    )


def fold_parallel_plausible(config) -> bool:
    """Cheap config-only pre-gate: can ``fold_parallel_enabled`` possibly
    return True?  Lets callers (cli/sparse.py train_cv) skip an eager
    dataset load when the answer is already no — kept HERE next to the real
    gate so the two conditions cannot drift apart."""
    flag = fold_parallel_flag(config)
    if flag == "off" or config.get("retrain"):
        return False
    return flag == "force" or (
        len(jax.devices()) > 1 and not config.get("mesh")
    )


def _stack(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _unstack(tree, i):
    return jax.tree_util.tree_map(lambda x: x[i], tree)


class FoldParallelCV:
    """Train every fold of a k-fold split concurrently over the devices.

    ``run()`` returns, per fold, ``(trainer, state, fit_info)`` with the same
    ``fit_info`` schema as ``Trainer.fit`` (history rows, training_time) so
    ``cmd_train_cv`` consumes either path identically.
    """

    def __init__(self, config: Dict[str, Any], info, ds, folds,
                 *, seed: Optional[int] = None, model=None):
        from kgcn_tpu.runtime.train import Trainer

        self.config = config
        self.info = info
        self.ds = ds
        self.folds = list(folds)
        self.k = len(self.folds)
        self.B = int(config["batch_size"])
        self.seed = int(config.get("seed", 0)) if seed is None else int(seed)
        self.epochs = int(config.get("epoch", 50))
        self.task = config.get("task", "multitask_classification")

        if model is None:
            from kgcn_tpu.models.registry import build_model

            model = build_model(config["model.py"], info, config)
        self.model = model
        self.trainer = Trainer(self.model, config, info)
        # ONE dataset upload: the ResidentBatcher both holds the device
        # dataset and builds the init sample reused by every fold group
        from kgcn_tpu.runtime.resident import ResidentBatcher

        rb = ResidentBatcher(ds, info, self.B)
        self.dd = rb.device_data
        self._init_sample = rb.make_batch(
            np.arange(min(self.B, ds.num)))

        devs = jax.devices()
        self.n_proc = jax.process_count()
        self.D = min(self.k, len(devs))
        if self.n_proc > 1:
            # each process must own whole folds (its rows of every fold-
            # sharded array, see _fold_global): round the fold axis to a
            # process multiple, capped so every process can supply its
            # share from its OWN local devices
            by_proc = [[d for d in devs if d.process_index == p]
                       for p in range(self.n_proc)]
            min_local = min(len(p) for p in by_proc)
            self.D = max(self.n_proc,
                         min((self.D // self.n_proc),
                             min_local) * self.n_proc)
            Dl = self.D // self.n_proc
            # mesh devices in process-major order: rows p*Dl:(p+1)*Dl of a
            # fold-sharded array land on process p's devices — devs[:D]
            # (global, process-0-first order) would give process 0 every
            # mesh device while other processes still contribute rows,
            # which make_array_from_process_local_data rejects
            mesh_devs = [d for p in by_proc for d in p[:Dl]]
            self.mesh = Mesh(np.asarray(mesh_devs), ("fold",))
        else:
            self.mesh = Mesh(np.asarray(devs[: self.D]), ("fold",))
        self._sh_fold = NamedSharding(self.mesh, P("fold"))
        self._sh_rep = NamedSharding(self.mesh, P())
        if self.n_proc > 1:
            # replicate the device dataset across the multi-process mesh
            # (every process holds the same host copy — CV datasets are
            # replicated by construction)
            self.dd = jax.tree_util.tree_map(
                lambda x: jax.device_put(np.asarray(x), self._sh_rep),
                self.dd,
            )
        self._epoch_fn = None
        self._eval_fn = None
        self._best_fn = None

    # --- schedules ------------------------------------------------------
    def _schedule(self, idx_list: List[np.ndarray], rngs, shuffle: bool):
        """[D, S, B] stacked schedules; folds with fewer steps pad with
        valid=0 rows (identical law to ResidentBatcher.epoch_schedule)."""
        B = self.B
        # stopped folds contribute EMPTY index lists: zero scheduled steps,
        # all-invalid rows — the scan body's dead-step masking freezes them
        S = max(max((len(ix) + B - 1) // B for ix in idx_list), 1)
        sched = np.zeros((len(idx_list), S, B), np.int32)
        valid = np.zeros((len(idx_list), S, B), np.float32)
        for f, ix in enumerate(idx_list):
            if len(ix) == 0:
                continue
            perm = rngs[f].permutation(ix) if shuffle else np.asarray(ix)
            n = len(perm)
            flat = np.zeros(S * B, np.int32)
            flat[:n] = perm
            sched[f] = flat.reshape(S, B)
            valid[f] = (np.arange(S * B) < n).astype(np.float32).reshape(S, B)
        return jnp.asarray(sched), jnp.asarray(valid)

    # --- compiled bodies ------------------------------------------------
    def _make_epoch_fn(self):
        from kgcn_tpu.runtime.resident import gather_batch

        model, tx, trainer = self.model, self.trainer.tx, self.trainer

        def loss_fn(params, batch_stats, batch, rng):
            out, updates = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch,
                train=True, rngs={"dropout": rng}, mutable=["batch_stats"],
            )
            return out.cost_opt, (out, updates.get("batch_stats", batch_stats))

        def one_fold(state, dd, sched, valid):
            def body(st, sv):
                idxb, vb = sv
                batch = trainer._cast(gather_batch(dd, idxb, vb))
                rng, sub = jax.random.split(st.rng)
                grads, (out, new_stats) = jax.grad(loss_fn, has_aux=True)(
                    st.params, st.batch_stats, batch, sub
                )
                updates, new_opt = tx.update(grads, st.opt_state, st.params)
                # padded all-invalid steps (shorter folds share the group's
                # max step count) must be TRUE no-ops: zero grads still move
                # Adam (decayed moments) and fold (0, 0) into BN running
                # stats — keep the previous state wholesale instead
                live = jnp.sum(vb) > 0

                def sel(new, old):
                    return jax.tree_util.tree_map(
                        lambda n, o: jnp.where(live, n, o), new, old
                    )

                st = st.replace(
                    params=sel(optax.apply_updates(st.params, updates),
                               st.params),
                    batch_stats=sel(new_stats, st.batch_stats),
                    opt_state=sel(new_opt, st.opt_state),
                    step=st.step + live.astype(st.step.dtype),
                    rng=jnp.where(live, rng, st.rng),
                )
                return st, (out.cost_sum, out.metrics)

            state, (costs, metrics) = jax.lax.scan(body, state, (sched, valid))
            # sum over the step axis ON DEVICE — one scalar tree per epoch
            msum = jax.tree_util.tree_map(lambda m: jnp.sum(m, axis=0), metrics)
            return state, jnp.sum(costs), msum

        def epoch_all(states, dd, sched, valid):
            return jax.vmap(one_fold, in_axes=(0, None, 0, 0))(
                states, dd, sched, valid
            )

        return jax.jit(
            epoch_all,
            in_shardings=(self._sh_fold, self._sh_rep, self._sh_fold,
                          self._sh_fold),
            donate_argnums=(0,),
        )

    def _make_eval_fn(self, with_prediction: bool):
        from kgcn_tpu.runtime.resident import gather_batch

        model, trainer = self.model, self.trainer

        def one_fold(params, batch_stats, dd, sched, valid):
            def body(_, sv):
                idxb, vb = sv
                batch = trainer._cast(gather_batch(dd, idxb, vb))
                out = model.apply(
                    {"params": params, "batch_stats": batch_stats}, batch,
                    train=False,
                )
                pred = out.prediction if with_prediction else 0
                return None, (pred, out.cost_sum, out.metrics)

            _, (preds, costs, metrics) = jax.lax.scan(
                body, None, (sched, valid)
            )
            msum = jax.tree_util.tree_map(lambda m: jnp.sum(m, axis=0), metrics)
            return preds, jnp.sum(costs), msum

        def eval_all(states, dd, sched, valid):
            return jax.vmap(one_fold, in_axes=(0, 0, None, 0, 0))(
                states.params, states.batch_stats, dd, sched, valid
            )

        return jax.jit(
            eval_all,
            in_shardings=(self._sh_fold, self._sh_rep, self._sh_fold,
                          self._sh_fold),
        )

    # --- driver ---------------------------------------------------------
    def _init_states(self, fold_ids):
        # the init sample is built once in __init__ (no per-group dataset
        # re-upload); per-fold seeds keep init parity with the sequential
        # protocol
        return [
            self.trainer.init_state(self._init_sample, seed=self.seed + f)
            for f in fold_ids
        ]

    def _fold_global(self, tree):
        """[D, ...]-stacked host/local pytree → fold-sharded global arrays.

        Single-process this is a passthrough (jit's in_shardings place the
        stack); multi-process each process contributes ONLY its own folds'
        rows via make_array_from_process_local_data.
        """
        if self.n_proc == 1:
            return tree
        Dl = self.D // self.n_proc
        pid = jax.process_index()

        def g(x):
            x = np.asarray(x)
            return jax.make_array_from_process_local_data(
                self._sh_fold, x[pid * Dl:(pid + 1) * Dl], x.shape
            )

        return jax.tree_util.tree_map(g, tree)

    def run(self, log=print) -> List[Tuple[Any, Any, Dict[str, Any]]]:
        import kgcn_tpu.runtime.checkpoint as ckpt
        from kgcn_tpu.parallel.mesh import host_view
        from kgcn_tpu.runtime.train import (EarlyStopping,
                                            EarlyStoppingMultiTask)

        results: List[Optional[Tuple[Any, Any, Dict[str, Any]]]] = (
            [None] * self.k
        )
        model_dir = self.config.get("save_model_path") or "model"
        shuffle = bool(self.config.get("shuffle_data", True))
        patience = int(self.config.get("patience", 0) or 0)
        es_multitask = (
            str(self.config.get("early_stopping", "")) == "multitask"
        )
        for g0 in range(0, self.k, self.D):
            group = list(range(g0, min(g0 + self.D, self.k)))
            real = len(group)
            # pad the group to the mesh size by repeating the last fold
            # (its duplicate results are dropped)
            fold_ids = group + [group[-1]] * (self.D - real)
            train_idx = [self.folds[f][0] for f in fold_ids]
            test_idx = [self.folds[f][1] for f in fold_ids]
            rngs = [np.random.RandomState(self.seed + f) for f in fold_ids]
            states = self._fold_global(_stack(self._init_states(fold_ids)))
            if self._epoch_fn is None:
                self._epoch_fn = self._make_epoch_fn()
                self._eval_fn = self._make_eval_fn(False)
            # per-fold early stopping: the EXACT sequential objects
            # (Trainer.fit uses one; here one per fold), applied host-side
            # between compiled epochs.  Padding duplicates never train.
            es = [
                EarlyStoppingMultiTask(patience, self.task) if es_multitask
                else EarlyStopping(patience, self.task)
                for _ in fold_ids
            ]
            stopped = [j >= real for j in range(self.D)]
            last_epochs = [self.epochs - 1] * self.D
            v_sched, v_valid = self._schedule(test_idx, rngs, shuffle=False)
            v_sched = self._fold_global(v_sched)
            v_valid = self._fold_global(v_valid)
            histories: List[List[Dict[str, Any]]] = [[] for _ in fold_ids]
            # per-fold best tracking, device-side (the sequential protocol
            # restores best-validation params before test eval,
            # Trainer.fit train.py:592-600)
            if self._best_fn is None:
                def _update_best(bst, bcost, states_, v_costs_):
                    v = v_costs_.astype(jnp.float32)
                    # strict `<` also rejects NaN epochs; carrying bcost
                    # forward via where() (NOT minimum) keeps a NaN from
                    # poisoning the comparison for all later epochs
                    improved = v < bcost

                    def pick(new, old):
                        return jax.tree_util.tree_map(
                            lambda n, o: jnp.where(
                                improved.reshape(
                                    (-1,) + (1,) * (n.ndim - 1)
                                ), n, o),
                            new, old,
                        )

                    # track the FULL state (params, BN stats, opt state,
                    # step, rng) so the best checkpoint matches what the
                    # sequential path saves at the best epoch
                    return pick(states_, bst), jnp.where(improved, v, bcost)

                self._best_fn = jax.jit(_update_best)
            # seed `best` with FRESH copies via the jitted update (a huge-
            # but-finite cost always "improves" on inf): plain aliases of
            # the init states would be invalidated by the epoch fn's buffer
            # donation
            best, best_cost_dev = self._best_fn(
                states,
                self._fold_global(np.full((self.D,), np.inf, np.float32)),
                states,
                self._fold_global(
                    np.full((self.D,), np.finfo(np.float32).max, np.float32)
                ),
            )
            best_epochs = [-1] * self.D
            best_costs_host = [np.inf] * self.D
            t0 = time.time()
            for epoch in range(self.epochs):
                sched, valid = self._schedule(
                    [ix if not stopped[j] else np.empty(0, np.int64)
                     for j, ix in enumerate(train_idx)],
                    rngs, shuffle,
                )
                states, costs, msum = self._epoch_fn(
                    states, self.dd, self._fold_global(sched),
                    self._fold_global(valid),
                )
                _, v_costs_dev, v_msum = self._eval_fn(
                    states, self.dd, v_sched, v_valid
                )
                # stopped folds' eval reruns on frozen params → constant
                # cost → strict `<` in the best update never fires for them
                best, best_cost_dev = self._best_fn(
                    best, best_cost_dev, states, v_costs_dev
                )
                costs, msum, v_costs, v_msum = host_view(
                    (costs, msum, v_costs_dev, v_msum)
                )
                for j in range(self.D):
                    if stopped[j]:
                        continue
                    n_va_j = len(test_idx[j])
                    c = float(v_costs[j]) / max(n_va_j, 1)
                    if c < best_costs_host[j]:
                        best_costs_host[j] = c
                        best_epochs[j] = epoch
                for j, f in enumerate(fold_ids[:real]):
                    if stopped[j]:
                        continue
                    n_tr, n_va = len(train_idx[j]), len(test_idx[j])
                    row = {
                        "epoch": epoch,
                        "training_cost": float(costs[j]) / max(n_tr, 1),
                        "validation_cost": float(v_costs[j]) / max(n_va, 1),
                    }
                    agg = aggregate_metrics(
                        [_unstack(msum, j)], n_tr, self.task, "training_"
                    )
                    v_agg = aggregate_metrics(
                        [_unstack(v_msum, j)], n_va, self.task, "validation_"
                    )
                    for a in (agg, v_agg):
                        if a:
                            row.update({
                                k: float(np.asarray(v))
                                for k, v in a.items()
                                if np.asarray(v).ndim == 0
                            })
                    histories[j].append(row)
                    # identical stop law to Trainer.fit: update the counter
                    # on this epoch's validation cost, stop when patience
                    # consecutive non-improvements accumulate
                    if es[j].update(row["validation_cost"]):
                        stopped[j] = True
                        last_epochs[j] = epoch
                        log(f"[stop] fold {f} by validation (epoch {epoch})")
                active = [j for j in range(real) if not stopped[j]]
                if active and histories[active[0]]:
                    head = histories[active[0]][-1]
                    log(
                        f"epoch {epoch}, folds {group[0]}-{group[-1]} "
                        f"training cost {head['training_cost']:.6g}, "
                        f"validation cost {head['validation_cost']:.6g}"
                    )
                if not active:
                    break
            wall = time.time() - t0
            states_h = host_view(states)
            best_h = host_view(best)
            for j, f in enumerate(group):
                # restore the best-validation params before test evaluation
                # (mirrors Trainer.fit's best-checkpoint restore) and write
                # the same checkpoints the sequential path produces: best =
                # the FULL state at the best epoch, last = the final state
                # with best params restored
                st = _unstack(states_h, j)
                if best_epochs[j] >= 0:
                    bj = _unstack(best_h, j)
                    st = st.replace(params=bj.params,
                                    batch_stats=bj.batch_stats)
                    ckpt.save_checkpoint(
                        ckpt.ckpt_name(model_dir, "best", f),
                        self.trainer.state_tree(bj, best_epochs[j],
                                                best_costs_host[j]),
                    )
                # one re-upload so downstream per-batch evaluation doesn't
                # transfer host numpy params on every eval step
                st = jax.tree_util.tree_map(jnp.asarray, st)
                ckpt.save_checkpoint(
                    ckpt.ckpt_name(model_dir, "last", f),
                    self.trainer.state_tree(st, last_epochs[j],
                                            best_costs_host[j]),
                )
                results[f] = (self.trainer, st, {
                    "history": histories[j],
                    "best_epoch": best_epochs[j],
                    "best_validation_cost": (
                        float(best_costs_host[j])
                        if best_epochs[j] >= 0 else None
                    ),
                    "training_time": wall,
                    "fold_parallel": self.D,
                })
        return results  # type: ignore[return-value]


def run_fold_parallel_cv(config, info, ds, folds, log=print):
    """Convenience wrapper used by ``cmd_train_cv``."""
    cv = FoldParallelCV(config, info, ds, folds)
    log(f"[fold_parallel] {cv.k} folds over {cv.D} devices "
        f"({-(-cv.k // cv.D)} group(s))")
    return cv.run(log=log)
