"""``kgcn-tpu-sparse`` — TFRecord streaming sparse-GCN engine.

Reference: task_sparse_gcn.py (``kgcn-sparse``): train / train_cv / infer over
TFRecord shards with a tasks.txt task list, deterministic %-fold splits
(task_sparse_gcn.py:248-268), accuracy + top-k eval.
"""
from __future__ import annotations

import argparse
import glob as globmod
import json
import os
import time

import numpy as np


def _load(config, test=False):
    from kgcn_tpu.data.tfrecord import load_tfrecord_dataset

    pattern = config["test_dataset" if test else "dataset"]
    paths = sorted(globmod.glob(pattern))
    if not paths:
        raise FileNotFoundError(f"no tfrecords match {pattern}")
    ds, info = load_tfrecord_dataset(paths, config)
    # spmm_backend "auto" → dense/tiled/stream/xla from the dataset shape
    from kgcn_tpu.runtime.backend import resolve_and_apply

    resolve_and_apply(config, info)
    return ds, info


def _model(config, info):
    from kgcn_tpu.models.sparse import SparseGCN

    return SparseGCN(
        channels=info.adj_channel_num,
        num_classes=int(config["num_classes"]),
        out_dims=tuple(config.get("out_dims", (256, 256, 256))),
        dense_dim=int(config.get("dense_dim", 256)),
        batch_normalize=bool(config.get("batch_normalize", True)),
    )


def split_fold(n: int, fold: int, num_folds: int):
    """Deterministic modulo split (reference: split_dataset enumerate+filter,
    task_sparse_gcn.py:248-268): example i goes to fold i % num_folds."""
    idx = np.arange(n)
    valid = idx[idx % num_folds == fold]
    train = idx[idx % num_folds != fold]
    return train, valid


def cmd_train(config, fold: int = 0):
    from kgcn_tpu.data import Batcher
    from kgcn_tpu.runtime.metrics import aggregate_metrics
    from kgcn_tpu.runtime.train import Trainer

    ds, info = _load(config)
    num_folds = int(config.get("num_folds", 5))
    tr_idx, va_idx = split_fold(ds.num, fold, num_folds)
    train_ds, valid_ds = ds.subset(tr_idx), ds.subset(va_idx)
    model = _model(config, info)
    bs = int(config["batch_size"])
    seed = int(config.get("seed", 0))
    from kgcn_tpu.cli.main import _maybe_resident

    if config.get("mesh"):
        # data-parallel over a device mesh (batch_size is PER DEVICE) —
        # the reaction workload's scale-out path
        import jax

        from kgcn_tpu.parallel.dp import (
            DPTrainer,
            ShardedBatcher,
            ShardedResidentBatcher,
        )
        from kgcn_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dict(config["mesh"]))
        n_shards = mesh.shape.get("data", len(jax.devices()))
        trainer = DPTrainer(model, config, info, mesh=mesh)
        rb = _maybe_resident(config, train_ds, info, bs, seed=seed)
        tb = (
            ShardedResidentBatcher(rb, n_shards)
            if rb is not None
            else ShardedBatcher(Batcher(train_ds, info, bs, seed=seed),
                                n_shards)
        )
        vb = ShardedBatcher(Batcher(valid_ds, info, bs), n_shards)
        init_batch = tb.make_batch(
            np.arange(min(bs * n_shards, train_ds.num))
        )
    else:
        trainer = Trainer(model, config, info)
        tb = _maybe_resident(config, train_ds, info, bs, seed=seed)
        if tb is None:
            tb = Batcher(train_ds, info, bs, seed=seed)
        vb = Batcher(valid_ds, info, bs)
        init_batch = tb.make_batch(np.arange(min(bs, train_ds.num)))
    state = trainer.init_state(init_batch, seed=seed)
    t0 = time.time()
    state, fit_info = trainer.fit(state, tb, vb, fold=fold)
    print(f"training time: {time.time() - t0}[sec]")
    ev = trainer.evaluate(state, vb, "valid_")
    _report(config, ev, "valid")
    return state, trainer, info, ev


def _report(config, ev, tag):
    m = {k: float(np.asarray(v)) for k, v in ev["metrics"].items()
         if np.asarray(v).ndim == 0}
    n = max(ev["num"], 1)
    out = {f"{tag}_cost": ev["cost"]}
    for key, v in m.items():
        # top-k hit counters etc. — but NOT the bare aggregated '{tag}_count'
        # (pad sum), whose ratio is always a meaningless 1.0
        if (key.endswith("_count") and not key.endswith("correct_count")
                and key != f"{tag}_count"):
            out[key.replace("_count", "")] = v / n
    if f"{tag}_accuracy" in m:
        out[f"{tag}_accuracy"] = m[f"{tag}_accuracy"]
    print(json.dumps(out))
    path = config.get(f"save_info_{tag}")
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        print(f"[SAVE] {path}")
    return out


def cmd_infer(config):
    from kgcn_tpu.data import Batcher
    from kgcn_tpu.runtime.train import Trainer

    ds, info = _load(config, test=True)
    model = _model(config, info)
    trainer = Trainer(model, config, info)
    bs = int(config["batch_size"])
    b = Batcher(ds, info, bs)
    state = trainer.init_state(b.make_batch(np.arange(min(bs, ds.num))), seed=0)
    path = config.get("load_model") or os.path.join(
        config.get("save_model_path", "model"), "model.0.best.ckpt"
    )
    state = trainer.restore(state, path)
    print(f"[LOAD] {path}")
    ev = trainer.evaluate(state, b, "test_")
    _report(config, ev, "test")
    if config.get("prediction_output"):
        import joblib

        joblib.dump(ev["prediction"], config["prediction_output"])
        print(f"[SAVE] {config['prediction_output']}")
    return ev


def main(argv=None):
    p = argparse.ArgumentParser(prog="kgcn-tpu-sparse")
    p.add_argument("mode", choices=["train", "train_cv", "infer"])
    p.add_argument("--config", required=True)
    p.add_argument("--fold", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    from kgcn_tpu.runtime.config import load_config

    config = load_config(args.config)
    from kgcn_tpu.runtime.jax_setup import setup_jax

    setup_jax(config, cpu=args.cpu)
    if "tasks_file" in config and os.path.exists(config["tasks_file"]):
        with open(config["tasks_file"]) as f:
            config["task_names"] = [line.strip() for line in f if line.strip()]
    if args.mode == "train":
        cmd_train(config, fold=args.fold)
    elif args.mode == "train_cv":
        num_folds = int(config.get("num_folds", 5))
        # fold-parallel path (parallel/cv.py): the reaction CV protocol is
        # the reference's canonical shell-parallel workload
        # (script_cv/02run_fold.sh) — here all folds share one SPMD program
        from kgcn_tpu.parallel.cv import (
            FoldParallelCV, fold_parallel_enabled, fold_parallel_plausible,
        )

        # cheap pre-gate before paying a full dataset load: the sequential
        # fallback reloads per fold inside cmd_train, so an eager _load
        # here would be pure waste when fold-parallel cannot engage
        parallel = False
        if fold_parallel_plausible(config):
            ds, info = _load(config)
            folds = [split_fold(ds.num, f, num_folds)
                     for f in range(num_folds)]
            parallel = fold_parallel_enabled(config, ds, info, num_folds)
        if parallel:
            from kgcn_tpu.data import Batcher

            print(f"[fold_parallel] {num_folds} folds over the mesh")
            cv = FoldParallelCV(config, info, ds, folds,
                                model=_model(config, info))
            results = cv.run()
            for fold, (trainer, state, _fi) in enumerate(results):
                print(f"=== fold {fold} ===")
                vb = Batcher(ds.subset(folds[fold][1]), info,
                             int(config["batch_size"]))
                ev = trainer.evaluate(state, vb, "valid_")
                _report(config, ev, "valid")
        else:
            for fold in range(num_folds):
                print(f"=== fold {fold} ===")
                cmd_train(config, fold=fold)
    else:
        cmd_infer(config)


if __name__ == "__main__":
    main()
