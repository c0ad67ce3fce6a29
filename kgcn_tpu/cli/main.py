"""``kgcn-tpu`` command-line driver.

Reference-compatible subcommands (gcn.py:780-788): ``train``, ``train_cv``,
``infer``/``predict``, ``visualize`` — same JSON config files, same
``save_info_*`` / ``save_result_*`` output schema (gcn.py:296-353,452-524),
TPU-native execution underneath.
"""
from __future__ import annotations

import argparse
import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np


class NumpyEncoder(json.JSONEncoder):
    """JSON encoder for numpy types (reference: NumPyArangeEncoder)."""

    def default(self, obj):
        if isinstance(obj, np.integer):
            return int(obj)
        if isinstance(obj, np.floating):
            return float(obj)
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        return super().default(obj)


def _save_json(path: str, payload: Dict[str, Any]) -> None:
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    print(f"[SAVE] {path}")
    with open(path, "w") as fp:
        json.dump(payload, fp, indent=4, cls=NumpyEncoder)


def save_prediction(filename: str, prediction_data) -> None:
    """CSV prediction dump (reference: gcn.py:59-81); dict-valued
    predictions (VAE-style models) go to a joblib file instead — a dict
    has no CSV row form."""
    d = os.path.dirname(filename)
    if d:
        os.makedirs(d, exist_ok=True)
    if isinstance(prediction_data, dict):
        import joblib

        base, _ = os.path.splitext(filename)
        path = base + ".jbl"
        joblib.dump(
            {k: np.asarray(v) for k, v in prediction_data.items()}, path
        )
        print(f"[SAVE] {path} (dict prediction)")
        return
    pred = np.asarray(prediction_data)
    print(f"[SAVE] {filename}")
    with open(filename, "w") as fp:
        for row in pred.reshape(len(pred), -1):
            fp.write(",".join(f"{v:.6g}" for v in row) + "\n")


def _metric_name(task: str) -> str:
    return (
        "mse"
        if task == "regression"
        else "gmfe" if task == "regression_gmfe" else "accuracy"
    )


def _prepare(config, test_mode=False, dataset_key="dataset"):
    from kgcn_tpu.data import load_jbl

    ds, info = load_jbl(config[dataset_key], config, test_mode=test_mode)
    if config.get("param"):
        param = config["param"]
        if isinstance(param, str):
            with open(param) as f:
                param = json.load(f)
        info.param = param
    # spmm_backend "auto": now that the dataset's shape is known, pick the
    # execution path (dense MXU / tiled / stream / xla) — explicit names
    # were already applied at startup and pass through unchanged
    from kgcn_tpu.runtime.backend import resolve_and_apply

    resolve_and_apply(config, info)
    return ds, info


def _make_trainer(config, info):
    from kgcn_tpu.models.registry import build_model
    from kgcn_tpu.runtime.train import Trainer

    model = build_model(config["model.py"], info, config)
    return Trainer(model, config, info)


def _maybe_resident(config, ds, info, bs, seed=0):
    """Device-resident training batcher (whole epoch = one jit dispatch)
    when the shared gate admits the dataset (kgcn_tpu/runtime/resident.py:
    ``resident_enabled``)."""
    from kgcn_tpu.runtime import resident

    try:
        if not resident.resident_enabled(config, ds, info):
            return None
        return resident.ResidentBatcher(ds, info, bs, seed=seed)
    except Exception as e:  # never let the fast path break training
        print(f"[resident] disabled ({type(e).__name__}: {e})")
        return None


def _fit_once(config, train_ds, valid_ds, info, fold: Optional[int] = None,
              seed: Optional[int] = None):
    from kgcn_tpu.data import Batcher

    mesh_cfg = config.get("mesh")
    bs = int(config["batch_size"])
    if mesh_cfg:
        # data-parallel training over a device mesh (config: {"data": N};
        # batch_size is the PER-DEVICE batch)
        import jax

        from kgcn_tpu.models.registry import build_model
        from kgcn_tpu.parallel.dp import DPTrainer, ShardedBatcher
        from kgcn_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dict(mesh_cfg))
        n_shards = mesh.shape.get("data", len(jax.devices()))
        model = build_model(config["model.py"], info, config)
        trainer = DPTrainer(model, config, info, mesh=mesh)
        rb = _maybe_resident(config, train_ds, info, bs, seed=seed or 0)
        if rb is not None:
            from kgcn_tpu.parallel.dp import ShardedResidentBatcher

            tb = ShardedResidentBatcher(rb, n_shards)
        else:
            tb = ShardedBatcher(
                Batcher(train_ds, info, bs, seed=seed or 0), n_shards
            )
        vb = (
            ShardedBatcher(Batcher(valid_ds, info, bs), n_shards)
            if valid_ds is not None and valid_ds.num > 0
            else None
        )
        state = trainer.init_state(
            tb.make_batch(np.arange(min(bs * n_shards, train_ds.num))),
            seed=seed if seed is not None else int(config.get("seed", 0)),
        )
        if config.get("retrain"):
            state = trainer.restore(state, config["retrain"])
            print(f"[LOAD] {config['retrain']}")
        state, fit_info = trainer.fit(state, tb, vb, fold=fold)
        return trainer, state, fit_info, vb

    trainer = _make_trainer(config, info)
    tb = _maybe_resident(config, train_ds, info, bs, seed=seed or 0)
    if tb is None:
        tb = Batcher(train_ds, info, bs, seed=seed or 0)
    vb = None
    if valid_ds is not None and valid_ds.num > 0:
        vb = _maybe_resident(config, valid_ds, info, bs)
        if vb is None:
            vb = Batcher(valid_ds, info, bs)
    state = trainer.init_state(tb.make_batch(np.arange(min(bs, train_ds.num))),
                               seed=seed if seed is not None else int(config.get("seed", 0)))
    if config.get("retrain"):
        state = trainer.restore(state, config["retrain"])
        print(f"[LOAD] {config['retrain']}")
    state, fit_info = trainer.fit(state, tb, vb, fold=fold)
    return trainer, state, fit_info, vb


def cmd_train_kg(config, ds, info) -> Dict[str, Any]:
    """Whole-graph link-prediction training (reference: gcn.py with
    task=link_prediction over sample_kg datasets; batch=1, label_list
    preference pairs, per-epoch negative resampling)."""
    from kgcn_tpu.models.kg import KGBatcher
    from kgcn_tpu.models.registry import build_model
    from kgcn_tpu.runtime.train import Trainer

    model_name = config.get("model.py", "kg_distmult")
    if model_name in ("model", "gcn"):
        model_name = "kg_distmult"
    if config.get("mesh"):
        return _train_kg_sharded(config, ds, info, model_name)
    model = build_model(model_name, info, config)
    trainer = Trainer(model, config, info)
    kb = KGBatcher(
        ds, info,
        label_batch_size=config.get("label_batch_size"),
        pair_mode=config.get("preference_pair_mode", "both"),
        seed=int(config.get("seed", 0)),
    )
    state = trainer.init_state(kb.init_batch(), seed=int(config.get("seed", 0)))
    t0 = time.time()
    best = {"acc": 0.0}
    for epoch in range(int(config.get("epoch", 50))):
        state, cost, metrics, _ = trainer.run_epoch(state, kb)
        tc = sum(float(m["correct_count"]) for m in metrics)
        tn = sum(float(m["count"]) for m in metrics)
        acc = tc / max(tn, 1)
        best["acc"] = max(best["acc"], acc)
        print(f"epoch {epoch}, training cost {cost:.6g} (rank acc={acc:.4g})")
    train_time = time.time() - t0
    print(f"training time: {train_time}[sec]")
    from kgcn_tpu.runtime import checkpoint as ckpt

    model_dir = config.get("save_model_path") or "model"
    ckpt.save_checkpoint(
        ckpt.ckpt_name(model_dir, "last"), trainer.state_tree(state, 0, 0.0)
    )
    result = {"train_time": train_time, "ranking_accuracy": best["acc"]}
    if config.get("save_info_train"):
        _save_json(config["save_info_train"], result)
    return result


def _save_serve_info(config, info) -> None:
    """Sidecar the serving runtime reads next to the checkpoints — the shape
    contract (head width, node padding, channels) that label-less inference
    requests cannot carry themselves (kgcn_tpu/runtime/serve.py)."""
    model_dir = config.get("save_model_path") or "model"
    payload = {
        "model.py": config.get("model.py", "gcn"),
        "task": config.get("task", ""),
        "label_dim": int(info.label_dim or 0),
        "graph_node_num": int(info.graph_node_num or 0),
        "adj_channel_num": int(info.adj_channel_num or 1),
        "feature_dim": int(getattr(info, "feature_dim", 0) or 0),
    }
    try:
        os.makedirs(model_dir, exist_ok=True)
        with open(os.path.join(model_dir, "serve_info.json"), "w") as f:
            json.dump(payload, f, indent=2)
    except OSError as e:
        print(f"[serve_info] skipped ({e})")


def _train_kg_sharded(config, ds, info, model_name: str) -> Dict[str, Any]:
    """Big-graph KG training over a device mesh (config ``mesh``): the
    embedding table + adjacency are edge-partitioned across devices
    (parallel/big_graph.py).  The checkpoint is written in the single-device
    format, so ``infer`` works unchanged."""
    import jax

    from kgcn_tpu.models.kg import KGBatcher
    from kgcn_tpu.models.registry import build_model
    from kgcn_tpu.parallel.big_graph import from_kg_dataset
    from kgcn_tpu.parallel.mesh import make_mesh
    from kgcn_tpu.runtime import checkpoint as ckpt
    from kgcn_tpu.runtime.train import Trainer

    mesh = make_mesh(dict(config["mesh"]))
    bg = from_kg_dataset(ds, info, config, mesh)
    state = bg.init_state(seed=int(config.get("seed", 0)))
    if config.get("retrain"):
        state = bg.restore(config["retrain"], state)
        print(f"[LOAD] {config['retrain']}")
    ll = np.asarray(ds.label_list[0], np.int32)
    t0 = time.time()
    from kgcn_tpu.runtime.resident import resident_flag

    if resident_flag(config) != "off" and not config.get("label_batch_size"):
        # whole-run-in-one-dispatch path: in-kernel negative sampling,
        # epochs scanned on device (fit_resident)
        state, history = bg.fit_resident(
            state, ll,
            epochs=int(config.get("epoch", 50)),
            pair_mode=config.get("preference_pair_mode", "both"),
            seed=int(config.get("seed", 0)),
        )
    else:
        state, history = bg.fit(
            state, ll,
            epochs=int(config.get("epoch", 50)),
            pair_mode=config.get("preference_pair_mode", "both"),
            seed=int(config.get("seed", 0)),
            label_batch_size=config.get("label_batch_size"),
        )
    train_time = time.time() - t0
    for rec in history:
        print(
            f"epoch {rec['epoch']}, training cost {rec['train_cost']:.6g} "
            f"(rank acc={rec['train_accuracy']:.4g})"
        )
    print(f"training time: {train_time}[sec] "
          f"({dict(mesh.shape)} mesh, {bg.strategy} halo)")

    # sharded (orbax) checkpoint: resumable without ever gathering the
    # embedding table to one host (config ``retrain`` restores it)
    model_dir = config.get("save_model_path") or "model"
    bg.save(os.path.join(model_dir, "model.big_graph.ckpt"), state)
    # also save in the single-device checkpoint format (infer restores it
    # as-is); KGLinkPredictor hardcodes 2 conv layers, so other depths get
    # only the big-graph tree above
    if bg.num_layers in (0, 2):
        model = build_model(model_name, info, config)
        trainer = Trainer(model, config, info)
        kb = KGBatcher(ds, info, seed=int(config.get("seed", 0)))
        sd_state = trainer.init_state(kb.init_batch(), seed=0)
        sd_state = sd_state.replace(
            params=bg.to_flax_variables(state)["params"]
        )
        ckpt.save_checkpoint(
            ckpt.ckpt_name(model_dir, "last"),
            trainer.state_tree(sd_state, 0, 0.0),
        )
    else:
        print(f"[ckpt] kg_layers={bg.num_layers} has no single-device "
              "equivalent; use the big-graph checkpoint for resume (infer "
              "requires kg_layers in {0, 2})")
    best = max((rec["train_accuracy"] for rec in history), default=0.0)
    result = {"train_time": train_time, "ranking_accuracy": best}
    if config.get("save_info_train"):
        _save_json(config["save_info_train"], result)
    return result


def cmd_train(config) -> Dict[str, Any]:
    from kgcn_tpu.data import split_dataset
    from kgcn_tpu.runtime.metrics import compute_metrics

    task = config.get("task", "")
    preloaded = None
    if task == "link_prediction" or config.get("with_node_embedding"):
        preloaded = _prepare(config)
        if preloaded[0].label_list is not None:
            return cmd_train_kg(config, *preloaded)
    if config.get("validation_dataset"):
        train_ds, info = preloaded if preloaded is not None else _prepare(config)
        valid_ds, valid_info = _prepare(config, dataset_key="validation_dataset")
        info.graph_node_num = max(info.graph_node_num, valid_info.graph_node_num)
        valid_ds.max_node_num = train_ds.max_node_num = max(
            train_ds.max_node_num, valid_ds.max_node_num
        )
    else:
        ds, info = preloaded if preloaded is not None else _prepare(config)
        train_ds, valid_ds, _, _ = split_dataset(
            ds, config.get("validation_data_rate", 0.3),
            seed=int(config.get("seed", 0)),
            shuffle=bool(config.get("shuffle_data", True)),
        )

    t0 = time.time()
    trainer, state, fit_info, vb = _fit_once(config, train_ds, valid_ds, info)
    train_time = time.time() - t0
    print(f"training time: {train_time}[sec]")
    _save_serve_info(config, info)

    result: Dict[str, Any] = {"train_time": train_time}
    metric_name = _metric_name(task)
    if vb is not None and valid_ds.num > 0:
        t0 = time.time()
        ev = trainer.evaluate(state, vb, "validation_")
        infer_time = time.time() - t0
        valid_metrics = {
            k: v for k, v in ev["metrics"].items() if np.asarray(v).ndim <= 1
        }
        print(
            f"final cost = {ev['cost']}\n"
            f"{metric_name} = {valid_metrics.get('validation_' + metric_name)}\n"
            f"validation time: {infer_time}[sec]"
        )
        result.update(
            validation_cost=ev["cost"],
            validation_accuracy=valid_metrics,
            infer_time=infer_time,
        )
        if (
            task != "link_prediction"
            and valid_ds.labels is not None
            and valid_ds.node_label is None  # node-centric predictions have
            # per-node shape; the sklearn battery applies to graph-level tasks
        ):
            result["valid_metrics"] = compute_metrics(
                config, valid_ds.labels, ev["prediction"], valid_ds.mask_label
            )
        if config.get("save_result_valid"):
            save_prediction(config["save_result_valid"], ev["prediction"])
        if config.get("save_info_valid"):
            _save_json(config["save_info_valid"], result)

    if config.get("export_model") or config.get("export_savedmodel"):
        from kgcn_tpu.data import Batcher
        from kgcn_tpu.runtime.export import export_model, export_savedmodel

        b = Batcher(train_ds, info, int(config["batch_size"]))
        sample = b.make_batch(np.arange(min(int(config["batch_size"]), train_ds.num)))
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if config.get("export_model"):
            export_model(trainer.model, variables, sample,
                         config["export_model"])
        if config.get("export_savedmodel"):
            # TF-consumable artifact (reference: frozen GraphDef /
            # BestExporter SavedModel)
            export_savedmodel(trainer.model, variables, sample,
                              config["export_savedmodel"])

    if config.get("save_info_train"):
        hist = fit_info["history"]
        payload = {
            "training_cost": [h["training_cost"] for h in hist],
            "validation_cost": [h.get("validation_cost") for h in hist],
            "training_acc": [h.get("training_accuracy") for h in hist],
            "validation_acc": [h.get("validation_accuracy") for h in hist],
            "train_time": train_time,
        }
        _save_json(config["save_info_train"], payload)
    if config.get("make_plot"):
        from kgcn_tpu.tools import plots

        plots.plot_cost(config, fit_info["history"])
        if vb is not None and valid_ds.labels is not None and task not in (
            "regression", "regression_gmfe", "link_prediction"
        ):
            plots.plot_auc(config, valid_ds.labels, np.array(ev["prediction"]),
                           mask_label=valid_ds.mask_label)
    return result


def cmd_train_cv(config) -> Dict[str, Any]:
    """K-fold CV (reference: gcn.py:355-524)."""
    from kgcn_tpu.data import kfold_indices
    from kgcn_tpu.runtime.metrics import compute_metrics

    ds, info = _prepare(config)
    k = int(config.get("k-fold_num", 2))
    strat = None
    if config.get("stratified_kfold") and ds.labels is not None:
        strat = np.argmax(ds.labels, axis=1)
    folds = kfold_indices(ds.num, k, seed=int(config.get("seed", 0)), stratify=strat)

    # fold-parallel path: all folds trained concurrently, one per mesh
    # device (parallel/cv.py; config fold_parallel: auto|true|false) —
    # the per-fold evaluation below is shared with the sequential path
    from kgcn_tpu.parallel.cv import fold_parallel_enabled, run_fold_parallel_cv

    parallel = None
    if fold_parallel_enabled(config, ds, info, k):
        parallel = run_fold_parallel_cv(config, info, ds, folds)

    fold_results = []
    metric_name = _metric_name(config.get("task", ""))
    for fold, (train_idx, test_idx) in enumerate(folds):
        print(f"[fold {fold}] train={len(train_idx)} test={len(test_idx)}")
        train_ds = ds.subset(train_idx)
        test_ds = ds.subset(test_idx)
        if parallel is not None:
            trainer, state, fit_info = parallel[fold]
        else:
            trainer, state, fit_info, _ = _fit_once(
                config, train_ds, test_ds, info, fold=fold,
                seed=int(config.get("seed", 0)) + fold,
            )
        from kgcn_tpu.data import Batcher

        test_b = Batcher(test_ds, info, int(config["batch_size"]))
        if config.get("mesh"):
            # DPTrainer's shard_mapped eval needs [D, ...]-stacked batches
            from kgcn_tpu.parallel.dp import ShardedBatcher

            test_b = ShardedBatcher(test_b, trainer.mesh.shape["data"])
        ev = trainer.evaluate(state, test_b, "test_")
        entry = {
            "fold": fold,
            "test_cost": ev["cost"],
            f"test_{metric_name}": float(
                np.asarray(ev["metrics"].get(f"test_{metric_name}", np.nan)).mean()
            ),
        }
        if (config.get("task") != "link_prediction"
                and test_ds.labels is not None
                and test_ds.node_label is None):
            entry["test_metrics"] = compute_metrics(
                config, test_ds.labels, ev["prediction"], test_ds.mask_label
            )
        fold_results.append(entry)
        if config.get("save_result_test"):
            base, ext = os.path.splitext(config["save_result_test"])
            save_prediction(f"{base}.fold{fold}{ext}", ev["prediction"])

    accs = [r.get(f"test_{metric_name}", np.nan) for r in fold_results]
    summary = {
        "folds": fold_results,
        f"mean_{metric_name}": float(np.nanmean(accs)),
        f"std_{metric_name}": float(np.nanstd(accs)),
    }
    print(f"cv {metric_name}: mean={summary[f'mean_{metric_name}']:.4f} "
          f"std={summary[f'std_{metric_name}']:.4f}")
    if config.get("save_info_cv"):
        _save_json(config["save_info_cv"], summary)
    if config.get("save_result_cv"):
        _save_json(config["save_result_cv"], summary)
    return summary


def cmd_infer_kg(config, ds, info) -> Dict[str, Any]:
    """KG link-prediction inference: ranking accuracy on the held-out triple
    list + per-edge score extraction (reference: gcn.py:581-611 edge-score
    extraction, left_pred all-entity scoring)."""
    import jax
    import numpy as np

    from kgcn_tpu.models.kg import KGBatcher
    from kgcn_tpu.models.registry import build_model
    from kgcn_tpu.runtime.train import Trainer

    model_name = config.get("model.py", "kg_distmult")
    if model_name in ("model", "gcn"):
        model_name = "kg_distmult"
    model = build_model(model_name, info, config)
    trainer = Trainer(model, config, info)
    kb = KGBatcher(ds, info, label_batch_size=config.get("label_batch_size"),
                   seed=0, test=True)
    # init_batch: one shape-complete carrier — batches() would materialise
    # the whole epoch's label slices just to grab the graph
    batch = kb.init_batch()
    state = trainer.init_state(batch, seed=0)
    load_path = config.get("load_model") or os.path.join(
        config.get("save_model_path", "model"), "model.last.ckpt"
    )
    state = trainer.restore(state, load_path)
    print(f"[LOAD] {load_path}")
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    triples = kb.label_list
    heads, rels, tails = triples[:, 0], triples[:, 1], triples[:, 2]
    scores = np.asarray(
        model.apply(variables, batch, jax.numpy.asarray(tails),
                    jax.numpy.asarray(rels), method=model.left_prediction)
    )  # [K, V_padded]: score of every entity as head
    # the node axis is lane-padded past the true entity count; phantom rows
    # carry zeroed embeddings (score exactly 0) and would outrank any
    # negatively-scored true head — rank over real entities only
    scores = scores[:, : int(info.all_node_num)]
    true_scores = scores[np.arange(len(heads)), heads]
    ranks = (scores > true_scores[:, None]).sum(axis=1) + 1
    result = {
        "mean_rank": float(ranks.mean()),
        "mrr": float((1.0 / ranks).mean()),
        "hits@1": float((ranks <= 1).mean()),
        "hits@10": float((ranks <= 10).mean()),
        "num_test_triples": int(len(triples)),
    }
    print(json.dumps(result))
    out_path = config.get("save_edge_result") or config.get("save_result_test")
    if out_path:
        d = os.path.dirname(out_path)
        if d:
            os.makedirs(d, exist_ok=True)
        with open(out_path, "w") as f:
            f.write("head,relation,tail,score,head_rank\n")
            for h, r, t, s, rk in zip(heads, rels, tails, true_scores, ranks):
                f.write(f"{h},{r},{t},{s:.6g},{rk}\n")
        print(f"[SAVE] {out_path}")
    if config.get("save_info_test"):
        _save_json(config["save_info_test"], result)
    return result


def cmd_infer(config) -> Dict[str, Any]:
    """Inference with a restored checkpoint (reference: gcn.py:527-621)."""
    from kgcn_tpu.data import Batcher
    from kgcn_tpu.runtime.metrics import compute_metrics

    ds, info = _prepare(config, test_mode=True)
    if ds.label_list is not None and (
        config.get("task") == "link_prediction"
        or config.get("with_node_embedding")
    ):
        return cmd_infer_kg(config, ds, info)
    trainer = _make_trainer(config, info)
    bs = int(config["batch_size"])
    b = _maybe_resident(config, ds, info, bs)
    if b is None:
        b = Batcher(ds, info, bs)
    state = trainer.init_state(b.make_batch(np.arange(min(bs, ds.num))), seed=0)
    load_path = config.get("load_model") or os.path.join(
        config.get("save_model_path", "model"), "model.best.ckpt"
    )
    if not os.path.exists(load_path):
        alt = os.path.join(config.get("save_model_path", "model"), "model.last.ckpt")
        if os.path.exists(alt):
            load_path = alt
    state = trainer.restore(state, load_path)
    print(f"[LOAD] {load_path}")

    t0 = time.time()
    ev = trainer.evaluate(state, b, "test_")
    infer_time = time.time() - t0
    print(f"infer time: {infer_time}[sec]")
    result: Dict[str, Any] = {"infer_time": infer_time, "test_cost": ev["cost"]}
    result["test_metrics_protocol"] = {
        k: np.asarray(v).tolist() for k, v in ev["metrics"].items()
    }
    if (ds.labels is not None and config.get("task") != "link_prediction"
            and ds.node_label is None):
        result["test_metrics"] = compute_metrics(
            config, ds.labels, ev["prediction"], ds.mask_label
        )
    if config.get("save_result_test"):
        save_prediction(config["save_result_test"], ev["prediction"])
    if config.get("save_info_test"):
        _save_json(config["save_info_test"], result)
    if config.get("prediction_data") or config.get("save_prediction_data"):
        import joblib

        path = config.get("prediction_data") or config.get("save_prediction_data")
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        joblib.dump(ev["prediction"], path)
        print(f"[SAVE] {path}")
    return result


def cmd_visualize(config) -> None:
    """Integrated-gradients visualisation (reference: gcn.py:637-657):
    ``visualize_type: graph`` (default for graph tasks) runs compound IG;
    KG mode (``task: link_prediction`` or an edge ``visualize_type``) runs
    the knowledge-graph embedding-IG visualizer."""
    vt = str(config.get("visualize_type", "graph") or "graph")
    # mirror the TRAIN dispatch (cmd_train line ~310): node-embedding
    # whole-graph configs are KG runs even without an explicit task key —
    # but only when the dataset actually carries KG triples (cmd_train's
    # own guard), else they are embedding-mode graph tasks
    kg_route = config.get("task") == "link_prediction" or vt.startswith("edge")
    raw = None
    if not kg_route and config.get("with_node_embedding"):
        import joblib

        raw = joblib.load(config["dataset"])
        kg_route = isinstance(raw, dict) and raw.get("label_list") is not None
    if kg_route:
        from kgcn_tpu.explain.kg_ig import run_kg_visualization

        # pass the probed dict through so multi-GB datasets load once
        run_kg_visualization(config, raw=raw)
        return
    from kgcn_tpu.explain.ig import run_visualization

    run_visualization(config)


def build_argparser():
    p = argparse.ArgumentParser(prog="kgcn-tpu", description=__doc__)
    p.add_argument("mode", choices=["train", "train_cv", "infer", "predict",
                                    "visualize"])
    p.add_argument("--config", default=None, help="JSON config file")
    p.add_argument("--save-config", default=None, help="dump merged config")
    p.add_argument("--dataset", default=None)
    p.add_argument("--model", default=None, help="model registry name")
    p.add_argument("--epoch", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--learning-rate", type=float, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax profiler trace of one epoch")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    from kgcn_tpu.runtime.config import load_config, save_config

    overrides = {
        "dataset": args.dataset,
        "model.py": args.model,
        "epoch": args.epoch,
        "batch_size": args.batch_size,
        "learning_rate": args.learning_rate,
        "seed": args.seed,
    }
    if args.profile:
        overrides["profile"] = True
    config = load_config(args.config, overrides)
    if args.save_config:
        save_config(config, args.save_config)
    from kgcn_tpu.runtime.jax_setup import setup_jax

    setup_jax(config, cpu=args.cpu)

    import jax

    # sanitizer / determinism switches (SURVEY §5 "race detection"):
    # debug_nan traps the first non-finite value inside jit;
    # precision maps to the TPU matmul precision knob
    # (bfloat16 = fastest MXU path, float32/highest = full precision).
    if config.get("debug_nan"):
        jax.config.update("jax_debug_nans", True)
    backend = str(config.get("spmm_backend", "auto"))
    if backend != "auto":
        from kgcn_tpu.runtime.backend import apply_backend

        apply_backend(backend, config)
    # "auto" resolves once the dataset's shape is known (_prepare →
    # runtime/backend.resolve_and_apply)
    precision = str(config.get("precision", "float32"))
    if precision in ("bfloat16", "default"):
        jax.config.update("jax_default_matmul_precision", "default")
    elif precision in ("float32", "highest"):
        jax.config.update("jax_default_matmul_precision", "highest")
    if config.get("deterministic"):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_gpu_deterministic_ops=true"
        ).strip()

    prof_dir = None
    if config.get("profile"):
        import jax

        prof_dir = config.get("profile_dir", "logs/jax_trace")
        os.makedirs(prof_dir, exist_ok=True)
        jax.profiler.start_trace(prof_dir)
        print(f"[PROFILE] tracing to {prof_dir}")

    try:
        if args.mode == "train":
            cmd_train(config)
        elif args.mode == "train_cv":
            cmd_train_cv(config)
        elif args.mode in ("infer", "predict"):
            cmd_infer(config)
        elif args.mode == "visualize":
            cmd_visualize(config)
    finally:
        if prof_dir:
            import jax

            jax.profiler.stop_trace()
            print(f"[PROFILE] trace written to {prof_dir}")


if __name__ == "__main__":
    main()
