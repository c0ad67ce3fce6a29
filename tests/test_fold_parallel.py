"""Fold-parallel CV (parallel/cv.py): k folds trained concurrently over the
8-device CPU mesh, matching the sequential protocol's results.

Reference for the protocol being parallelised: the reference's shell-level
per-fold processes (sample_chem/compound-protein_interaction/run.sh:9-14).
"""
import json
import subprocess
import sys
import time

import numpy as np
import pytest

from kgcn_tpu.data import build_dataset, kfold_indices
from kgcn_tpu.data.synthetic import make_random_graphs
from kgcn_tpu.runtime.config import default_config


def _cfg(**kw):
    cfg = default_config()
    cfg.update({
        "task": "classification", "learning_rate": 1e-2, "batch_size": 16,
        "epoch": 4, "model.py": "gcn", "seed": 0,
    })
    cfg.update(kw)
    return cfg


def _dataset(n=96, N=12, F=8, seed=0):
    cfg = _cfg()
    data = make_random_graphs(n, N, F, avg_degree=4, seed=seed)
    return build_dataset(data, cfg), cfg


def test_fold_parallel_gate():
    from kgcn_tpu.parallel.cv import fold_parallel_enabled

    (ds, info), cfg = _dataset()
    assert fold_parallel_enabled(cfg, ds, info, 4)
    assert not fold_parallel_enabled({**cfg, "fold_parallel": False}, ds, info, 4)
    # early stopping is supported on the parallel path (round 5)
    assert fold_parallel_enabled({**cfg, "patience": 3}, ds, info, 4)
    assert not fold_parallel_enabled({**cfg, "mesh": {"data": 2}}, ds, info, 4)
    assert not fold_parallel_enabled(cfg, ds, info, 1)


def test_fold_parallel_trains_all_folds():
    """4 folds over the mesh: every fold learns, states are distinct, and
    the history schema matches Trainer.fit's."""
    from kgcn_tpu.parallel.cv import FoldParallelCV

    (ds, info), cfg = _dataset()
    folds = kfold_indices(ds.num, 4, seed=0)
    cv = FoldParallelCV(cfg, info, ds, folds)
    assert cv.D == 4
    results = cv.run(log=lambda *_: None)
    assert len(results) == 4
    p0 = None
    for trainer, state, fit_info in results:
        hist = fit_info["history"]
        assert len(hist) == cfg["epoch"]
        assert {"epoch", "training_cost", "validation_cost"} <= set(hist[0])
        # the model must actually learn within each fold
        assert hist[-1]["training_cost"] < hist[0]["training_cost"]
        leaf = np.asarray(
            next(iter(jax_leaves(state.params)))
        )
        if p0 is None:
            p0 = leaf
        else:
            assert not np.array_equal(p0, leaf)  # folds diverge


def jax_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def test_fold_parallel_matches_sequential_quality(tmp_path):
    """End to end through cmd_train_cv: the parallel CV path reaches the
    same quality band as the sequential one on the same jbl dataset
    (identical protocol, different but equivalent RNG streams)."""
    import joblib

    from kgcn_tpu.cli.main import cmd_train_cv
    from kgcn_tpu.data.synthetic import make_ring_dataset

    joblib.dump(make_ring_dataset(num_pairs=40, seed=0), tmp_path / "ds.jbl")
    _, cfg = _dataset()
    base = dict(cfg, dataset=str(tmp_path / "ds.jbl"), epoch=6,
                **{"k-fold_num": 4},
                save_model_path=str(tmp_path / "m"))
    r_par = cmd_train_cv({**base, "fold_parallel": True})
    r_seq = cmd_train_cv({**base, "fold_parallel": False,
                          "save_model_path": str(tmp_path / "m2")})
    a_par = r_par["mean_accuracy"]
    a_seq = r_seq["mean_accuracy"]
    assert abs(a_par - a_seq) < 0.3, (a_par, a_seq)
    assert len(r_par["folds"]) == 4


def test_fold_parallel_early_stopping(tmp_path):
    """Per-fold early stopping inside the fold-parallel run: each fold
    stops exactly where the sequential EarlyStopping law says (patience
    consecutive validation-cost non-improvements), its history ends at the
    stop epoch, and its parameters freeze from that point on."""
    import jax

    from kgcn_tpu.parallel.cv import FoldParallelCV
    from kgcn_tpu.runtime.train import EarlyStopping

    (ds, info), cfg = _dataset(n=64)
    # tiny train folds + many epochs → validation cost rises → ES fires
    cfg = dict(cfg, epoch=30, patience=2, learning_rate=5e-2,
               save_model_path=str(tmp_path / "m"))
    folds = kfold_indices(ds.num, 4, seed=0)
    cv = FoldParallelCV(cfg, info, ds, folds)
    results = cv.run(log=lambda *_: None)
    stops = []
    for f, (_, state, fi) in enumerate(results):
        hist = fi["history"]
        # replay the sequential stop law over the produced trajectory: the
        # history must end exactly at the stop epoch (or run to completion)
        es = EarlyStopping(cfg["patience"], cfg["task"])
        stop_at = None
        for row in hist:
            if es.update(row["validation_cost"]):
                stop_at = row["epoch"]
                break
        if stop_at is not None:
            assert hist[-1]["epoch"] == stop_at, (f, stop_at, hist[-1])
            stops.append(stop_at)
        else:
            assert len(hist) == cfg["epoch"]
        assert fi["best_epoch"] >= 0
    # the setup is chosen so at least one fold actually early-stops
    assert stops, "no fold early-stopped; test setup lost its teeth"


def test_fold_parallel_early_stop_matches_sequential(tmp_path):
    """Same config through cmd_train_cv with patience set: the parallel
    path (round 5: no longer falls back) reaches the sequential path's
    quality band and every fold history respects the stop law."""
    import joblib

    from kgcn_tpu.cli.main import cmd_train_cv
    from kgcn_tpu.data.synthetic import make_ring_dataset

    joblib.dump(make_ring_dataset(num_pairs=40, seed=0), tmp_path / "ds.jbl")
    _, cfg = _dataset()
    base = dict(cfg, dataset=str(tmp_path / "ds.jbl"), epoch=10, patience=2,
                **{"k-fold_num": 4},
                save_model_path=str(tmp_path / "m"))
    r_par = cmd_train_cv({**base, "fold_parallel": "force"})
    r_seq = cmd_train_cv({**base, "fold_parallel": False,
                          "save_model_path": str(tmp_path / "m2")})
    assert abs(r_par["mean_accuracy"] - r_seq["mean_accuracy"]) < 0.3
    assert len(r_par["folds"]) == 4


def test_fold_parallel_uneven_folds_and_best_restore(tmp_path):
    """Review r4 fixes: (a) padded all-invalid steps are TRUE no-ops — a
    fold with fewer real steps ends with a smaller step counter (Adam and
    BN untouched on dead steps); (b) per-fold best-validation params are
    restored and model.<fold>.best.ckpt is written, like Trainer.fit."""
    import os

    import jax
    import numpy as np

    from kgcn_tpu.parallel.cv import FoldParallelCV

    (ds, info), cfg = _dataset(n=70)  # 2 folds of 35 — with B=16 both have
    # 3 steps; force unevenness with explicit folds instead
    idx = np.arange(70)
    folds = [(idx[:54], idx[54:]), (idx[:16], idx[16:])]  # 54 vs 16 train
    cfg = dict(cfg, epoch=3, save_model_path=str(tmp_path / "m"))
    cv = FoldParallelCV(cfg, info, ds, folds)
    results = cv.run(log=lambda *_: None)
    (_, st0, fi0), (_, st1, fi1) = results
    # fold 0: ceil(54/16)=4 steps/epoch; fold 1: ceil(16/16)=1 → padded to 4
    # with 3 dead steps that must not advance the step counter
    assert int(np.asarray(st0.step)) == 3 * 4
    assert int(np.asarray(st1.step)) == 3 * 1
    for f, fi in ((0, fi0), (1, fi1)):
        assert os.path.exists(tmp_path / "m" / f"model.fold{f}.best.ckpt") or \
            os.path.exists(tmp_path / "m" / f"model.{f}.best.ckpt") or any(
                "best" in p and str(f) in p
                for p in os.listdir(tmp_path / "m")
            ), sorted(os.listdir(tmp_path / "m"))
        assert fi["best_epoch"] >= 0
        assert np.isfinite(fi["best_validation_cost"])
