"""End-to-end training tests: the TPU-native equivalent of the reference's
synthetic ring smoke test (README.md:208-232 — kgcn train_cv on
example_config/synth.json reaching high accuracy)."""
import numpy as np
import pytest

from kgcn_tpu.data import build_dataset, split_dataset, Batcher
from kgcn_tpu.data.synthetic import make_ring_dataset
from kgcn_tpu.models.registry import build_model
from kgcn_tpu.runtime.config import default_config
from kgcn_tpu.runtime.train import Trainer


def _setup(model_name="gcn", cfg_extra=None, data=None, epochs=30):
    cfg = default_config()
    cfg.update(
        {
            "epoch": epochs,
            "batch_size": 25,
            "learning_rate": 0.01,
            "shuffle_data": True,
            "patience": 0,
            "save_interval": 0,
            "normalize_adj_flag": True,
            "task": "classification",
        }
    )
    if cfg_extra:
        cfg.update(cfg_extra)
    data = data or make_ring_dataset(num_pairs=100, seed=0)
    ds, info = build_dataset(data, cfg)
    train_ds, valid_ds, _, _ = split_dataset(ds, 0.2, seed=0)
    model = build_model(model_name, info, cfg)
    trainer = Trainer(model, cfg, info)
    tb = Batcher(train_ds, info, cfg["batch_size"], seed=0)
    vb = Batcher(valid_ds, info, cfg["batch_size"], seed=0)
    return trainer, tb, vb


def test_gcn_learns_ring_task(tmp_path):
    trainer, tb, vb = _setup("gcn", {"save_model_path": None})
    trainer.config["save_model_path"] = str(tmp_path)
    state = trainer.init_state(tb.make_batch(np.arange(tb.batch_size)), seed=0)
    state, result = trainer.fit(state, tb, vb, log=lambda s: None)
    ev = trainer.evaluate(state, vb, "validation_")
    acc = float(ev["metrics"]["validation_accuracy"])
    assert acc >= 0.85, f"GCN failed to learn ring task: acc={acc}"
    assert result["training_time"] > 0
    assert len(result["history"]) > 0


@pytest.mark.parametrize("name,epochs,threshold", [("gin", 30, 0.8), ("gat", 80, 0.7)])
def test_other_models_learn(tmp_path, name, epochs, threshold):
    # GAT is the weakest reference architecture (sigmoid-squashed single-head
    # attention, kgcn/layers.py:535) — it learns the ring task slowly.
    trainer, tb, vb = _setup(name, epochs=epochs)
    trainer.config["save_model_path"] = str(tmp_path)
    state = trainer.init_state(tb.make_batch(np.arange(tb.batch_size)), seed=0)
    state, _ = trainer.fit(state, tb, vb, log=lambda s: None)
    ev = trainer.evaluate(state, vb, "validation_")
    acc = float(ev["metrics"]["validation_accuracy"])
    assert acc >= threshold, f"{name} acc={acc}"


def test_multitask_smoke(tmp_path):
    data = make_ring_dataset(num_pairs=20, seed=0)
    # fabricate a 3-task label matrix with some masked entries
    rng = np.random.RandomState(0)
    n = len(data["label"])
    y = np.concatenate([data["label"][:, :1]] * 3, axis=1)
    mask = (rng.random_sample((n, 3)) > 0.2).astype(np.int64)
    data["label"], data["mask_label"] = y, mask
    trainer, tb, vb = _setup(
        "gcn_multitask", {"task": "multitask_classification", "epoch": 3}, data
    )
    trainer.config["save_model_path"] = str(tmp_path)
    state = trainer.init_state(tb.make_batch(np.arange(tb.batch_size)), seed=0)
    state, _ = trainer.fit(state, tb, vb, log=lambda s: None)
    ev = trainer.evaluate(state, vb, "validation_")
    assert "validation_each_accuracy" in ev["metrics"]
    assert ev["prediction"].shape[-1] == 2  # [N, T, 2]


def test_node_label_smoke(tmp_path):
    import joblib

    d = joblib.load("/root/reference/example_jbl/sample_node_label.jbl")
    cfg = default_config()
    cfg.update(
        {"epoch": 3, "batch_size": 2, "learning_rate": 0.01,
         "save_interval": 0, "task": "classification"}
    )
    ds, info = build_dataset(d, cfg)
    model = build_model("gcn_node_label", info, cfg)
    trainer = Trainer(model, cfg, info)
    trainer.config["save_model_path"] = str(tmp_path)
    tb = Batcher(ds, info, 2, seed=0)
    state = trainer.init_state(tb.make_batch(np.arange(2)), seed=0)
    state, _ = trainer.fit(state, tb, None, log=lambda s: None)
    ev = trainer.evaluate(state, tb)
    assert ev["prediction"].shape == (4, 3, 2)


def test_checkpoint_roundtrip(tmp_path):
    trainer, tb, vb = _setup("gcn", {"epoch": 2})
    trainer.config["save_model_path"] = str(tmp_path)
    state = trainer.init_state(tb.make_batch(np.arange(tb.batch_size)), seed=0)
    state, _ = trainer.fit(state, tb, vb, log=lambda s: None)
    ev1 = trainer.evaluate(state, vb)

    state2 = trainer.init_state(tb.make_batch(np.arange(20)), seed=1)
    state2 = trainer.restore(state2, str(tmp_path / "model.last.ckpt"))
    ev2 = trainer.evaluate(state2, vb)
    np.testing.assert_allclose(ev1["prediction"], ev2["prediction"], atol=1e-6)


def test_early_stopping():
    from kgcn_tpu.runtime.train import EarlyStopping

    es = EarlyStopping(patience=2)
    assert not es.update(1.0)
    assert not es.update(0.5)
    assert not es.update(0.6)  # count 1
    assert es.update(0.7)  # count 2 → stop


def test_resume_replays_remaining_epochs(tmp_path):
    """Interval checkpoint + retrain resumes at the next epoch and replays
    the same data order (SURVEY §5 deterministic resume)."""
    trainer, tb, vb = _setup("gin", {"epoch": 6, "save_interval": 3,
                                     "patience": 0})
    trainer.config["save_model_path"] = str(tmp_path / "full")
    state = trainer.init_state(tb.make_batch(np.arange(tb.batch_size)), seed=0)
    state_full, _ = trainer.fit(state, tb, vb, log=lambda s: None)
    ev_full = trainer.evaluate(state_full, vb)

    # second run: stop at epoch 3 (interval ckpt), then resume to 6
    trainer2, tb2, vb2 = _setup("gin", {"epoch": 6, "save_interval": 3})
    trainer2.config["save_model_path"] = str(tmp_path / "half")
    trainer2.config["epoch"] = 3
    s2 = trainer2.init_state(tb2.make_batch(np.arange(tb2.batch_size)), seed=0)
    s2, _ = trainer2.fit(s2, tb2, vb2, log=lambda s: None)

    trainer3, tb3, vb3 = _setup("gin", {"epoch": 6, "save_interval": 3})
    trainer3.config["save_model_path"] = str(tmp_path / "resumed")
    s3 = trainer3.init_state(tb3.make_batch(np.arange(tb3.batch_size)), seed=0)
    s3 = trainer3.restore(s3, str(tmp_path / "half" / "model.00003.ckpt"))
    assert s3.epoch == 3
    s3, info3 = trainer3.fit(s3, tb3, vb3, log=lambda s: None)
    # resumed run trains epochs 3..5 only
    assert [h["epoch"] for h in info3["history"]] == [3, 4, 5]


def test_node_label_metrics_ignore_padding(tmp_path):
    """Padded node slots must not count toward node-label cost/accuracy
    (argmax(0)==argmax(0) on padding used to inflate accuracy)."""
    cfg = default_config()
    cfg.update({"task": "classification"})
    G, N, real = 4, 12, 3
    rng = np.random.RandomState(0)
    dense = np.zeros((G, N, N))
    feats = np.zeros((G, N, 4))
    node_label = np.zeros((G, N, 2))
    for g in range(G):
        a = (rng.rand(real, real) > 0.5).astype(float)
        a = np.maximum(a, a.T)
        np.fill_diagonal(a, 1)
        dense[g, :real, :real] = a
        feats[g, :real] = rng.rand(real, 4)
        lab = rng.randint(0, 2, real)
        node_label[g, np.arange(real), lab] = 1.0
    data = {"feature": feats, "dense_adj": dense, "node_label": node_label,
            "max_node_num": np.int64(N)}
    ds, info = build_dataset(data, cfg)
    model = build_model("gcn_node_label", info, cfg)
    trainer = Trainer(model, cfg, info)
    tb = Batcher(ds, info, G, seed=0)
    batch = tb.make_batch(np.arange(G))
    state = trainer.init_state(batch, seed=0)
    out = model.apply({"params": state.params,
                       "batch_stats": state.batch_stats}, batch, train=False)
    pred = np.asarray(out.prediction)  # [G, N, 2]
    # manual masked accuracy over the 3 real nodes only
    man_correct = 0.0
    for g in range(G):
        c = (pred[g, :real].argmax(-1) == node_label[g, :real].argmax(-1))
        man_correct += c.mean()
    np.testing.assert_allclose(
        float(out.metrics["correct_count"]), man_correct, atol=1e-5)
    assert float(out.metrics["count"]) == G


def test_node_label_above_lane_rounding(tmp_path):
    """node_label/mask arrays must be re-padded to the lane-rounded node
    count (200→256) like the features are — used to crash with a broadcast
    shape mismatch."""
    cfg = default_config()
    cfg.update({"epoch": 1, "batch_size": 2, "save_interval": 0,
                "task": "classification"})
    G, N, real = 2, 200, 5
    rng = np.random.RandomState(0)
    dense = np.zeros((G, N, N))
    feats = np.zeros((G, N, 4))
    node_label = np.zeros((G, N, 2))
    mask_nl = np.zeros((G, N), np.int64)
    for g in range(G):
        dense[g, :real, :real] = np.eye(real)
        feats[g, :real] = rng.rand(real, 4)
        node_label[g, np.arange(real), rng.randint(0, 2, real)] = 1.0
        mask_nl[g, :real] = 1
    data = {"feature": feats, "dense_adj": dense, "node_label": node_label,
            "mask_node_label": mask_nl, "max_node_num": np.int64(N)}
    ds, info = build_dataset(data, cfg)
    model = build_model("gcn_node_label", info, cfg)
    trainer = Trainer(model, cfg, info)
    tb = Batcher(ds, info, G, seed=0)
    assert tb.max_nodes == 256  # lane-rounded
    state = trainer.init_state(tb.make_batch(np.arange(G)), seed=0)
    state, cost, _, _ = trainer.run_epoch(state, tb)
    assert np.isfinite(cost)


def test_rxn_3layer_model_learns(tmp_path):
    """gcn_rxn_3layer (reference example_model/model_rxn_3layer.py) trains on
    the ring task and is reachable by its reference dotted-path alias."""
    from kgcn_tpu.models.registry import build_model as bm
    from kgcn_tpu.models.standard import RxnGCN

    trainer, tb, vb = _setup("example_model.model_rxn_3layer:GCN", epochs=20)
    assert isinstance(trainer.model, RxnGCN)
    trainer.config["save_model_path"] = str(tmp_path)
    state = trainer.init_state(tb.make_batch(np.arange(tb.batch_size)), seed=0)
    state, _ = trainer.fit(state, tb, vb, log=lambda s: None)
    ev = trainer.evaluate(state, vb, "validation_")
    acc = float(ev["metrics"]["validation_accuracy"])
    assert acc >= 0.8, f"rxn acc={acc}"


def test_multitask_early_stopping_prints_per_task(tmp_path):
    """early_stopping: "multitask" selects EarlyStoppingMultiTask and the
    epoch lines carry per-task accuracies (reference: kgcn/core.py:78-117)."""
    data = make_ring_dataset(num_pairs=20, seed=0)
    rng = np.random.RandomState(0)
    n = len(data["label"])
    y = np.concatenate([data["label"][:, :1]] * 3, axis=1)
    mask = (rng.random_sample((n, 3)) > 0.2).astype(np.int64)
    data["label"], data["mask_label"] = y, mask
    trainer, tb, vb = _setup(
        "gcn_multitask",
        {"task": "multitask_classification", "early_stopping": "multitask",
         "epoch": 2},
        data=data,
        epochs=2,
    )
    trainer.config["save_model_path"] = str(tmp_path)
    state = trainer.init_state(tb.make_batch(np.arange(tb.batch_size)), seed=0)
    lines = []
    state, _ = trainer.fit(state, tb, vb, log=lines.append)
    epoch_lines = [l for l in lines if l.startswith("epoch ")]
    assert epoch_lines and all("each acc=[" in l for l in epoch_lines), lines


def test_resume_preserves_better_best_checkpoint(tmp_path):
    """Review r4: a resumed run must not overwrite a better best.ckpt —
    restore() carries the checkpointed best validation cost into fit()."""
    import jax
    import joblib

    from kgcn_tpu.cli.main import _fit_once
    from kgcn_tpu.data import build_dataset, split_dataset
    from kgcn_tpu.data.synthetic import make_ring_dataset
    from kgcn_tpu.runtime import checkpoint as ckpt
    from kgcn_tpu.runtime.config import default_config

    cfg = default_config()
    cfg.update({
        "task": "classification", "learning_rate": 1e-2, "batch_size": 16,
        "epoch": 8, "model.py": "gcn", "seed": 0, "save_interval": 0,
        "save_model_path": str(tmp_path / "m"),
    })
    ds, info = build_dataset(make_ring_dataset(num_pairs=30, seed=0), cfg)
    tr, va, _, _ = split_dataset(ds, 0.3, seed=0)
    trainer, state, fit_info, _ = _fit_once(cfg, tr, va, info)
    best1 = float(fit_info["best_validation_cost"])
    tree1 = ckpt.load_checkpoint(
        ckpt.ckpt_name(str(tmp_path / "m"), "best"),
        trainer.state_tree(state, 0, 0.0),
    )
    p1 = jax.tree_util.tree_leaves(tree1["params"])[0].copy()

    # resume with a huge LR so the resumed epochs only get WORSE
    cfg2 = dict(cfg, epoch=10, learning_rate=5.0,
                retrain=ckpt.ckpt_name(str(tmp_path / "m"), "last"))
    _fit_once(cfg2, tr, va, info)
    tree2 = ckpt.load_checkpoint(
        ckpt.ckpt_name(str(tmp_path / "m"), "best"),
        trainer.state_tree(state, 0, 0.0),
    )
    best2 = float(np.asarray(tree2["best_cost"]))
    p2 = jax.tree_util.tree_leaves(tree2["params"])[0]
    # either the resumed run genuinely improved (cost <= best1) or the old
    # best checkpoint survived untouched
    assert best2 <= best1 + 1e-6 or np.array_equal(np.asarray(p1),
                                                   np.asarray(p2)), (
        best1, best2,
    )
