"""Multimodal / regression model tests."""
import numpy as np
import pytest

from kgcn_tpu.data import Batcher, build_dataset, split_dataset
from kgcn_tpu.data.synthetic import make_ring_dataset
from kgcn_tpu.models.registry import build_model
from kgcn_tpu.runtime.config import default_config
from kgcn_tpu.runtime.train import Trainer


def _seq_data(num_pairs=20, seq_len=12, vocab=5, seed=0):
    """Ring dataset + a synthetic sequence correlated with the label."""
    data = make_ring_dataset(num_pairs=num_pairs, seed=seed)
    n = len(data["label"])
    rng = np.random.RandomState(seed)
    y = np.argmax(data["label"], axis=1)
    seq = rng.randint(1, vocab, size=(n, seq_len)).astype(np.int32)
    seq[y == 1, :3] = 0  # class-1 sequences start with token 0
    data["sequence"] = seq
    data["sequence_length"] = [seq_len] * n
    data["sequence_symbol_num"] = np.int64(vocab)
    return data


def test_multimodal_learns(tmp_path):
    cfg = default_config()
    cfg.update(
        {"epoch": 15, "batch_size": 10, "learning_rate": 0.01,
         "normalize_adj_flag": True, "task": "classification",
         "save_model_path": str(tmp_path), "save_interval": 0,
         "shuffle_data": True}
    )
    data = _seq_data()
    ds, info = build_dataset(data, cfg)
    assert info.sequence_max_length == 12
    tr, va, _, _ = split_dataset(ds, 0.25, seed=0)
    model = build_model("gcn_multimodal", info, cfg)
    trainer = Trainer(model, cfg, info)
    tb = Batcher(tr, info, 10, seed=0)
    vb = Batcher(va, info, 10, seed=0)
    state = trainer.init_state(tb.make_batch(np.arange(10)), seed=0)
    state, _ = trainer.fit(state, tb, vb, log=lambda s: None)
    ev = trainer.evaluate(state, vb, "validation_")
    assert float(ev["metrics"]["validation_accuracy"]) >= 0.7


def test_vector_modal_model(tmp_path):
    cfg = default_config()
    cfg.update(
        {"epoch": 5, "batch_size": 10, "learning_rate": 0.01,
         "task": "classification", "save_model_path": str(tmp_path),
         "save_interval": 0}
    )
    data = make_ring_dataset(num_pairs=15, seed=0)
    n = len(data["label"])
    rng = np.random.RandomState(0)
    vm = rng.standard_normal((n, 8)).astype(np.float32)
    vm[np.argmax(data["label"], 1) == 1] += 2.0
    data["vector_modal"] = vm
    ds, info = build_dataset(data, cfg)
    assert info.vector_modal_dim == [8]
    model = build_model("gcn_vector_modal", info, cfg)
    trainer = Trainer(model, cfg, info)
    b = Batcher(ds, info, 10, seed=0)
    state = trainer.init_state(b.make_batch(np.arange(10)), seed=0)
    state, cost, _, _ = trainer.run_epoch(state, b)
    assert np.isfinite(cost)


def test_regression_model(tmp_path):
    cfg = default_config()
    cfg.update(
        {"epoch": 30, "batch_size": 20, "learning_rate": 0.01,
         "normalize_adj_flag": True, "task": "regression",
         "save_model_path": str(tmp_path), "save_interval": 0,
         "shuffle_data": True}
    )
    data = make_ring_dataset(num_pairs=40, seed=0)
    # regression target: number of edges in the graph (learnable from A)
    target = data["dense_adj"].sum(axis=(1, 2)).astype(np.float32)
    target = (target - target.mean()) / target.std()
    data["label"] = target[:, None]
    data["mask_label"] = np.ones_like(data["label"], dtype=np.int64)
    ds, info = build_dataset(data, cfg)
    tr, va, _, _ = split_dataset(ds, 0.2, seed=0)
    model = build_model("gcn_regression", info, cfg)
    trainer = Trainer(model, cfg, info)
    tb = Batcher(tr, info, 20, seed=0)
    vb = Batcher(va, info, 20, seed=0)
    state = trainer.init_state(tb.make_batch(np.arange(20)), seed=0)
    state, result = trainer.fit(state, tb, vb, log=lambda s: None)
    ev = trainer.evaluate(state, vb, "validation_")
    mse = float(ev["metrics"]["validation_mse"])
    assert mse < 0.8, f"regression failed to learn: mse={mse}"  # target has unit variance


def test_vector_modal_ig_completeness(tmp_path):
    """IG must scale AND differentiate the vector modality — otherwise
    sum(IG) can never match F(1)−F(0) for vector-modal models."""
    import jax

    from kgcn_tpu.explain.ig import integrated_gradients

    cfg = default_config()
    cfg.update(
        {"epoch": 5, "batch_size": 6, "learning_rate": 0.01,
         "task": "classification", "save_model_path": str(tmp_path),
         "save_interval": 0}
    )
    data = make_ring_dataset(num_pairs=9, seed=0)
    n = len(data["label"])
    rng = np.random.RandomState(0)
    vm = rng.standard_normal((n, 8)).astype(np.float32)
    vm[np.argmax(data["label"], 1) == 1] += 2.0
    data["vector_modal"] = vm
    ds, info = build_dataset(data, cfg)
    model = build_model("gcn_vector_modal", info, cfg)
    trainer = Trainer(model, cfg, info)
    b = Batcher(ds, info, 6, seed=0)
    state = trainer.init_state(b.make_batch(np.arange(6)), seed=0)
    state, *_ = trainer.run_epoch(state, b)

    b1 = Batcher(ds, info, 1, seed=0)
    batch = b1.make_batch(np.asarray([0]))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    igs, check = integrated_gradients(
        jax.tree_util.Partial(model.apply), variables, batch,
        steps=200, target="max",
    )
    assert "vector_modal_IG" in igs
    assert igs["vector_modal_IG"][0].shape == (1, 8)
    rel_err = abs(check["sum_of_IG"] - check["check_score"]) / max(
        abs(check["check_score"]), 1e-9)
    assert rel_err < 0.1, f"IG completeness rel_err={rel_err} ({check})"


def test_embedded_layer_ig(tmp_path):
    """IG on the sequence-embedding layer (reference feed_embedded_layer
    mode): shape, finiteness, and nonzero attribution on the informative
    prefix tokens."""
    from kgcn_tpu.explain.ig import embedded_layer_ig

    cfg = default_config()
    cfg.update(
        {"epoch": 10, "batch_size": 10, "learning_rate": 0.01,
         "normalize_adj_flag": True, "task": "classification",
         "save_model_path": str(tmp_path), "save_interval": 0}
    )
    data = _seq_data(num_pairs=10)
    ds, info = build_dataset(data, cfg)
    model = build_model("gcn_multimodal", info, cfg)
    trainer = Trainer(model, cfg, info)
    tb = Batcher(ds, info, 10, seed=0)
    state = trainer.init_state(tb.make_batch(np.arange(10)), seed=0)
    state, _ = trainer.fit(state, tb, None, log=lambda s: None)

    b1 = Batcher(ds, info, 1, seed=0)
    batch = b1.make_batch(np.asarray([0]))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    emb, ig, check = embedded_layer_ig(model, variables, batch, steps=50)
    assert emb.shape == ig.shape and emb.shape[:2] == (1, 12)
    assert np.isfinite(ig).all()
    assert np.abs(ig).sum() > 0
    assert np.isfinite(check["check_score"])
