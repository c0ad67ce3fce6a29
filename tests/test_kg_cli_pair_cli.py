"""KG link-prediction CLI path, KG IG visualizer, pair CLI, seq CNN."""
import json
import os

import joblib
import numpy as np
import pytest

from kgcn_tpu.data.synthetic import make_kg_dataset, make_ring_dataset


def test_kg_train_via_main_cli(tmp_path):
    from kgcn_tpu.cli.main import main

    joblib.dump(make_kg_dataset(num_entities=25, num_relations=2, seed=0),
                tmp_path / "kg.jbl")
    cfg = {
        "dataset": str(tmp_path / "kg.jbl"),
        "task": "link_prediction",
        "with_feature": False,
        "with_node_embedding": True,
        "embedding_dim": 12,
        "epoch": 5,
        "batch_size": 1,
        "learning_rate": 0.05,
        "label_batch_size": 32,
        "save_model_path": str(tmp_path / "model"),
        "save_info_train": str(tmp_path / "info.json"),
        "save_interval": 0,
        "seed": 0,
    }
    with open(tmp_path / "cfg.json", "w") as f:
        json.dump(cfg, f)
    main(["train", "--config", str(tmp_path / "cfg.json")])
    assert os.path.exists(tmp_path / "model/model.last.ckpt")
    info = json.load(open(tmp_path / "info.json"))
    assert "ranking_accuracy" in info


def test_kg_embedding_ig_and_csv(tmp_path):
    from kgcn_tpu.data import build_dataset
    from kgcn_tpu.explain.kg_ig import dump_kg_ig_csv, embedding_ig
    from kgcn_tpu.models.kg import KGBatcher, KGLinkPredictor
    from kgcn_tpu.runtime.config import default_config
    from kgcn_tpu.runtime.train import Trainer

    cfg = default_config()
    cfg.update({"with_feature": False, "with_node_embedding": True,
                "task": "link_prediction", "save_interval": 0})
    data = make_kg_dataset(num_entities=20, num_relations=1, seed=0)
    ds, info = build_dataset(data, cfg)
    model = KGLinkPredictor(all_node_num=20, embedding_dim=8, channels=1)
    trainer = Trainer(model, cfg, info)
    kb = KGBatcher(ds, info, label_batch_size=32, seed=0)
    batch = next(kb.batches())
    state = trainer.init_state(batch, seed=0)
    for _ in range(10):
        state, *_ = trainer.run_epoch(state, kb)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    targets = np.array([[0, 0, 1], [3, 0, 4]], np.int32)
    ig = embedding_ig(model, variables, batch, targets, steps=200)
    assert ig.shape == (20, 8)
    assert np.isfinite(ig).all()

    # completeness oracle: Σ IG ≈ F(1) − F(0) (zero-embedding baseline)
    import jax.numpy as jnp

    def score_at(scale):
        table = variables["params"]["embed"]["embedding"] * scale
        v = {**variables,
             "params": {**variables["params"], "embed": {"embedding": table}}}
        z = model.apply(v, batch, method=model.node_embeddings)
        h, r, t = targets[:, 0], targets[:, 1], targets[:, 2]
        return float(jnp.sum(model.apply(
            v, z[h], z[t], jnp.asarray(r),
            method=lambda m, zh, zt, rr: m.distmult.score(zh, zt, rr))))

    delta = score_at(1.0) - score_at(0.0)
    rel_err = abs(ig.sum() - delta) / max(abs(delta), 1e-9)
    assert rel_err < 0.05, f"IG completeness rel_err={rel_err}"
    # target nodes should carry meaningful attribution
    scores = np.abs(ig).sum(axis=1)
    assert scores[0] > 0 and scores[1] > 0
    node_csv, edge_csv = dump_kg_ig_csv(
        str(tmp_path), ig, ds.adjs[0], targets=[0, 3], hops=1
    )
    lines = open(node_csv).read().strip().splitlines()
    assert lines[0] == "node,name,ig_score,is_target"
    assert len(lines) > 2


def test_pair_cli(tmp_path):
    from kgcn_tpu.cli.pair import main as pair_main

    data = make_ring_dataset(num_pairs=10, seed=0)
    y = np.argmax(data["label"], axis=1)
    idx0 = np.nonzero(y == 0)[0]
    idx1 = np.nonzero(y == 1)[0]
    rng = np.random.RandomState(0)
    pairs = np.stack([rng.choice(idx0, 20), rng.choice(idx1, 20)], 1)
    data["graph_index_list"] = pairs.tolist()
    joblib.dump(data, tmp_path / "pairs.jbl")
    cfg = {
        "dataset": str(tmp_path / "pairs.jbl"),
        "epoch": 2,
        "batch_size": 10,
        "learning_rate": 0.01,
        "task": "classification",
        "save_model_path": str(tmp_path / "model"),
        "save_result_test": str(tmp_path / "scores.csv"),
        "save_interval": 0,
        "seed": 0,
    }
    with open(tmp_path / "cfg.json", "w") as f:
        json.dump(cfg, f)
    pair_main(["train", "--config", str(tmp_path / "cfg.json")])
    pair_main(["infer", "--config", str(tmp_path / "cfg.json")])
    lines = open(tmp_path / "scores.csv").read().strip().splitlines()
    assert lines[0] == "score0,score1"
    assert len(lines) == 21


def test_seq_cnn_model(tmp_path):
    from kgcn_tpu.data import Batcher, build_dataset
    from kgcn_tpu.models.registry import build_model
    from kgcn_tpu.runtime.config import default_config
    from kgcn_tpu.runtime.train import Trainer

    rng = np.random.RandomState(0)
    n, L, vocab = 40, 16, 6
    y = rng.randint(0, 2, n)
    seq = rng.randint(1, vocab, (n, L)).astype(np.int32)
    seq[y == 1, :4] = 1  # motif for class 1
    data = make_ring_dataset(num_pairs=20, seed=0)
    data["sequence"] = seq
    data["sequence_length"] = [L] * n
    data["sequence_symbol_num"] = np.int64(vocab)
    data["label"] = np.eye(2)[y]
    data["mask_label"] = np.ones_like(data["label"], dtype=np.int64)
    cfg = default_config()
    cfg.update({"task": "classification", "save_interval": 0,
                "save_model_path": str(tmp_path)})
    ds, info = build_dataset(data, cfg)
    model = build_model("seq_cnn", info, cfg)
    trainer = Trainer(model, cfg, info)
    b = Batcher(ds, info, 20, seed=0)
    state = trainer.init_state(b.make_batch(np.arange(20)), seed=0)
    state, cost, _, _ = trainer.run_epoch(state, b)
    assert np.isfinite(cost)


def test_kg_visualize_via_cli(tmp_path):
    """`kgcn-tpu visualize` with task=link_prediction routes to the KG
    embedding-IG visualizer (reference cal_feature_IG_for_kg path)."""
    import json

    from kgcn_tpu.cli.main import main

    data = make_kg_dataset(num_entities=20, num_relations=1, seed=0)
    joblib.dump(data, tmp_path / "kg.jbl")
    cfg = {
        # no "task" key: the with_node_embedding flag alone must route BOTH
        # train and visualize to the KG path (mirrored dispatch)
        "dataset": str(tmp_path / "kg.jbl"),
        "model.py": "kg_distmult", "epoch": 5, "batch_size": 1,
        "learning_rate": 0.05, "with_node_embedding": True,
        "with_feature": False, "embedding_dim": 8,
        "save_model_path": str(tmp_path / "model"), "make_plot": False,
        "visualize_path": str(tmp_path / "viz") + "/", "visualize_num": 2,
        "ig_divide_number": 10, "graph_distance": 1,
    }
    cfg_path = tmp_path / "config.json"
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    main(["train", "--config", str(cfg_path)])
    main(["visualize", "--config", str(cfg_path)])
    import glob

    nodes = glob.glob(str(tmp_path / "viz" / "edgepred-*_nodes.csv"))
    edges = glob.glob(str(tmp_path / "viz" / "edgepred-*_edges.csv"))
    assert len(nodes) == 2 and len(edges) == 2
    lines = open(nodes[0]).read().strip().splitlines()
    assert lines[0] == "node,name,ig_score,is_target"
    assert any(line.endswith(",1") for line in lines[1:]), "no target row"
