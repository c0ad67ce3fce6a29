"""CLI end-to-end + integrated-gradients tests."""
import json
import os

import joblib
import numpy as np
import pytest

from kgcn_tpu.data.synthetic import make_ring_dataset


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cliwork")
    joblib.dump(make_ring_dataset(num_pairs=30, seed=0), d / "data.jbl")
    cfg = {
        "model.py": "gcn",
        "dataset": str(d / "data.jbl"),
        "validation_data_rate": 0.2,
        "epoch": 4,
        "batch_size": 15,
        "learning_rate": 0.01,
        "normalize_adj_flag": True,
        "shuffle_data": True,
        "task": "classification",
        "save_model_path": str(d / "model"),
        "save_interval": 0,
        "patience": 0,
        "save_result_valid": str(d / "result/valid.csv"),
        "save_info_valid": str(d / "result/info_valid.json"),
        "save_info_train": str(d / "result/info_train.json"),
        "save_info_cv": str(d / "result/info_cv.json"),
        "save_result_test": str(d / "result/test.csv"),
        "save_info_test": str(d / "result/info_test.json"),
        "visualize_path": str(d / "viz"),
        "visualize_num": 2,
        "ig_divide_number": 20,
        "k-fold_num": 2,
        "make_plot": False,
        "seed": 0,
    }
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    return d


def test_cli_train_infer_visualize(workdir):
    from kgcn_tpu.cli.main import main

    main(["train", "--config", str(workdir / "config.json")])
    assert os.path.exists(workdir / "model/model.best.ckpt")
    assert os.path.exists(workdir / "result/info_valid.json")
    info = json.load(open(workdir / "result/info_valid.json"))
    assert "validation_cost" in info and "valid_metrics" in info
    assert "auc" in info["valid_metrics"]

    main(["infer", "--config", str(workdir / "config.json")])
    test_info = json.load(open(workdir / "result/info_test.json"))
    assert "test_cost" in test_info
    assert os.path.exists(workdir / "result/test.csv")

    main(["visualize", "--config", str(workdir / "config.json")])
    files = sorted(os.listdir(workdir / "viz"))
    assert len(files) == 2
    dump = joblib.load(workdir / "viz" / files[0])
    for key in ("features", "features_IG", "adjs", "adjs_IG",
                "check_score", "sum_of_IG"):
        assert key in dump
    assert dump["features_IG"].shape == dump["features"].shape
    assert dump["adjs_IG"].shape == dump["adjs"].shape


def test_cli_train_cv(workdir):
    from kgcn_tpu.cli.main import main

    main(["train_cv", "--config", str(workdir / "config.json")])
    cv = json.load(open(workdir / "result/info_cv.json"))
    assert len(cv["folds"]) == 2
    assert "mean_accuracy" in cv


def test_ig_completeness_converges(workdir):
    """IG sum must approach F(1) − F(0) as steps grow — the reference's
    runtime oracle (kgcn/visualization.py:279-287)."""
    import jax

    from kgcn_tpu.data import Batcher, load_jbl
    from kgcn_tpu.explain.ig import integrated_gradients
    from kgcn_tpu.models.registry import build_model
    from kgcn_tpu.runtime.config import load_config
    from kgcn_tpu.runtime.train import Trainer

    cfg = load_config(str(workdir / "config.json"))
    ds, info = load_jbl(cfg["dataset"], cfg)
    model = build_model("gcn", info, cfg)
    trainer = Trainer(model, cfg, info)
    b1 = Batcher(ds, info, 1)
    state = trainer.init_state(b1.make_batch(np.arange(1)), seed=0)
    state = trainer.restore(state, str(workdir / "model/model.best.ckpt"))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    batch = b1.make_batch(np.asarray([0]))

    rels = []
    for steps in (20, 200):
        _, check = integrated_gradients(
            jax.tree_util.Partial(model.apply), variables, batch,
            steps=steps, target="index", label_index=1,
        )
        rels.append(
            abs(check["sum_of_IG"] - check["check_score"])
            / (abs(check["check_score"]) + 1e-12)
        )
    assert rels[1] < rels[0]
    assert rels[1] < 0.1


def test_ig_methods_run(workdir):
    import jax

    from kgcn_tpu.data import Batcher, load_jbl
    from kgcn_tpu.explain.ig import integrated_gradients
    from kgcn_tpu.models.registry import build_model
    from kgcn_tpu.runtime.config import load_config
    from kgcn_tpu.runtime.train import Trainer

    cfg = load_config(str(workdir / "config.json"))
    ds, info = load_jbl(cfg["dataset"], cfg)
    model = build_model("gcn", info, cfg)
    trainer = Trainer(model, cfg, info)
    b1 = Batcher(ds, info, 1)
    state = trainer.init_state(b1.make_batch(np.arange(1)), seed=0)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    batch = b1.make_batch(np.asarray([0]))
    for method in ("ig", "grad", "grad_prod", "smooth_grad", "smooth_ig"):
        igs, _ = integrated_gradients(
            jax.tree_util.Partial(model.apply), variables, batch,
            steps=5, method=method, target="max",
        )
        assert np.isfinite(igs["features_IG"]).all()


def test_separate_validation_dataset(tmp_path):
    """validation_dataset config path (reference: gcn.py:262-269)."""
    import joblib

    from kgcn_tpu.cli.main import cmd_train
    from kgcn_tpu.runtime.config import load_config

    joblib.dump(make_ring_dataset(num_pairs=15, seed=0), tmp_path / "train.jbl")
    joblib.dump(make_ring_dataset(num_pairs=5, seed=1), tmp_path / "valid.jbl")
    cfg = load_config(None, {
        "model.py": "gcn",
        "dataset": str(tmp_path / "train.jbl"),
        "validation_dataset": str(tmp_path / "valid.jbl"),
        "epoch": 3, "batch_size": 10, "learning_rate": 0.01,
        "task": "classification", "save_interval": 0,
        "save_model_path": str(tmp_path / "model"), "make_plot": False,
    })
    result = cmd_train(cfg)
    assert "validation_cost" in result


def test_visualize_type_graph_is_dispatch_value(workdir):
    """visualize_type 'graph' is the reference's dispatch selector
    (gcn.py:651), NOT an IG target mode — it must behave like the default."""
    import json

    from kgcn_tpu.cli.main import main

    cfg = json.load(open(workdir / "config.json"))
    cfg["visualize_type"] = "graph"
    cfg["visualize_num"] = 2
    cfg["ig_divide_number"] = 10
    p = workdir / "config_vt.json"
    with open(p, "w") as f:
        json.dump(cfg, f)
    main(["visualize", "--config", str(p)])
