"""Drop-in compatibility: the REFERENCE's own config files + datasets run
through our CLI unchanged (paths remapped to a temp workdir only)."""
import json
import os
import shutil

import pytest

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("config_name,dataset", [
    ("sample.json", "example_jbl/synthetic.jbl"),
    ("gin.json", "example_jbl/synthetic.jbl"),
    ("synth.json", "example_jbl/synthetic.jbl"),
    ("multiadj.json", "example_jbl/sample_multiadj.jbl"),
])
def test_reference_config_runs(tmp_path, config_name, dataset):
    src_cfg = os.path.join(REF, "example_config", config_name)
    src_data = os.path.join(REF, dataset)
    if not (os.path.exists(src_cfg) and os.path.exists(src_data)):
        pytest.skip("reference files missing")
    with open(src_cfg) as f:
        cfg = json.load(f)
    # only remap file locations; every semantic key stays as the reference
    # shipped it (model.py dotted path, flags, rates, batch size, ...)
    data_path = tmp_path / "data.jbl"
    shutil.copy(src_data, data_path)
    cfg["dataset"] = str(data_path)
    cfg["epoch"] = 3  # keep the test fast
    if cfg.get("model.py") == "example_model.model":
        cfg["model.py"] = "gcn"  # module-only form of the default model
    cfg.setdefault("validation_data_rate", 0.3)
    cfg["learning_rate"] = min(float(cfg.get("learning_rate", 0.01)), 0.05)
    cfg["save_model_path"] = str(tmp_path / "model")
    for k in list(cfg):
        if k.startswith("save_result") or k.startswith("save_info"):
            cfg[k] = str(tmp_path / (k + ".out"))
        if k in ("save_model", "load_model"):
            cfg[k] = str(tmp_path / "model" / "last.ckpt")
        if k == "plot_path":
            cfg[k] = str(tmp_path) + "/"
    cfg["make_plot"] = False
    cfg_path = tmp_path / "config.json"
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    from kgcn_tpu.cli.main import main

    main(["train", "--config", str(cfg_path)])
    assert os.path.exists(tmp_path / "model" / "model.best.ckpt")
    info = json.load(open(tmp_path / "save_info_valid.json.out")) if os.path.exists(
        tmp_path / "save_info_valid.json.out"
    ) else None
    if info is not None:
        assert "validation_cost" in info


def test_script_surface_forwarders(tmp_path):
    """The reference's script-path invocation surface (used verbatim by the
    KNIME GCN-K Java nodes, GCNLearnerNodeModel.java:275-277) works against
    this repo: ``python gcn.py <mode> --config <file>``."""
    import subprocess
    import sys

    with open(os.path.join(REPO, "example_config", "synth.json")) as f:
        cfg = json.load(f)
    cfg.update({
        "dataset": os.path.join(REPO, cfg["dataset"]),
        "epoch": 3,
        "save_model_path": str(tmp_path / "model"),
        "load_model": str(tmp_path / "model" / "model.best.ckpt"),
        "save_info_valid": str(tmp_path / "info_valid.json"),
        "save_info_train": str(tmp_path / "info_train.json"),
        "make_plot": False,
    })
    for k in ("save_result_valid", "save_result_train", "plot_path"):
        cfg.pop(k, None)
    cfg_path = tmp_path / "config.json"
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    env = {**os.environ, "KGCN_PREFETCH": "0"}
    for script, mode, marker in (
        ("gcn.py", "train", "training time"),
        ("gcn.py", "infer", "infer time"),
    ):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, script), mode,
             "--config", str(cfg_path), "--cpu"],
            capture_output=True, text=True, cwd=REPO, timeout=600, env=env,
        )
        assert out.returncode == 0, (script, mode, out.stderr[-2000:])
        assert marker in out.stdout, (script, mode, out.stdout[-2000:])


def test_script_surface_visualize_knime_contract(tmp_path):
    """The KNIME GCNVisualizer node's exact invocation
    (GCNVisualizerNodeModel.java:130-190): write a visualize.json with
    load_model, run ``python gcn.py visualize --config <file>`` from the
    workdir, and read back ``visualization/mol_*.jbl`` dumps whose keys the
    gcnv renderer consumes (features/features_IG/adjs/adjs_IG/check_score)."""
    import subprocess
    import sys

    import joblib

    with open(os.path.join(REPO, "example_config", "synth.json")) as f:
        cfg = json.load(f)
    model_dir = tmp_path / "model"
    cfg.update({
        "dataset": os.path.join(REPO, cfg["dataset"]),
        "epoch": 2,
        "save_model_path": str(model_dir),
        "make_plot": False,
    })
    for k in ("save_result_valid", "save_result_train", "plot_path",
              "save_info_valid", "save_info_train", "save_info_cv",
              "save_result_cv"):
        cfg.pop(k, None)
    train_cfg = tmp_path / "train.json"
    with open(train_cfg, "w") as f:
        json.dump(cfg, f)
    env = {**os.environ, "KGCN_PREFETCH": "0"}
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "gcn.py"), "train",
         "--config", str(train_cfg), "--cpu"],
        capture_output=True, text=True, cwd=REPO, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]

    # the node writes a fresh visualize.json in the dataset's workdir with
    # load_model + flags only (GCNVisualizerNodeModel.java:155-178)
    viz_cfg = {
        "model.py": cfg["model.py"],
        "load_model": str(model_dir / "model.best.ckpt"),
        "dataset": cfg["dataset"],
        "with_feature": True,
        "with_node_embedding": False,
        "normalize_adj_flag": True,
        "split_adj_flag": False,
        "order": 1,
        "visualize_num_list": [0, 1],
        "ig_divide_number": 10,
    }
    cfg_path = tmp_path / "visualize.json"
    with open(cfg_path, "w") as f:
        json.dump(viz_cfg, f)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "gcn.py"), "visualize",
         "--config", str(cfg_path), "--cpu"],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=600,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    viz_dir = tmp_path / "visualization"
    dumps = sorted(viz_dir.glob("mol_*.jbl"))
    assert dumps, list(tmp_path.iterdir())
    payload = joblib.load(dumps[0])
    for key in ("features", "features_IG", "adjs", "adjs_IG", "check_score"):
        assert key in payload, sorted(payload)
