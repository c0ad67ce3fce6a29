"""Reference script-path invocation surface (split from
test_reference_configs.py so the parallel scheduler can spread these
subprocess-heavy cases across workers)."""
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
