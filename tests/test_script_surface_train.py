"""Reference script-path invocation surface (split from
test_reference_configs.py so the parallel scheduler can spread these
subprocess-heavy cases across workers)."""
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


import pytest


@pytest.mark.slow_e2e
def test_script_surface_forwarders(tmp_path):
    """The reference's script-path invocation surface (used verbatim by the
    KNIME GCN-K Java nodes, GCNLearnerNodeModel.java:275-277) works against
    this repo: ``python gcn.py <mode> --config <file>``.

    Marked slow_e2e (two full subprocess train/infer cycles; the same
    forwarder surface is exercised every default run by
    test_script_surface_viz and test_knime): excluded from the default
    suite, run explicitly with ``-m slow_e2e``."""
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
