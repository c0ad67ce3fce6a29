"""Every config shipped in example_config/ trains end-to-end with its
shipped example_jbl dataset (outputs remapped to tmp, epochs clamped)."""
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# config file → engine entry point ("main" / "gen" / "pair")
CONFIGS = [
    ("sample.json", "main"),
    ("synth.json", "main"),
    ("gin.json", "main"),
    ("gat.json", "main"),
    ("multitask.json", "main"),
    ("multimodal.json", "main"),
    ("node_label.json", "main"),
    ("kg.json", "main"),
    ("vae.json", "gen"),
    ("pair.json", "pair"),
]


def _remap(cfg, tmp_path):
    cfg["dataset"] = os.path.join(REPO, cfg["dataset"])
    cfg["epoch"] = 2
    cfg["save_model_path"] = str(tmp_path / "model")
    cfg["make_plot"] = False
    for k in list(cfg):
        if k.startswith(("save_result", "save_info", "save_edge_result")):
            cfg[k] = str(tmp_path / (k + ".out"))
        if k in ("save_model", "load_model"):
            cfg[k] = str(tmp_path / "model" / "last.ckpt")
        if k in ("plot_path",):
            cfg[k] = str(tmp_path) + "/"
        if k in ("reconstruction_output", "generation_output"):
            cfg[k] = str(tmp_path / (k + ".jbl"))
    return cfg


@pytest.mark.parametrize("config_name,engine", CONFIGS)
def test_shipped_config_trains(tmp_path, config_name, engine):
    path = os.path.join(REPO, "example_config", config_name)
    with open(path) as f:
        cfg = _remap(json.load(f), tmp_path)
    cfg_path = tmp_path / "config.json"
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    if engine == "main":
        from kgcn_tpu.cli.main import main

        main(["train", "--config", str(cfg_path)])
        # the KG engine keeps only model.last.ckpt (no val-epoch loop)
        assert (os.path.exists(tmp_path / "model" / "model.best.ckpt")
                or os.path.exists(tmp_path / "model" / "model.last.ckpt"))
    elif engine == "gen":
        from kgcn_tpu.cli.gen import main

        main(["train", "--config", str(cfg_path)])
        assert os.path.exists(tmp_path / "model" / "model.best.ckpt")
    else:
        from kgcn_tpu.cli.pair import main

        main(["train", "--config", str(cfg_path)])
        assert os.path.exists(tmp_path / "model" / "model.last.ckpt")
