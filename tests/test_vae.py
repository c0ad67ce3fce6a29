"""Graph VAE engine tests (reference: gcn_gen.py + model_vae.py)."""
import json
import os

import joblib
import numpy as np
import pytest

from kgcn_tpu.data.synthetic import make_ring_dataset


@pytest.fixture(scope="module")
def vae_workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("vaework")
    joblib.dump(make_ring_dataset(num_pairs=15, seed=0), d / "data.jbl")
    cfg = {
        "dataset": str(d / "data.jbl"),
        "validation_data_rate": 0.2,
        "epoch": 3,
        "batch_size": 10,
        "learning_rate": 0.01,
        "task": "generation",
        "save_model_path": str(d / "model"),
        "save_interval": 0,
        "patience": 0,
        "latent_dim": 16,
        "reconstruction_output": str(d / "result/recon.jbl"),
        "generation_output": str(d / "result/gen.jbl"),
        "generation_num": 7,
        "seed": 0,
    }
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    return d


def test_vae_train_reconstruct_generate(vae_workdir):
    from kgcn_tpu.cli.gen import cmd_generate, cmd_reconstruct, cmd_train
    from kgcn_tpu.runtime.config import load_config

    cfg = load_config(str(vae_workdir / "config.json"))
    state, fit_info = cmd_train(cfg)
    assert all(np.isfinite(h["training_cost"]) for h in fit_info["history"])
    assert os.path.exists(vae_workdir / "model/model.best.ckpt")

    ev = cmd_reconstruct(cfg)
    recon = joblib.load(vae_workdir / "result/recon.jbl")
    assert set(recon) == {"feature", "dense_adj"}
    assert recon["feature"].shape == (30, 10, 3)
    assert recon["dense_adj"].shape == (30, 1, 10, 10)
    assert (recon["feature"] >= 0).all() and (recon["feature"] <= 1).all()

    gen = cmd_generate(cfg)
    g = joblib.load(vae_workdir / "result/gen.jbl")
    assert g["feature"].shape == (7, 10, 3)
    assert g["dense_adj"].shape == (7, 1, 10, 10)


def test_vae_learns_reconstruction(vae_workdir):
    """A few more epochs should drive reconstruction BCE down."""
    from kgcn_tpu.data import Batcher, load_jbl
    from kgcn_tpu.models.vae import GCNVAE
    from kgcn_tpu.runtime.config import load_config
    from kgcn_tpu.runtime.train import Trainer

    cfg = load_config(str(vae_workdir / "config.json"))
    cfg["epoch"] = 12
    ds, info = load_jbl(cfg["dataset"], cfg)
    model = GCNVAE(channels=1, feature_dim=3, latent_dim=16)
    trainer = Trainer(model, cfg, info)
    b = Batcher(ds, info, 10, epsilon_dim=16, seed=0)
    state = trainer.init_state(b.make_batch(np.arange(10)), seed=0)
    costs = []
    for _ in range(12):
        state, c, _, _ = trainer.run_epoch(state, b)
        costs.append(c)
    assert costs[-1] < costs[0]


def test_vae_link_only(vae_workdir):
    """Link-only variant (model_vae_onlylink.py): pos_weight/norm from edge
    density, adjacency-only decode, feature passthrough prediction."""
    from kgcn_tpu.cli.gen import cmd_generate, cmd_train
    from kgcn_tpu.runtime.config import load_config

    cfg = load_config(str(vae_workdir / "config.json"))
    cfg["model"] = "gcn_vae_onlylink"
    cfg["save_model_path"] = str(vae_workdir / "model_ol")
    cfg["generation_output"] = str(vae_workdir / "result/gen_ol.jbl")
    state, fit_info = cmd_train(cfg)
    assert all(np.isfinite(h["training_cost"]) for h in fit_info["history"])

    cmd_generate(cfg)
    g = joblib.load(vae_workdir / "result/gen_ol.jbl")
    assert "dense_adj" in g and "feature" not in g
    assert g["dense_adj"].shape == (7, 1, 10, 10)
