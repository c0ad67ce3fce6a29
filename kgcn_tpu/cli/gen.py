"""``kgcn-tpu-gen`` — generative (graph VAE) engine.

Subcommands ``train`` / ``reconstruct`` / ``generate``
(reference: gcn_gen.py:292-298).  Reconstruct/generate dump
``{"feature", "dense_adj"}`` joblib files exactly like the reference
(gcn_gen.py:144-154,192-196,225-231).
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np


def _setup(config, with_batcher: bool = True):
    from kgcn_tpu.data import Batcher, load_jbl
    from kgcn_tpu.models.vae import GCNVAE
    from kgcn_tpu.runtime.train import Trainer

    ds, info = load_jbl(config["dataset"], config)
    _ONLYLINK = ("gcn_vae_onlylink", "vae_onlylink",
                 "example_model.model_vae_onlylink:VAE")
    # accept the canonical "model.py" key (and its reference alias) as well
    # as the short "model" key; default_config injects model.py="gcn", so
    # either key naming a link-only model wins
    link_only = any(
        str(config.get(k)) in _ONLYLINK for k in ("model.py", "model")
    )
    pos_weight, norm = 1.0, 1.0
    if link_only:
        # per-dataset edge-density statistics from each graph's TRUE node
        # count (reference: gcn_gen.py:51-74 uses a[2][0] per graph —
        # the padded max_node_num² would inflate pos_weight several-fold)
        pw, nm = [], []
        for g, adj in enumerate(ds.adjs):
            n = (
                float(ds.enabled_node_nums[g])
                if ds.enabled_node_nums is not None
                else float(ds.max_node_num)
            )
            num_all = n * n
            for (_row, _col, val) in adj:
                num_pos = float(len(val))
                num_neg = num_all - num_pos
                pw.append(num_neg / max(num_pos, 1.0))
                nm.append(num_all / max(num_neg, 1.0) * 2.0)
        pos_weight, norm = float(np.mean(pw)), float(np.mean(nm))
    model = GCNVAE(
        channels=info.adj_channel_num,
        feature_dim=info.feature_dim,
        latent_dim=int(config.get("latent_dim", 64)),
        link_only=link_only,
        pos_weight=pos_weight,
        norm=norm,
    )
    trainer = Trainer(model, config, info)
    bs = int(config["batch_size"])
    batcher = None
    if with_batcher:
        # Batcher construction flattens the whole dataset's edge arrays —
        # cmd_train builds its own subset batchers, so skip it there
        batcher = Batcher(ds, info, bs, epsilon_dim=model.latent_dim,
                          seed=int(config.get("seed", 0)))
    return ds, info, model, trainer, batcher


def cmd_train(config):
    from kgcn_tpu.data import Batcher, split_dataset

    ds, info, model, trainer, _ = _setup(config, with_batcher=False)
    train_ds, valid_ds, _, _ = split_dataset(
        ds, config.get("validation_data_rate", 0.3),
        seed=int(config.get("seed", 0)),
    )
    bs = int(config["batch_size"])
    tb = None
    try:
        from kgcn_tpu.runtime import resident

        if resident.resident_enabled(config, train_ds, info):
            tb = resident.ResidentVAEBatcher(
                train_ds, info, bs, model.latent_dim, seed=0
            )
    except Exception as e:
        print(f"[resident] disabled ({type(e).__name__}: {e})")
    if tb is None:
        tb = Batcher(train_ds, info, bs, epsilon_dim=model.latent_dim, seed=0)
    vb = (
        Batcher(valid_ds, info, bs, epsilon_dim=model.latent_dim, seed=1)
        if valid_ds.num > 0
        else None
    )
    state = trainer.init_state(tb.make_batch(np.arange(min(bs, train_ds.num))),
                               seed=int(config.get("seed", 0)))
    t0 = time.time()
    state, fit_info = trainer.fit(state, tb, vb)
    print(f"training time: {time.time() - t0}[sec]")
    return state, fit_info


def _restore(config, trainer, batcher, ds):
    bs = int(config["batch_size"])
    state = trainer.init_state(
        batcher.make_batch(np.arange(min(bs, ds.num))), seed=0
    )
    path = config.get("load_model") or os.path.join(
        config.get("save_model_path", "model"), "model.best.ckpt"
    )
    if not os.path.exists(path):
        path = os.path.join(config.get("save_model_path", "model"), "model.last.ckpt")
    state = trainer.restore(state, path)
    print(f"[LOAD] {path}")
    return state


def cmd_reconstruct(config):
    import joblib

    ds, info, model, trainer, batcher = _setup(config)
    state = _restore(config, trainer, batcher, ds)
    ev = trainer.evaluate(state, batcher)
    out_path = config.get("reconstruction_output", "result/reconstruction.jbl")
    d = os.path.dirname(out_path)
    if d:
        os.makedirs(d, exist_ok=True)
    joblib.dump(ev["prediction"], out_path)
    print(f"[SAVE] {out_path}")
    return ev


def cmd_generate(config):
    import jax
    import joblib

    ds, info, model, trainer, batcher = _setup(config)
    state = _restore(config, trainer, batcher, ds)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    num = int(config.get("generation_num", 10))
    bs = int(config["batch_size"])
    outs = []
    gen = jax.jit(
        lambda b: model.apply(variables, b, train=False, method=model.generate)
    )
    made = 0
    while made < num:
        batch = batcher.make_batch(np.arange(min(bs, ds.num)))
        pred = jax.device_get(gen(batch))
        take = min(bs, num - made)
        outs.append({k: v[:take] for k, v in pred.items()})
        made += take
    result = {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}
    out_path = config.get("generation_output", "result/generated.jbl")
    d = os.path.dirname(out_path)
    if d:
        os.makedirs(d, exist_ok=True)
    joblib.dump(result, out_path)
    print(f"[SAVE] {out_path}")
    return result


def main(argv=None):
    p = argparse.ArgumentParser(prog="kgcn-tpu-gen")
    p.add_argument("mode", choices=["train", "reconstruct", "generate"])
    p.add_argument("--config", required=True)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    from kgcn_tpu.runtime.config import load_config

    config = load_config(args.config)
    from kgcn_tpu.runtime.jax_setup import setup_jax

    setup_jax(config, cpu=args.cpu)
    {"train": cmd_train, "reconstruct": cmd_reconstruct,
     "generate": cmd_generate}[args.mode](config)


if __name__ == "__main__":
    main()
