"""``kgcn-tpu-pair`` — pairwise preference-ranking engine.

Reference: gcn_pair.py (``train`` / ``infer``): RankNet preference learning
over graph pairs listed in ``graph_index_list`` (pair[1] preferred over
pair[0]); inference dumps both tower scores per pair.
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np


def _setup(config):
    from kgcn_tpu.data import load_jbl
    from kgcn_tpu.models.pair import GCNPairRanker, PairBatcher
    from kgcn_tpu.runtime.train import Trainer

    ds, info = load_jbl(config["dataset"], config)
    pairs = ds.graph_index_list
    if pairs is None:
        raise ValueError("pair engine needs graph_index_list in the dataset")
    pairs = np.asarray(pairs).reshape(-1, 2)
    model = GCNPairRanker(
        channels=info.adj_channel_num,
        label_dim=info.label_dim or 1,
        dropout_rate=float(config.get("dropout_rate", 0.2)),
    )
    trainer = Trainer(model, config, info)
    pb = None
    try:
        from kgcn_tpu.models.pair import ResidentPairBatcher
        from kgcn_tpu.runtime import resident

        # the pair engine consumes graph_index_list itself, so it does not
        # disqualify the dataset here
        if resident.resident_enabled(config, ds, info, allow_index_list=True):
            pb = ResidentPairBatcher(
                ds, info, pairs, int(config["batch_size"]),
                seed=int(config.get("seed", 0)),
            )
    except Exception as e:
        print(f"[resident] disabled ({type(e).__name__}: {e})")
    if pb is None:
        pb = PairBatcher(ds, info, pairs, int(config["batch_size"]),
                         seed=int(config.get("seed", 0)))
    return ds, info, trainer, pb


def cmd_train(config):
    ds, info, trainer, pb = _setup(config)
    state = trainer.init_state(
        pb.make_batch(np.arange(min(int(config["batch_size"]), len(pb.pairs)))),
        seed=int(config.get("seed", 0)),
    )
    t0 = time.time()
    for epoch in range(int(config.get("epoch", 50))):
        state, cost, metrics, _ = trainer.run_epoch(state, pb)
        tc = sum(float(m["correct_count"]) for m in metrics)
        tn = sum(float(m["count"]) for m in metrics)
        print(f"epoch {epoch}, training cost {cost:.6g} (pair acc={tc / max(tn, 1):.4g})")
    print(f"training time: {time.time() - t0}[sec]")
    from kgcn_tpu.runtime import checkpoint as ckpt

    model_dir = config.get("save_model_path") or "model"
    ckpt.save_checkpoint(ckpt.ckpt_name(model_dir, "last"),
                         trainer.state_tree(state, 0, 0.0))
    return state


def cmd_infer(config):
    ds, info, trainer, pb = _setup(config)
    bs = int(config["batch_size"])
    state = trainer.init_state(
        pb.make_batch(np.arange(min(bs, len(pb.pairs)))), seed=0
    )
    path = config.get("load_model") or os.path.join(
        config.get("save_model_path", "model"), "model.last.ckpt"
    )
    state = trainer.restore(state, path)
    print(f"[LOAD] {path}")
    ev = trainer.evaluate(state, pb)
    out_path = config.get("save_result_test") or "result/pair_scores.csv"
    d = os.path.dirname(out_path)
    if d:
        os.makedirs(d, exist_ok=True)
    pred = np.asarray(ev["prediction"])  # [P, 2, label_dim]
    with open(out_path, "w") as f:
        f.write("score0,score1\n")
        for row in pred:
            f.write(f"{row[0, 0]:.6g},{row[1, 0]:.6g}\n")
    print(f"[SAVE] {out_path}")
    return ev


def main(argv=None):
    p = argparse.ArgumentParser(prog="kgcn-tpu-pair", description=__doc__)
    p.add_argument("mode", choices=["train", "infer"])
    p.add_argument("--config", required=True)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    from kgcn_tpu.runtime.config import load_config

    config = load_config(args.config)
    from kgcn_tpu.runtime.jax_setup import setup_jax

    setup_jax(config, cpu=args.cpu)
    (cmd_train if args.mode == "train" else cmd_infer)(config)


if __name__ == "__main__":
    main()
