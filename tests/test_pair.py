"""Pair-ranking (RankNet) engine test."""
import numpy as np

from kgcn_tpu.data import build_dataset
from kgcn_tpu.data.synthetic import make_ring_dataset
from kgcn_tpu.models.pair import GCNPairRanker, PairBatcher
from kgcn_tpu.runtime.config import default_config
from kgcn_tpu.runtime.train import Trainer


def test_pair_ranking_learns(tmp_path):
    cfg = default_config()
    cfg.update(
        {"epoch": 20, "batch_size": 10, "learning_rate": 0.01,
         "normalize_adj_flag": True, "task": "classification",
         "save_model_path": str(tmp_path), "save_interval": 0}
    )
    data = make_ring_dataset(num_pairs=30, seed=0)
    ds, info = build_dataset(data, cfg)
    y = np.argmax(data["label"], axis=1)
    # preference: class-1 graphs (5-rings) preferred over class-0
    idx0 = np.nonzero(y == 0)[0]
    idx1 = np.nonzero(y == 1)[0]
    rng = np.random.RandomState(0)
    pairs = np.stack(
        [rng.choice(idx0, 60), rng.choice(idx1, 60)], axis=1
    )
    model = GCNPairRanker(channels=info.adj_channel_num, label_dim=1)
    trainer = Trainer(model, cfg, info)
    pb = PairBatcher(ds, info, pairs, batch_size=10, seed=0)
    state = trainer.init_state(pb.make_batch(np.arange(10)), seed=0)
    accs = []
    for _ in range(90):
        state, cost, metrics, _ = trainer.run_epoch(state, pb)
        tot_c = sum(float(m["correct_count"]) for m in metrics)
        tot_n = sum(float(m["count"]) for m in metrics)
        accs.append(tot_c / tot_n)
    # sigmoid-saturated reference tower learns slowly; assert clear progress
    assert accs[-1] > 0.7, f"pair ranking acc={accs[-1]}"
