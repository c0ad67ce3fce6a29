"""KG link-prediction engine tests."""
import numpy as np
import pytest

from kgcn_tpu.data import build_dataset
from kgcn_tpu.data.synthetic import make_kg_dataset
from kgcn_tpu.models.kg import KGBatcher, KGLinkPredictor, sample_negatives
from kgcn_tpu.runtime.config import default_config
from kgcn_tpu.runtime.train import Trainer


def _cfg():
    cfg = default_config()
    cfg.update(
        {"with_feature": False, "with_node_embedding": True,
         "embedding_dim": 16, "epoch": 30, "batch_size": 1,
         "learning_rate": 0.05, "task": "link_prediction",
         "save_interval": 0, "label_batch_size": 64}
    )
    return cfg


def test_negative_sampling_modes():
    ll = np.array([[0, 0, 1, 0, 0, 0], [2, 1, 3, 0, 0, 0]], np.int32)
    rng = np.random.RandomState(0)
    nodes = np.arange(10, dtype=np.int32)
    r = sample_negatives(ll, nodes, rng, "right")
    assert (r[:, 3] == ll[:, 0]).all() and (r[:, 4] == ll[:, 1]).all()
    l = sample_negatives(ll, nodes, rng, "left")
    assert (l[:, 5] == ll[:, 2]).all()
    b = sample_negatives(ll, nodes, rng, "both")
    # exactly one side differs or matches by chance; relation preserved
    assert (b[:, 4] == ll[:, 1]).all()


@pytest.mark.parametrize("encoder", ["embedding", "gcn"])
def test_kg_training_learns_ranking(tmp_path, encoder):
    cfg = _cfg()
    cfg["save_model_path"] = str(tmp_path)
    data = make_kg_dataset(num_entities=30, num_relations=2, seed=0)
    ds, info = build_dataset(data, cfg)
    assert info.all_node_num == 30
    assert info.adj_channel_num == 2
    model = KGLinkPredictor(
        all_node_num=30, embedding_dim=16, channels=2, encoder=encoder
    )
    trainer = Trainer(model, cfg, info)
    kb = KGBatcher(ds, info, label_batch_size=60, seed=0)
    state = trainer.init_state(next(kb.batches()), seed=0)
    accs = []
    for _ in range(40):
        state, cost, metrics, _ = trainer.run_epoch(state, kb)
        m = metrics[-1]
        accs.append(float(m["correct_count"]) / float(m["count"]))
    assert accs[-1] > 0.8, f"{encoder}: ranking acc {accs[-1]}"


def test_kg_left_prediction_ranks_true_head(tmp_path):
    cfg = _cfg()
    cfg["save_model_path"] = str(tmp_path)
    data = make_kg_dataset(num_entities=20, num_relations=1, seed=0)
    ds, info = build_dataset(data, cfg)
    model = KGLinkPredictor(all_node_num=20, embedding_dim=16, channels=1)
    trainer = Trainer(model, cfg, info)
    kb = KGBatcher(ds, info, label_batch_size=40, seed=0)
    batch = next(kb.batches())
    state = trainer.init_state(batch, seed=0)
    for _ in range(60):
        state, *_ = trainer.run_epoch(state, kb)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    tails = np.array([1, 5], np.int32)  # true heads: 0 and 4
    rels = np.array([0, 0], np.int32)
    scores = model.apply(
        variables, batch, tails, rels, method=model.left_prediction
    )
    scores = np.asarray(scores)
    assert scores.shape == (2, 20)
    # the true head should rank in the top-3 entities
    for row, true_head in zip(scores, (0, 4)):
        assert true_head in np.argsort(-row)[:3]
