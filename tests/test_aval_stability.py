"""No jitted train step may change its state's avals (dtype/shape/sharding/
weak-type) between input and output: an aval mismatch silently recompiles
the step on its second call — 10s+ per compilation on remote-compile
backends — and sharding drift can replicate sharded tables onto every
device (the big-graph Adam-moment bug fixed in parallel/big_graph.py)."""
import jax
import numpy as np
import pytest

from kgcn_tpu.data import Batcher, build_dataset
from kgcn_tpu.data.synthetic import make_ring_dataset
from kgcn_tpu.models.registry import build_model
from kgcn_tpu.runtime.config import default_config
from kgcn_tpu.runtime.train import Trainer


def _leaf_desc(tree):
    return [
        (x.dtype.name, tuple(x.shape), str(x.sharding),
         getattr(x, "weak_type", None))
        for x in jax.tree_util.tree_leaves(tree)
        if isinstance(x, jax.Array)
    ]


def _setup(batch_size=8, num_pairs=16, task="classification"):
    cfg = default_config()
    cfg.update({"task": task, "normalize_adj_flag": True,
                "learning_rate": 0.01})
    data = make_ring_dataset(num_pairs=num_pairs, num_nodes=10, seed=0)
    ds, info = build_dataset(data, cfg)
    return cfg, ds, info


def test_trainer_step_aval_stable():
    cfg, ds, info = _setup()
    b = Batcher(ds, info, 8, seed=0)
    model = build_model("gcn", info, cfg)
    tr = Trainer(model, cfg, info)
    batch = b.make_batch(np.arange(8))
    state = tr.init_state(batch, seed=0)
    state, *_ = tr.train_step(state, batch)
    before = _leaf_desc(state)
    state, *_ = tr.train_step(state, batch)
    assert before == _leaf_desc(state), [
        (x, y) for x, y in zip(before, _leaf_desc(state)) if x != y
    ]


def test_dp_trainer_step_aval_stable():
    from kgcn_tpu.parallel.dp import DPTrainer, ShardedBatcher
    from kgcn_tpu.parallel.mesh import make_mesh

    cfg, ds, info = _setup(num_pairs=16)
    mesh = make_mesh({"data": 8})
    model = build_model("gcn", info, cfg)
    tr = DPTrainer(model, cfg, info, mesh=mesh)
    sb = ShardedBatcher(Batcher(ds, info, 2, seed=0), 8)
    batch = sb.make_batch(np.arange(16))
    state = tr.init_state(batch, seed=0)
    state, *_ = tr.train_step(state, batch)
    before = _leaf_desc(state)
    state, *_ = tr.train_step(state, batch)
    after = _leaf_desc(state)
    assert before == after, [(x, y) for x, y in zip(before, after) if x != y]


def test_tp_trainer_step_aval_stable():
    from kgcn_tpu.parallel.mesh import make_mesh
    from kgcn_tpu.parallel.tp import TPTrainer

    cfg, ds, info = _setup()
    # 3-task labels for the wide multitask tower (mirrors __graft_entry__)
    ds.labels = np.concatenate([ds.labels[:, :1]] * 3, axis=1)
    ds.mask_label = np.ones_like(ds.labels)
    info.label_dim = 3
    info.pos_weight = None
    mesh = make_mesh({"data": 4, "model": 2})
    model = build_model(
        "gcn_multitask", info, {**cfg, "task": "multitask_classification"}
    )
    tr = TPTrainer(model, cfg, info, mesh=mesh, min_dim=8)
    b = Batcher(ds, info, 4, seed=0)
    batch = b.make_batch(np.arange(4))
    state = tr.init_state(batch, seed=0)
    state, *_ = tr.train_step(state, batch)
    before = _leaf_desc(state)
    state, *_ = tr.train_step(state, batch)
    after = _leaf_desc(state)
    assert before == after, [(x, y) for x, y in zip(before, after) if x != y]


def test_big_graph_fit_resident_state_reusable_by_train_step():
    """fit_resident's returned state must feed train_step without aval
    drift (mixed fit/fit_resident usage)."""
    from kgcn_tpu.data.synthetic import make_kg_dataset
    from kgcn_tpu.models.kg import sample_negatives
    from kgcn_tpu.parallel.big_graph import from_kg_dataset
    from kgcn_tpu.parallel.mesh import make_mesh

    cfg = default_config()
    cfg.update({"with_feature": False, "with_node_embedding": True,
                "embedding_dim": 8, "task": "link_prediction",
                "kg_encoder": "embedding"})
    ds, info = build_dataset(make_kg_dataset(num_entities=32,
                                             num_relations=2, seed=0), cfg)
    mesh = make_mesh({"data": 8})
    bg = from_kg_dataset(ds, info, cfg, mesh)
    state = bg.init_state(seed=0)
    ll = np.asarray(ds.label_list[0], np.int32)
    state, _ = bg.fit_resident(state, ll, epochs=2, seed=0)
    before = _leaf_desc(state)
    ll6 = sample_negatives(
        np.concatenate([ll, ll], axis=1), np.arange(32, dtype=np.int32),
        np.random.RandomState(0),
    )
    state, _ = bg.train_step(state, ll6)
    after = _leaf_desc(state)
    assert before == after, [(x, y) for x, y in zip(before, after) if x != y]
