"""Tensor-parallel (GSPMD param sharding) tests on the virtual CPU mesh."""
import numpy as np
import jax
import pytest

from kgcn_tpu.data import Batcher, build_dataset
from kgcn_tpu.data.synthetic import make_ring_dataset
from kgcn_tpu.models.registry import build_model
from kgcn_tpu.parallel.mesh import make_mesh
from kgcn_tpu.parallel.tp import TPTrainer, param_sharding_rules
from kgcn_tpu.runtime.config import default_config
from kgcn_tpu.runtime.train import Trainer


def _cfg(tmp_path):
    cfg = default_config()
    cfg.update({"task": "classification", "save_interval": 0,
                "learning_rate": 0.01, "save_model_path": str(tmp_path)})
    return cfg


def test_param_sharding_rules():
    mesh = make_mesh({"model": 4})
    params = {
        "wide": np.zeros((64, 256)),   # shard last dim
        "small": np.zeros((10, 12)),   # replicate (too small)
        "vec": np.zeros((256,)),       # replicate (rank 1)
    }
    rules = param_sharding_rules(params, mesh, min_dim=128)
    assert rules["wide"].spec == jax.sharding.PartitionSpec(None, "model")
    assert rules["small"].spec == jax.sharding.PartitionSpec()
    assert rules["vec"].spec == jax.sharding.PartitionSpec()


def test_tp_step_matches_single_device(tmp_path):
    cfg = _cfg(tmp_path)
    data = make_ring_dataset(num_pairs=10, seed=0)
    ds, info = build_dataset(data, cfg)
    # multitask tower has 256-wide kernels → genuinely sharded
    y = np.concatenate([data["label"][:, :1]] * 3, axis=1)
    data["label"] = y
    data["mask_label"] = np.ones_like(y, dtype=np.int64)
    ds, info = build_dataset(data, cfg)
    model = build_model("gcn_multitask", info, cfg)

    # SGD: update ∝ grad, so float reduction-order noise stays tiny (Adam's
    # m/sqrt(v) amplifies sign flips of near-zero gradients)
    import optax

    single = Trainer(model, cfg, info, tx=optax.sgd(0.05))
    b = Batcher(ds, info, 20, seed=0)
    batch = b.make_batch(np.arange(20))
    s_state = single.init_state(batch, seed=0)

    mesh = make_mesh({"model": 4})
    tp = TPTrainer(model, cfg, info, tx=optax.sgd(0.05), mesh=mesh, min_dim=128)
    t_state = tp.init_state(b.make_batch(np.arange(20)), seed=0)
    # confirm at least one param is actually sharded over 'model'
    specs = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda s: s.spec, tp._shardings)
    )
    assert any("model" in str(s) for s in specs)
    t_state = t_state.replace(
        params=jax.tree_util.tree_map(
            lambda a, s: jax.device_put(np.asarray(a), s),
            s_state.params, tp._shardings,
        )
    )

    s2, s_cost, _ = single.train_step(s_state, batch)
    t2, t_cost, _ = tp.train_step(t_state, b.make_batch(np.arange(20)))
    np.testing.assert_allclose(float(s_cost), float(t_cost), rtol=1e-4)
    for a, bb in zip(jax.tree_util.tree_leaves(s2.params),
                     jax.tree_util.tree_leaves(t2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-5)
