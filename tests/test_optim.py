"""runtime/optim.py: optimizer + LR-schedule factory."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from kgcn_tpu.runtime.optim import make_optimizer, make_schedule


def _one_update(tx, params, grads):
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    return optax.apply_updates(params, updates)


@pytest.mark.parametrize(
    "name", ["adam", "adamw", "sgd", "momentum", "rmsprop", "lamb"]
)
def test_every_optimizer_builds_and_steps(name):
    tx = make_optimizer({"optimizer": name, "learning_rate": 0.1,
                         "weight_decay": 0.01})
    params = {"w": jnp.ones((3, 2))}
    grads = {"w": jnp.full((3, 2), 0.5)}
    new = _one_update(tx, params, grads)
    assert np.all(np.isfinite(np.asarray(new["w"])))
    assert not np.allclose(np.asarray(new["w"]), 1.0)


def test_default_matches_bare_adam():
    """No config extras → numerically the reference's plain Adam."""
    tx = make_optimizer({"learning_rate": 0.05})
    ref = optax.adam(0.05)
    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    grads = {"w": jnp.full((2, 3), 0.25)}
    np.testing.assert_allclose(
        np.asarray(_one_update(tx, params, grads)["w"]),
        np.asarray(_one_update(ref, params, grads)["w"]),
        rtol=1e-7,
    )


def test_schedules():
    lr = 0.1
    assert make_schedule({"learning_rate": lr}) == lr
    cos = make_schedule({"learning_rate": lr, "lr_schedule": "cosine",
                         "decay_steps": 100})
    assert float(cos(0)) == pytest.approx(lr)
    assert float(cos(100)) == pytest.approx(0.0, abs=1e-8)
    wc = make_schedule({"learning_rate": lr, "lr_schedule": "warmup_cosine",
                        "warmup_steps": 10, "decay_steps": 100})
    assert float(wc(0)) == pytest.approx(0.0, abs=1e-8)
    assert float(wc(10)) == pytest.approx(lr)
    ex = make_schedule({"learning_rate": lr, "lr_schedule": "exponential",
                        "decay_steps": 50, "decay_rate": 0.5})
    assert float(ex(50)) == pytest.approx(lr * 0.5)
    with pytest.raises(ValueError):
        make_schedule({"lr_schedule": "nope"})
    with pytest.raises(ValueError):
        make_optimizer({"optimizer": "nope"})


def test_gradient_clip_in_chain():
    tx = make_optimizer({"optimizer": "sgd", "learning_rate": 1.0,
                         "gradient_clip": 0.5})
    params = {"w": jnp.zeros(4)}
    grads = {"w": jnp.full(4, 10.0)}  # norm 20 → clipped to 0.5
    new = _one_update(tx, params, grads)
    assert np.linalg.norm(np.asarray(new["w"])) == pytest.approx(0.5, rel=1e-5)


def test_trainer_uses_configured_optimizer():
    """Trainer with optimizer: sgd + cosine schedule trains the synthetic
    task end-to-end (schedule count advances with steps)."""
    from kgcn_tpu.data import Batcher, build_dataset
    from kgcn_tpu.data.synthetic import make_ring_dataset
    from kgcn_tpu.models.registry import build_model
    from kgcn_tpu.runtime.config import default_config
    from kgcn_tpu.runtime.train import Trainer

    cfg = default_config()
    cfg.update({"task": "classification", "optimizer": "momentum",
                "lr_schedule": "cosine", "decay_steps": 50,
                "learning_rate": 0.05, "normalize_adj_flag": True})
    data = make_ring_dataset(num_pairs=16, num_nodes=10, seed=0)
    ds, info = build_dataset(data, cfg)
    b = Batcher(ds, info, 8, seed=0)
    model = build_model("gcn", info, cfg)
    trainer = Trainer(model, cfg, info)
    state = trainer.init_state(b.make_batch(np.arange(8)), seed=0)
    costs = []
    for ep in range(3):
        state, cost, _, _ = trainer.run_epoch(state, b, shuffle=True, epoch=ep)
        costs.append(cost)
    assert np.all(np.isfinite(costs))


def test_grad_accum_matches_big_batch_sgd():
    """N accumulated micro-batches == one update on the averaged gradient."""
    tx = make_optimizer({"optimizer": "sgd", "learning_rate": 0.1,
                         "grad_accum_steps": 2})
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    g1 = {"w": jnp.array([1.0, 2.0, 3.0])}
    g2 = {"w": jnp.array([3.0, 2.0, 1.0])}
    updates, state = tx.update(g1, state, params)
    mid = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(mid["w"]), 1.0)  # no update yet
    updates, state = tx.update(g2, state, mid)
    final = optax.apply_updates(mid, updates)
    # mean grad = [2, 2, 2] → w = 1 - 0.1·2
    np.testing.assert_allclose(np.asarray(final["w"]), 0.8, rtol=1e-6)
