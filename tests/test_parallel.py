"""Data-parallel training on the 8-virtual-device CPU mesh."""
import numpy as np
import jax
import pytest

from kgcn_tpu.data import build_dataset, Batcher
from kgcn_tpu.data.synthetic import make_ring_dataset
from kgcn_tpu.models.registry import build_model
from kgcn_tpu.parallel.dp import DPTrainer, ShardedBatcher
from kgcn_tpu.parallel.mesh import make_mesh
from kgcn_tpu.runtime.config import default_config
from kgcn_tpu.runtime.train import Trainer


def _cfg():
    cfg = default_config()
    cfg.update(
        {"epoch": 5, "batch_size": 5, "learning_rate": 0.01,
         "shuffle_data": True, "patience": 0, "save_interval": 0,
         "normalize_adj_flag": True, "task": "classification"}
    )
    return cfg


def test_mesh_construction():
    mesh = make_mesh({"data": 4, "model": 2})
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh({"data": -1})
    assert mesh.shape["data"] == len(jax.devices())


def test_dp_training_matches_single_device_loss_scale(tmp_path):
    assert len(jax.devices()) >= 8
    cfg = _cfg()
    cfg["save_model_path"] = str(tmp_path)
    data = make_ring_dataset(num_pairs=20, seed=0)
    ds, info = build_dataset(data, cfg)
    mesh = make_mesh({"data": 4})
    model = build_model("gcn", info, cfg)

    trainer = DPTrainer(model, cfg, info, mesh=mesh)
    local_b = Batcher(ds, info, batch_size=5, seed=0)
    sb = ShardedBatcher(local_b, 4)  # global batch 20
    state = trainer.init_state(sb.make_batch(np.arange(20)), seed=0)
    state, cost, metrics, n = trainer.run_epoch(state, sb, shuffle=True)
    assert np.isfinite(cost)
    assert n == 40

    ev = trainer.evaluate(state, sb)
    assert ev["num"] == 40
    assert ev["prediction"].shape == (40, 2)


def test_dp_gradient_equivalence(tmp_path):
    """One DP step over 4 devices == one single-device step on the
    concatenated global batch (same cost, same updated params)."""
    cfg = _cfg()
    cfg["save_model_path"] = str(tmp_path)
    data = make_ring_dataset(num_pairs=10, seed=0)
    ds, info = build_dataset(data, cfg)
    model = build_model("gin", info, cfg)  # no dropout/BN randomness

    # single device: batch of 20
    single = Trainer(model, cfg, info)
    b20 = Batcher(ds, info, batch_size=20, seed=0)
    s_state = single.init_state(b20.make_batch(np.arange(20)), seed=0)

    # 4-way DP: local batches of 5
    mesh = make_mesh({"data": 4})
    dp = DPTrainer(model, cfg, info, mesh=mesh)
    b5 = Batcher(ds, info, batch_size=5, seed=0)
    sb = ShardedBatcher(b5, 4)
    d_state = dp.init_state(sb.make_batch(np.arange(20)), seed=0)

    # align params (deep-copy: train_step donates its input state buffers)
    import jax.numpy as jnp
    d_state = d_state.replace(
        params=jax.tree_util.tree_map(jnp.array, s_state.params)
    )

    idx = np.arange(20)
    s_state2, s_cost, _ = single.train_step(s_state, b20.make_batch(idx))
    d_state2, d_cost, _ = dp.train_step(d_state, sb.make_batch(idx))

    # summed cost identical
    np.testing.assert_allclose(float(s_cost), float(d_cost), rtol=1e-4)
    # cost_opt is mean-per-local-batch in DP vs mean-per-global-batch single;
    # both equal since local batches are equal sized → updates must match
    flat_s = jax.tree_util.tree_leaves(s_state2.params)
    flat_d = jax.tree_util.tree_leaves(d_state2.params)
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_dp_fit_learns(tmp_path):
    cfg = _cfg()
    cfg.update({"epoch": 25, "save_model_path": str(tmp_path)})
    data = make_ring_dataset(num_pairs=60, seed=0)
    ds, info = build_dataset(data, cfg)
    from kgcn_tpu.data import split_dataset

    tr, va, _, _ = split_dataset(ds, 0.2, seed=0)
    mesh = make_mesh({"data": 4})
    model = build_model("gcn", info, cfg)
    dp = DPTrainer(model, cfg, info, mesh=mesh)
    tb = ShardedBatcher(Batcher(tr, info, 6, seed=0), 4)
    vb = ShardedBatcher(Batcher(va, info, 6, seed=0), 4)
    state = dp.init_state(tb.make_batch(np.arange(24)), seed=0)
    state, _ = dp.fit(state, tb, vb, log=lambda s: None)
    ev = dp.evaluate(state, vb, "validation_")
    assert float(ev["metrics"]["validation_accuracy"]) >= 0.7


def test_dp_resident_epoch_matches_streaming(tmp_path):
    """ShardedResidentBatcher (whole-epoch scan inside shard_map) is
    bit-identical to the streaming ShardedBatcher on the same data order."""
    import jax.numpy as jnp

    from kgcn_tpu.parallel.dp import ShardedResidentBatcher
    from kgcn_tpu.runtime.resident import ResidentBatcher

    cfg = _cfg()
    data = make_ring_dataset(num_pairs=60, seed=0)
    ds, info = build_dataset(data, cfg)
    mesh = make_mesh({"data": 8})
    model = build_model("gcn", info, cfg)
    tr = DPTrainer(model, cfg, info, mesh=mesh)
    bs_loc = 4
    sb = ShardedBatcher(Batcher(ds, info, bs_loc, seed=3), 8)
    srb = ShardedResidentBatcher(ResidentBatcher(ds, info, bs_loc, seed=3), 8)
    b0 = sb.make_batch(np.arange(32))
    s1 = tr.init_state(b0, seed=0)
    s2 = tr.init_state(b0, seed=0)
    for ep in range(2):
        s1, c1, _, n1 = tr.run_epoch(s1, sb, shuffle=True, epoch=ep)
        s2, c2, _, n2 = tr.run_epoch(s2, srb, shuffle=True, epoch=ep)
        assert n1 == n2
        assert abs(c1 - c2) < 1e-5
    diffs = [
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params))
    ]
    assert max(diffs) < 1e-5
    e1 = tr.evaluate(s1, sb)
    e2 = tr.evaluate(s1, srb)
    assert abs(e1["cost"] - e2["cost"]) < 1e-6
    np.testing.assert_allclose(e1["prediction"], e2["prediction"], atol=1e-5)


def test_process_index_range_partitions_exactly():
    """Multi-host input contract: per-process slices cover [0, n) exactly
    once, sizes differing by at most one item."""
    from kgcn_tpu.parallel.mesh import process_index_range

    for n, np_ in [(10, 3), (8, 8), (7, 2), (5, 6), (0, 4), (100, 1)]:
        spans = [process_index_range(n, np_, p) for p in range(np_)]
        covered = []
        for start, stop in spans:
            covered.extend(range(start, stop))
        assert covered == list(range(n)), (n, np_, spans)
        sizes = [stop - start for start, stop in spans]
        assert max(sizes) - min(sizes) <= 1

    # defaults resolve from the live (single-process) runtime
    import jax

    start, stop = process_index_range(12)
    assert (start, stop) == (0, 12) and jax.process_count() == 1


def test_initialize_distributed_noop_when_unconfigured(monkeypatch):
    """Single-process: already-initialized state short-circuits; config
    keys are forwarded to jax.distributed.initialize."""
    from kgcn_tpu.parallel import mesh as M

    calls = {}

    class FakeDist:
        def initialize(self, **kw):
            calls.update(kw)

    monkeypatch.setattr(M.jax, "distributed", FakeDist())
    import jax._src.distributed as _dist

    monkeypatch.setattr(_dist.global_state, "client", None, raising=False)
    ran = M.initialize_distributed(
        {"coordinator_address": "h:1234", "num_processes": 4,
         "process_id": 2, "local_device_ids": None}
    )
    assert ran and calls == {"coordinator_address": "h:1234",
                             "num_processes": 4, "process_id": 2}

    monkeypatch.setattr(_dist.global_state, "client", object(), raising=False)
    assert M.initialize_distributed({}) is False


def test_dp_step_honours_bfloat16_precision():
    """precision: bfloat16 must cast the payload on the DP step path (it
    used to apply only on the resident epoch runner)."""
    import jax.numpy as jnp

    from kgcn_tpu.data import Batcher, build_dataset
    from kgcn_tpu.data.synthetic import make_ring_dataset
    from kgcn_tpu.models.registry import build_model
    from kgcn_tpu.parallel.dp import DPTrainer, ShardedBatcher
    from kgcn_tpu.parallel.mesh import make_mesh
    from kgcn_tpu.runtime.config import default_config

    cfg = default_config()
    cfg.update({"task": "classification", "precision": "bfloat16",
                "save_interval": 0})
    data = make_ring_dataset(num_pairs=16, seed=0)
    ds, info = build_dataset(data, cfg)
    mesh = make_mesh({"data": 4})
    model = build_model("gcn", info, cfg)
    tr = DPTrainer(model, cfg, info, mesh=mesh)
    assert tr.compute_dtype == jnp.bfloat16
    sb = ShardedBatcher(Batcher(ds, info, 4, seed=0), 4)
    state = tr.init_state(sb.make_batch(np.arange(16)), seed=0)
    state, cost, metrics, n = tr.run_epoch(state, sb)
    assert np.isfinite(cost)
    ev = tr.evaluate(state, sb)
    assert np.isfinite(ev["cost"])


def test_make_mesh_rejects_non_dividing_wildcard():
    import pytest

    from kgcn_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="divide"):
        make_mesh({"model": 3, "data": -1})  # 8 % 3 != 0
    with pytest.raises(ValueError, match="devices"):
        make_mesh({"model": 16, "data": 1})  # more than 8 devices
