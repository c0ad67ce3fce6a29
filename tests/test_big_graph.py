"""Sharded big-graph KG training (parallel/big_graph.py): exact parity with
the single-device KGLinkPredictor, and end-to-end learning over the mesh.

The reference runs whole-KG training batch=1 on one device (sample_kg);
this path shards the embedding table + adjacency across devices (SURVEY.md
§2.11 graph/edge partitioning)."""
import jax
import numpy as np
import pytest

from kgcn_tpu.data import build_dataset
from kgcn_tpu.data.batcher import Batcher
from kgcn_tpu.data.synthetic import make_kg_dataset
from kgcn_tpu.models.kg import KGLinkPredictor, sample_negatives
from kgcn_tpu.parallel.big_graph import BigGraphKGTrainer, from_kg_dataset
from kgcn_tpu.parallel.mesh import make_mesh
from kgcn_tpu.runtime.config import default_config

import jax.numpy as jnp


def _kg_setup(num_entities=32, num_relations=2, dim=8, seed=0):
    cfg = default_config()
    cfg.update(
        {"with_feature": False, "with_node_embedding": True,
         "embedding_dim": dim, "task": "link_prediction"}
    )
    data = make_kg_dataset(num_entities=num_entities,
                           num_relations=num_relations, seed=seed)
    ds, info = build_dataset(data, cfg)
    base = Batcher(ds, info, batch_size=1, seed=seed)
    gb = base.make_batch(np.arange(1))
    ll = np.asarray(ds.label_list[0], np.int32)
    ll = np.concatenate([ll, ll], axis=1)
    rng = np.random.RandomState(seed)
    ll = sample_negatives(ll, np.arange(num_entities, dtype=np.int32), rng)
    return cfg, ds, info, gb, ll


@pytest.mark.parametrize("encoder", ["embedding", "gcn", "gin"])
@pytest.mark.parametrize("strategy", ["ring", "allgather"])
def test_big_graph_matches_single_device(encoder, strategy):
    """Same parameters → same loss, rank accuracy, and gradients as the
    single-device model, on an 8-way partitioned graph."""
    dim, V, C = 8, 32, 2
    cfg, ds, info, gb, ll = _kg_setup(V, C, dim)
    model = KGLinkPredictor(
        all_node_num=V, embedding_dim=dim, channels=C, encoder=encoder
    )
    batch = gb.replace(label_list=jnp.asarray(ll[None]))
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch, train=False)
    sd_cost = float(out.cost_opt)
    sd_acc = float(out.metrics["correct_count"]) / float(out.metrics["count"])

    def sd_loss(params):
        o = model.apply({"params": params}, batch, train=False)
        return o.cost_opt

    sd_grads = jax.grad(sd_loss)(variables["params"])

    mesh = make_mesh({"data": 8})
    bg = BigGraphKGTrainer(
        num_nodes=V, channels=C, embedding_dim=dim, mesh=mesh,
        encoder=encoder, num_layers=2, strategy=strategy,
        node_mask=np.asarray(gb.graph.node_mask),
    )
    bg.partition_graph(
        np.asarray(gb.graph.senders), np.asarray(gb.graph.receivers),
        np.asarray(gb.graph.edge_weights),
    )
    params = bg.from_flax_variables(variables)
    state = bg.init_state(params=params)

    ev = bg.evaluate(state, ll)
    assert ev["cost"] == pytest.approx(sd_cost, rel=1e-5, abs=1e-6)
    assert ev["accuracy"] == pytest.approx(sd_acc, abs=1e-9)

    grads = bg.gradients(state, ll)
    np.testing.assert_allclose(
        grads["theta"]["distmult"],
        np.asarray(sd_grads["distmult"]["kernel"]),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        grads["embed"][:V],
        np.asarray(sd_grads["embed"]["embedding"]),
        rtol=1e-4, atol=1e-6,
    )
    if encoder == "gcn":
        np.testing.assert_allclose(
            grads["theta"]["w0"], np.asarray(sd_grads["conv1"]["kernel"]),
            rtol=1e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            grads["theta"]["b1"], np.asarray(sd_grads["conv2"]["bias"]),
            rtol=1e-4, atol=1e-6,
        )
    elif encoder == "gin":
        np.testing.assert_allclose(
            grads["theta"]["eps0"], np.asarray(sd_grads["conv1"]["epsilon"]),
            rtol=1e-4, atol=1e-6,
        )


def test_big_graph_training_learns_ranking():
    """fit() on the 8-device mesh learns the synthetic KG's structure."""
    dim, V, C = 16, 40, 2
    cfg, ds, info, gb, _ = _kg_setup(V, C, dim)
    mesh = make_mesh({"data": 8})
    cfg.update({"embedding_dim": dim, "kg_encoder": "embedding",
                "learning_rate": 0.05})
    bg = from_kg_dataset(ds, info, cfg, mesh)
    assert bg.v_pad == V  # 40 divides 8
    state = bg.init_state(seed=0)
    ll = np.asarray(ds.label_list[0], np.int32)
    state, hist = bg.fit(state, ll, epochs=60, seed=0)
    assert hist[-1]["train_accuracy"] > 0.8, hist[-1]

    # gathered embeddings have the padded rows stripped
    z = bg.node_embeddings(state)
    assert z.shape == (V, dim)
    assert np.isfinite(z).all()


def test_big_graph_pads_nodes_to_mesh_multiple():
    """V not divisible by D: rows are padded and masked out."""
    dim, V, C = 8, 30, 1
    cfg, ds, info, gb, ll = _kg_setup(V, C, dim)
    mesh = make_mesh({"data": 8})
    bg = BigGraphKGTrainer(
        num_nodes=V, channels=C, embedding_dim=dim, mesh=mesh,
        encoder="embedding", node_mask=np.asarray(gb.graph.node_mask),
    )
    assert bg.v_pad == 32
    bg.partition_graph(
        np.asarray(gb.graph.senders), np.asarray(gb.graph.receivers),
        np.asarray(gb.graph.edge_weights),
    )
    state = bg.init_state(seed=0)
    state, tr = bg.train_step(state, ll)
    assert np.isfinite(tr["cost"])
    assert bg.node_embeddings(state).shape == (V, dim)


def test_big_graph_cli_train_then_infer(tmp_path):
    """`train` with a mesh config runs the sharded path and writes a
    single-device-format checkpoint that `infer` restores unchanged."""
    import json
    import os

    import joblib

    from kgcn_tpu.cli.main import main

    joblib.dump(make_kg_dataset(num_entities=24, num_relations=2, seed=0),
                tmp_path / "kg.jbl")
    cfg = {
        "dataset": str(tmp_path / "kg.jbl"),
        "task": "link_prediction",
        "with_feature": False,
        "with_node_embedding": True,
        "embedding_dim": 12,
        "epoch": 40,
        "batch_size": 1,
        "learning_rate": 0.05,
        "mesh": {"data": 8},
        "save_model_path": str(tmp_path / "model"),
        "save_info_train": str(tmp_path / "info.json"),
        "save_info_test": str(tmp_path / "test.json"),
        "save_interval": 0,
        "seed": 0,
    }
    with open(tmp_path / "cfg.json", "w") as f:
        json.dump(cfg, f)
    main(["train", "--config", str(tmp_path / "cfg.json")])
    assert os.path.exists(tmp_path / "model/model.last.ckpt")
    info = json.load(open(tmp_path / "info.json"))
    assert info["ranking_accuracy"] > 0.8

    main(["infer", "--config", str(tmp_path / "cfg.json")])
    test_info = json.load(open(tmp_path / "test.json"))
    assert test_info["mrr"] > 0.0


def test_bench_scaling_kg_step_runs():
    from kgcn_tpu.tools.bench_scaling import bench_kg_step

    tps = bench_kg_step(2, V=64, E=256, dim=8, strategy="ring", iters=2)
    assert tps > 0


def test_big_graph_lane_aligned_mask_v200():
    """V>128: the Batcher lane-aligns node padding to 256, so the node_mask
    is LONGER than v_pad — must be trimmed, not crash (regression)."""
    dim, V, C = 8, 200, 1
    cfg, ds, info, gb, ll = _kg_setup(V, C, dim)
    mesh = make_mesh({"data": 8})
    assert len(np.asarray(gb.graph.node_mask)) == 256  # lane-aligned
    bg = from_kg_dataset(ds, info, cfg, mesh)
    assert bg.v_pad == 200
    state = bg.init_state(seed=0)
    state, tr = bg.train_step(state, ll)
    assert np.isfinite(tr["cost"])


def test_big_graph_label_batch_size_steps():
    """label_batch_size splits each epoch into several optimizer steps."""
    dim, V, C = 8, 32, 1
    cfg, ds, info, gb, _ = _kg_setup(V, C, dim)
    mesh = make_mesh({"data": 8})
    bg = from_kg_dataset(ds, info, cfg, mesh)
    state = bg.init_state(seed=0)
    ll = np.asarray(ds.label_list[0], np.int32)  # 32 triples
    state, hist = bg.fit(state, ll, epochs=2, seed=0, label_batch_size=8)
    assert int(state["step"]) == 2 * 4  # 32/8 steps per epoch


def test_big_graph_repartition_invalidates_compiled_fns():
    """partition_graph with new edges must not reuse executables that baked
    in the old adjacency (regression)."""
    dim, V = 8, 32
    cfg, ds, info, gb, ll = _kg_setup(V, 1, dim)
    mesh = make_mesh({"data": 8})
    bg = BigGraphKGTrainer(
        num_nodes=V, channels=1, embedding_dim=dim, mesh=mesh,
        encoder="gcn", node_mask=np.asarray(gb.graph.node_mask),
    )
    s = np.asarray(gb.graph.senders)
    r = np.asarray(gb.graph.receivers)
    w = np.asarray(gb.graph.edge_weights)
    bg.partition_graph(s, r, w)
    params = bg.init_params(seed=0)
    state = bg.init_state(params=params)
    z1 = bg.node_embeddings(state)
    # empty graph → different embeddings through the conv layers
    bg.partition_graph(s, r, np.zeros_like(w))
    state2 = bg.init_state(params=params)
    z2 = bg.node_embeddings(state2)
    assert not np.allclose(z1, z2)


def test_big_graph_sharded_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore keeps the embedding table sharded: params equal,
    sharding preserved, training resumes."""
    from jax.sharding import PartitionSpec as P

    dim, V = 8, 32
    cfg, ds, info, gb, ll = _kg_setup(V, 1, dim)
    mesh = make_mesh({"data": 8})
    bg = from_kg_dataset(ds, info, cfg, mesh)
    state = bg.init_state(seed=0)
    state, _ = bg.train_step(state, ll)
    state, _ = bg.train_step(state, ll)
    path = str(tmp_path / "bg_ckpt")
    bg.save(path, state)
    want = np.asarray(state["params"]["embed"])

    bg2 = from_kg_dataset(ds, info, cfg, mesh)
    state2 = bg2.restore(path, bg2.init_state(seed=1))
    got = state2["params"]["embed"]
    assert got.sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(got), want)
    assert state2["step"] == 2
    state2, tr = bg2.train_step(state2, ll)
    assert np.isfinite(tr["cost"]) and state2["step"] == 3


def test_big_graph_cli_retrain_resumes(tmp_path):
    """CLI writes the sharded big-graph checkpoint and `retrain` resumes
    from it."""
    import json
    import os

    import joblib

    from kgcn_tpu.cli.main import main

    joblib.dump(make_kg_dataset(num_entities=24, num_relations=1, seed=0),
                tmp_path / "kg.jbl")
    cfg = {
        "dataset": str(tmp_path / "kg.jbl"), "task": "link_prediction",
        "with_feature": False, "with_node_embedding": True,
        "embedding_dim": 8, "epoch": 3, "batch_size": 1,
        "learning_rate": 0.05, "mesh": {"data": 8},
        "save_model_path": str(tmp_path / "model"),
        "save_info_train": str(tmp_path / "info.json"),
        "save_interval": 0, "seed": 0,
    }
    json.dump(cfg, open(tmp_path / "cfg.json", "w"))
    main(["train", "--config", str(tmp_path / "cfg.json")])
    big = tmp_path / "model" / "model.big_graph.ckpt"
    assert os.path.isdir(big)

    cfg["retrain"] = str(big)
    json.dump(cfg, open(tmp_path / "cfg2.json", "w"))
    main(["train", "--config", str(tmp_path / "cfg2.json")])


def test_big_graph_fit_resident_one_dispatch():
    """Whole-run scan: learns the KG structure with in-kernel negatives."""
    dim, V, C = 16, 40, 2
    cfg, ds, info, gb, _ = _kg_setup(V, C, dim)
    mesh = make_mesh({"data": 8})
    cfg.update({"embedding_dim": dim, "kg_encoder": "embedding",
                "learning_rate": 0.05})
    bg = from_kg_dataset(ds, info, cfg, mesh)
    state = bg.init_state(seed=0)
    ll = np.asarray(ds.label_list[0], np.int32)
    state, hist = bg.fit_resident(state, ll, epochs=60, seed=0)
    assert hist[-1]["train_accuracy"] > 0.8, hist[-1]
    assert int(state["step"]) == 60
    # state is consumable by the streaming paths afterwards
    ev = bg.evaluate(state, np.concatenate([ll, ll], axis=1))
    assert np.isfinite(ev["cost"])


def test_big_graph_step_preserves_shardings_and_compiles_once():
    """The train step's output state must keep the embedding table and its
    Adam moments ROW-SHARDED (P('data')) and the step counter a strong i32
    scalar — an aval mismatch between init_state and the step output forces
    a full second compilation of the step (10s+ through a remote-compile
    backend) and, on a real mesh, would replicate the [V, dim] moment
    tables onto every device."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg, ds, info, gb, ll = _kg_setup(num_entities=64, dim=8)
    mesh = make_mesh({"data": 8})
    bg = BigGraphKGTrainer(num_nodes=64, channels=2, embedding_dim=8,
                           mesh=mesh, encoder="embedding")
    bg.partition_graph(np.asarray(gb.graph.senders),
                       np.asarray(gb.graph.receivers),
                       np.asarray(gb.graph.edge_weights))
    state = bg.init_state(seed=0)

    def leaf_desc(tree):
        return [
            (x.dtype.name, tuple(x.shape), str(x.sharding),
             getattr(x, "weak_type", None))
            for x in jax.tree_util.tree_leaves(tree)
            if isinstance(x, jax.Array)
        ]

    before = leaf_desc(state)
    state, _ = bg.train_step(state, ll)
    after = leaf_desc(state)
    assert before == after, (
        "state avals/shardings changed across the step:\n"
        + "\n".join(f"{b} -> {a}" for b, a in zip(before, after) if b != a)
    )
    # embed rows and both Adam moment tables stay partitioned on 'data'
    row_sharded = [
        d for d in after if d[1] == (64, 8) and "'data'" in d[2].replace('"', "'")
    ]
    assert len(row_sharded) >= 3, after
    # second step reuses the same compiled executable (no aval drift)
    state, _ = bg.train_step(state, ll)


def test_big_graph_gradient_clip_routes_to_per_step_path(tmp_path):
    """Cross-leaf optimizer transforms (global-norm clip) cannot run inside
    shard_map — fit_resident must fall back to the per-step path."""
    from kgcn_tpu.data import build_dataset
    from kgcn_tpu.parallel.big_graph import from_kg_dataset, _tx_shard_safe
    from kgcn_tpu.parallel.mesh import make_mesh
    from kgcn_tpu.runtime.config import default_config

    cfg = default_config()
    cfg.update({"with_feature": False, "with_node_embedding": True,
                "task": "link_prediction", "embedding_dim": 8,
                "gradient_clip": 1.0, "mesh": {"data": 4}})
    assert not _tx_shard_safe(cfg)
    assert _tx_shard_safe({"optimizer": "adam"})
    assert not _tx_shard_safe({"optimizer": "lamb"})

    data = make_kg_dataset(num_entities=24, num_relations=1, seed=0)
    ds, info = build_dataset(data, cfg)
    mesh = make_mesh({"data": 4})
    bg = from_kg_dataset(ds, info, cfg, mesh)
    assert not bg.tx_shard_safe
    state = bg.init_state(seed=0)
    ll = np.asarray(ds.label_list[0], np.int32)
    state, history = bg.fit_resident(state, ll, epochs=2, seed=0)
    assert len(history) == 2
    assert all(np.isfinite(h["train_cost"]) for h in history)


def test_kg_loss_gradient_stable_at_extreme_scores():
    """softplus form of the margin-logistic loss: finite gradients where the
    literal -log(1/(1+exp(s))) transcription NaNs (score >= ~88)."""
    import jax

    from kgcn_tpu.data import build_dataset
    from kgcn_tpu.models.kg import KGLinkPredictor
    from kgcn_tpu.runtime.config import default_config

    cfg = default_config()
    cfg.update({"with_feature": False, "with_node_embedding": True,
                "task": "link_prediction"})
    data = make_kg_dataset(num_entities=10, num_relations=1, seed=0)
    ds, info = build_dataset(data, cfg)
    from kgcn_tpu.models.kg import KGBatcher

    model = KGLinkPredictor(all_node_num=10, embedding_dim=8, channels=1)
    kb = KGBatcher(ds, info, label_batch_size=16, seed=0)
    batch = kb.init_batch()
    variables = model.init(jax.random.PRNGKey(0), batch)
    # blow up the embedding scale so |score| >> 88
    big = jax.tree_util.tree_map(lambda x: x * 1e3, variables["params"])

    def loss(params):
        out = model.apply({"params": params}, batch, train=True)
        return out.cost_opt

    val, grads = jax.value_and_grad(loss)(big)
    assert np.isfinite(val)
    assert all(np.isfinite(g).all() for g in jax.tree_util.tree_leaves(grads))
