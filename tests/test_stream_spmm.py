"""Streaming scatter SpMM kernel (ops/stream_spmm.py) — correctness and
gradient parity vs the XLA segment-sum path (which carries the reference's
exact bspmm semantics, /root/reference/kgcn/bspmm_call.py:6-57).

CPU lane runs interpret mode; production tile sizes are exercised on-chip
via KGCN_TEST_PLATFORM=axon (see test_onchip below).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kgcn_tpu.ops.stream_spmm import (
    StreamCOO, build_stream, edge_to_slot, stream_spmm, stream_spmm_edges,
    transpose_w_slots,
)


_ON_TPU = jax.default_backend() == "tpu"
# Tiny stream parameters (mc/tr_w below the Mosaic block minimums) exercise
# the packing/gradient logic in interpret mode only; on the real chip the
# build-time alignment assert (build_stream) rejects them by design — the
# production-size lane below covers compiled mode.
tiny_stream = pytest.mark.skipif(
    _ON_TPU, reason="tiny stream params are interpret-mode only; "
    "see the production on-chip lane")


def _xla_spmm(s, r, w, x, V):
    g = x[s] * w[:, None]
    return jax.ops.segment_sum(g, r, num_segments=V)


def _rand_graph(rng, V, E, Vs=None):
    s = rng.randint(0, Vs or V, E).astype(np.int32)
    r = rng.randint(0, V, E).astype(np.int32)
    w = rng.standard_normal(E).astype(np.float32)
    return s, r, w


@pytest.mark.parametrize("V,E,F,params", [
    (100, 400, 16, dict(tr_w=16, chunk=8, mc=4, wb=2)),
    (37, 150, 5, dict(tr_w=8, chunk=8, mc=2, wb=4)),
    (300, 900, 33, dict(tr_w=32, chunk=16, mc=8, wb=8)),
])
@tiny_stream
def test_forward_matches_xla(V, E, F, params):
    rng = np.random.RandomState(0)
    s, r, w = _rand_graph(rng, V, E)
    x = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32))
    ss = build_stream(s, r, V, weights=w, **params)
    got = stream_spmm(ss, x=x, compute_dtype=jnp.float32)
    ref = _xla_spmm(jnp.asarray(s), jnp.asarray(r), jnp.asarray(w), x, V)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@tiny_stream
def test_edge_order_shim_and_dynamic_weights():
    rng = np.random.RandomState(1)
    V, E, F = 64, 256, 12
    s, r, w = _rand_graph(rng, V, E)
    x = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32))
    ss = build_stream(s, r, V, tr_w=16, chunk=8, mc=4, wb=2)
    got = stream_spmm_edges(ss, jnp.asarray(w), x,
                            compute_dtype=jnp.float32)
    ref = _xla_spmm(jnp.asarray(s), jnp.asarray(r), jnp.asarray(w), x, V)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # slot-aligned dynamic weights + derived transpose alignment
    w_slots = jnp.asarray(edge_to_slot(ss, w))
    got2 = stream_spmm(ss, w_slots, x, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@tiny_stream
def test_zero_weight_edges_dropped():
    rng = np.random.RandomState(2)
    V, E, F = 40, 120, 8
    s, r, w = _rand_graph(rng, V, E)
    w[::3] = 0.0
    x = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32))
    ss = build_stream(s, r, V, weights=w, tr_w=8, chunk=8, mc=2, wb=2)
    got = stream_spmm(ss, x=x, compute_dtype=jnp.float32)
    ref = _xla_spmm(jnp.asarray(s), jnp.asarray(r), jnp.asarray(w), x, V)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@tiny_stream
def test_rectangular_bipartite():
    rng = np.random.RandomState(3)
    Vs, Vr, E, F = 90, 50, 300, 9
    s, r, w = _rand_graph(rng, Vr, E, Vs=Vs)
    x = jnp.asarray(rng.standard_normal((Vs, F)).astype(np.float32))
    ss = build_stream(s, r, Vr, weights=w, num_sender_nodes=Vs,
                      tr_w=16, chunk=8, mc=2, wb=2)
    got = stream_spmm(ss, x=x, compute_dtype=jnp.float32)
    ref = _xla_spmm(jnp.asarray(s), jnp.asarray(r), jnp.asarray(w), x, Vr)
    assert got.shape == (Vr, F)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@tiny_stream
def test_gradients_match_xla():
    """dx (transpose spmm) and dw (SDDMM) — the reference's registered
    gradient pair (kgcn/bspmm_call.py:21-57)."""
    rng = np.random.RandomState(4)
    V, E, F = 48, 180, 7
    s, r, w = _rand_graph(rng, V, E)
    x = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32))
    ss = build_stream(s, r, V, tr_w=8, chunk=8, mc=4, wb=2)
    w_slots = jnp.asarray(edge_to_slot(ss, w))
    wT_slots = transpose_w_slots(ss, w_slots)
    cot = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32))

    def ours(ws, x_):
        return jnp.vdot(
            stream_spmm(ss, ws, x_, wT_slots=transpose_w_slots(ss, ws),
                        compute_dtype=jnp.float32), cot)

    sj, rj = jnp.asarray(s), jnp.asarray(r)

    def theirs(w_, x_):
        return jnp.vdot(_xla_spmm(sj, rj, w_, x_, V), cot)

    dws, dx = jax.grad(ours, argnums=(0, 1))(w_slots, x)
    dw_ref, dx_ref = jax.grad(theirs, argnums=(0, 1))(jnp.asarray(w), x)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-4)
    # slot-order dw → edge order for comparison
    dw_edge = np.zeros(E, np.float32)
    src = np.asarray(ss.slot_src)
    valid = src < E
    dw_edge[src[valid]] = np.asarray(dws)[valid]
    np.testing.assert_allclose(dw_edge, np.asarray(dw_ref),
                               rtol=1e-4, atol=1e-4)


@tiny_stream
def test_macro_budget_padding_is_noop():
    rng = np.random.RandomState(5)
    V, E, F = 60, 200, 10
    s, r, w = _rand_graph(rng, V, E)
    x = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32))
    base = build_stream(s, r, V, weights=w, tr_w=16, chunk=8, mc=2, wb=2)
    padded = build_stream(s, r, V, weights=w, tr_w=16, chunk=8, mc=2, wb=2,
                          macro_budget=base.meta.n_macros + 7)
    a = stream_spmm(base, x=x, compute_dtype=jnp.float32)
    b = stream_spmm(padded, x=x, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
    with pytest.raises(ValueError):
        build_stream(s, r, V, tr_w=16, chunk=8, mc=2, wb=2, macro_budget=1)


@tiny_stream
def test_pytree_roundtrip_and_jit_arg():
    rng = np.random.RandomState(6)
    V, E, F = 32, 100, 6
    s, r, w = _rand_graph(rng, V, E)
    ss = build_stream(s, r, V, weights=w, tr_w=8, chunk=8, mc=2, wb=2)
    leaves, treedef = jax.tree_util.tree_flatten(ss)
    ss2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert ss2.meta == ss.meta
    x = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32))

    @jax.jit
    def f(ss_, x_):
        return stream_spmm(ss_, x=x_, compute_dtype=jnp.float32)

    ref = _xla_spmm(jnp.asarray(s), jnp.asarray(r), jnp.asarray(w),
                    x, V)
    np.testing.assert_allclose(np.asarray(f(ss, x)), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@tiny_stream
def test_materialized_static_path():
    """Static-weight fast path: bf16 materialised one-hots (auto) — forward
    matches XLA to bf16 tolerance and dx flows through the transpose."""
    rng = np.random.RandomState(7)
    V, E, F = 80, 320, 16
    s, r, w = _rand_graph(rng, V, E)
    x = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32))
    ss = build_stream(s, r, V, weights=w, tr_w=16, chunk=8, mc=4, wb=2)
    assert ss.oh is not None and ss.transpose.oh is not None
    got = stream_spmm(ss, x=x)          # bf16 default → static path
    ref = _xla_spmm(jnp.asarray(s), jnp.asarray(r), jnp.asarray(w), x, V)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2 * scale)
    cot = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32))
    dx = jax.grad(lambda x_: jnp.vdot(stream_spmm(ss, x=x_), cot))(x)
    sj, rj = jnp.asarray(s), jnp.asarray(r)
    dx_ref = jax.grad(
        lambda x_: jnp.vdot(_xla_spmm(sj, rj, jnp.asarray(w), x_, V), cot)
    )(x)
    scale = float(jnp.max(jnp.abs(dx_ref)))
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               atol=2e-2 * scale)
    # f32 request falls back to the iota path (exact)
    got32 = stream_spmm(ss, x=x, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got32), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@tiny_stream
def test_materialize_off():
    rng = np.random.RandomState(8)
    V, E = 40, 100
    s, r, w = _rand_graph(rng, V, E)
    ss = build_stream(s, r, V, weights=w, tr_w=8, chunk=8, mc=2, wb=2,
                      materialize=False)
    assert ss.oh is None


@tiny_stream
def test_baked_stream_matches():
    rng = np.random.RandomState(9)
    V, E, F = 72, 300, 16
    s, r, w = _rand_graph(rng, V, E)
    x = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32))
    from kgcn_tpu.ops.stream_spmm import bake_stream, stream_spmm_baked
    ss = build_stream(s, r, V, weights=w, tr_w=16, chunk=8, mc=4, wb=2)
    bs = bake_stream(ss)
    ref = _xla_spmm(jnp.asarray(s), jnp.asarray(r), jnp.asarray(w), x, V)
    got = jax.jit(lambda b, x_: stream_spmm_baked(b, x_))(bs, x)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2 * scale)
    cot = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32))
    dx = jax.grad(lambda x_: jnp.vdot(stream_spmm_baked(bs, x_), cot))(x)
    sj, rj = jnp.asarray(s), jnp.asarray(r)
    dx_ref = jax.grad(
        lambda x_: jnp.vdot(_xla_spmm(sj, rj, jnp.asarray(w), x_, V), cot)
    )(x)
    scale = float(jnp.max(jnp.abs(dx_ref)))
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               atol=2e-2 * scale)


@pytest.mark.parametrize("model_name", ["gcn", "gin"])
@tiny_stream
def test_stream_backend_end_to_end_matches_xla(model_name):
    """spmm_backend="stream": the Batcher attaches StreamCOO structures
    (weights baked), GraphConv/GIN dispatch through them, and a short
    training run produces the same parameters as the XLA backend
    (interpret mode; f32 compute dtype → iota path)."""
    from kgcn_tpu.data import Batcher, build_dataset
    from kgcn_tpu.data.synthetic import make_random_graphs
    from kgcn_tpu.graph.batch import set_dense_path
    from kgcn_tpu.models.registry import build_model
    import importlib
    spmm_mod = importlib.import_module("kgcn_tpu.ops.spmm")
    from kgcn_tpu.ops import stream_spmm as stream_mod
    from kgcn_tpu.runtime.config import default_config
    from kgcn_tpu.runtime.train import Trainer

    cfg = default_config()
    cfg.update({"task": "classification", "learning_rate": 1e-2})
    data = make_random_graphs(16, 12, 8, avg_degree=3, seed=0)
    ds, info = build_dataset(data, cfg)

    def run(backend):
        set_dense_path(False)
        spmm_mod.set_backend(backend)
        stream_mod.set_compute_dtype(jnp.float32)
        try:
            b = Batcher(ds, info, 16, seed=0)
            batch = b.make_batch(np.arange(16))
            if backend == "stream":
                assert batch.graph.stream_adj is not None
                assert batch.graph.stream_adj[0].w_slots is not None
            else:
                assert batch.graph.stream_adj is None
            model = build_model(model_name, info, cfg)
            trainer = Trainer(model, cfg, info)
            state = trainer.init_state(batch, seed=0)
            for _ in range(3):
                state, _, _ = trainer.train_step(state, batch)
            return jax.tree_util.tree_leaves(state.params)
        finally:
            spmm_mod.set_backend("xla")
            stream_mod.set_compute_dtype(jnp.bfloat16)
            set_dense_path(True)

    p_xla = run("xla")
    p_stream = run("stream")
    for a, b in zip(p_xla, p_stream):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@tiny_stream
def test_stream_backend_kg_link_prediction():
    """The whole-graph KG engine (the stream kernel's target workload)
    trains under spmm_backend="stream" with a GCN encoder."""
    from kgcn_tpu.data import build_dataset
    from kgcn_tpu.graph.batch import set_dense_path
    from kgcn_tpu.models.kg import KGBatcher, KGLinkPredictor
    import importlib
    spmm_mod = importlib.import_module("kgcn_tpu.ops.spmm")
    from kgcn_tpu.ops import stream_spmm as stream_mod
    from kgcn_tpu.runtime.config import default_config
    from kgcn_tpu.runtime.train import Trainer

    from kgcn_tpu.data.synthetic import make_kg_dataset

    data = make_kg_dataset(num_entities=30, num_relations=1, seed=0)
    cfg = default_config()
    cfg.update({"task": "link_prediction", "epoch": 2, "batch_size": 1,
                "with_feature": False, "with_node_embedding": True,
                "embedding_dim": 8, "label_batch_size": 32,
                "spmm_backend": "stream"})
    ds, info = build_dataset(data, cfg)
    set_dense_path(False)
    spmm_mod.set_backend("stream")
    stream_mod.set_compute_dtype(jnp.float32)
    try:
        kb = KGBatcher(ds, info, seed=0)
        kb.graph_batch = kb.graph_batch.replace(
            graph=kb.graph_batch.graph.with_stream(
                params=dict(tr_w=8, chunk=8, mc=2, wb=2))
        )
        assert kb.graph_batch.graph.stream_adj is not None
        model = KGLinkPredictor(all_node_num=info.all_node_num,
                                embedding_dim=8,
                                channels=info.adj_channel_num,
                                encoder="gcn")
        trainer = Trainer(model, cfg, info)
        state = trainer.init_state(kb.init_batch(), seed=0)
        costs = []
        for batch in kb.batches():
            state, cost, _ = trainer.train_step(state, batch)
            costs.append(float(cost))
        assert np.isfinite(costs).all()
    finally:
        spmm_mod.set_backend("xla")
        stream_mod.set_compute_dtype(jnp.bfloat16)
        set_dense_path(True)




@pytest.mark.skipif(not _ON_TPU, reason=(
    "production-size on-chip lane: KGCN_TEST_PLATFORM=axon "
    "pytest tests/test_stream_spmm.py"))
def test_stream_spmm_production_on_chip():
    """Production parameters (tr_w=128, chunk=64, mc=24, wb=8) on the real
    chip: baked static path (materialised bf16 one-hots) within the bf16
    bound, f32 iota path exact, dx/dw gradients vs XLA at production scale
    (V=20k, E=200k, F=128)."""
    from kgcn_tpu.ops.stream_spmm import bake_stream, stream_spmm_baked

    rng = np.random.RandomState(3)
    V, E, F = 20_000, 200_000, 128
    s = rng.randint(0, V, E).astype(np.int32)
    r = rng.randint(0, V, E).astype(np.int32)
    w = rng.uniform(0.5, 1.5, E).astype(np.float32)
    x = jnp.asarray(
        np.random.RandomState(4).standard_normal((V, F)).astype(np.float32))
    sj, rj, wj = jnp.asarray(s), jnp.asarray(r), jnp.asarray(w)

    ss = build_stream(s, r, V, weights=w)
    ref = jax.jit(lambda xv: _xla_spmm(sj, rj, wj, xv, V))(x)
    scale = float(jnp.max(jnp.abs(ref)))

    # f32 iota path: exact
    got32 = jax.jit(
        lambda ss_, xv: stream_spmm(ss_, x=xv, compute_dtype=jnp.float32)
    )(ss, x)
    assert float(jnp.max(jnp.abs(got32 - ref))) / scale < 1e-5

    # baked bf16 static path: documented accuracy contract
    bs = bake_stream(ss)
    got16 = jax.jit(lambda b, xv: stream_spmm_baked(b, xv))(bs, x)
    assert float(jnp.max(jnp.abs(got16 - ref))) / scale < 5e-2

    # gradient pair on-chip, f32 dynamic path
    w_slots = jnp.asarray(edge_to_slot(ss, w))

    def loss_s(ws, xv):
        out = stream_spmm(ss, ws, xv, wT_slots=transpose_w_slots(ss, ws),
                          compute_dtype=jnp.float32)
        return jnp.sum(out * jnp.cos(out))

    def loss_x(wv, xv):
        out = _xla_spmm(sj, rj, wv, xv, V)
        return jnp.sum(out * jnp.cos(out))

    gs = jax.jit(jax.grad(loss_s, argnums=(0, 1)))(w_slots, x)
    gx = jax.jit(jax.grad(loss_x, argnums=(0, 1)))(wj, x)
    denom = float(jnp.max(jnp.abs(gx[1]))) or 1.0
    assert float(jnp.max(jnp.abs(gs[1] - gx[1]))) / denom < 1e-4
    dw_edge = np.zeros(E, np.float32)
    src = np.asarray(ss.slot_src)
    valid = src < E
    dw_edge[src[valid]] = np.asarray(gs[0])[valid]
    denom = float(jnp.max(jnp.abs(gx[0]))) or 1.0
    assert float(np.max(np.abs(dw_edge - np.asarray(gx[0])))) / denom < 1e-4


def test_stream_shard_map_dp():
    """Per-device stream structures stacked (stack_streams) and consumed
    inside shard_map — the SPMD pattern the multichip dryrun exercises."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from kgcn_tpu.ops.stream_spmm import local_stream, stack_streams

    D = min(4, jax.local_device_count())
    Vl, El, F = 32, 96, 8
    structs, xs, refs = [], [], []
    probes = []
    for d in range(D):
        rngd = np.random.RandomState(d)
        sd = rngd.randint(0, Vl, El).astype(np.int32)
        rd = rngd.randint(0, Vl, El).astype(np.int32)
        wd = np.ones(El, np.float32)
        probes.append((sd, rd, wd))
    budget = 0
    built = []
    for sd, rd, wd in probes:
        ss = build_stream(sd, rd, Vl, weights=wd, tr_w=8, chunk=8, mc=8,
                          wb=2)
        budget = max(budget, ss.meta.n_macros, ss.transpose.meta.n_macros)
        built.append(None)
    for i, (sd, rd, wd) in enumerate(probes):
        built[i] = build_stream(sd, rd, Vl, weights=wd, tr_w=8, chunk=8,
                                mc=8, wb=2, macro_budget=budget)
        rngd = np.random.RandomState(100 + i)
        x = rngd.standard_normal((Vl, F)).astype(np.float32)
        xs.append(x)
        refs.append(np.asarray(_xla_spmm(jnp.asarray(sd), jnp.asarray(rd),
                                         jnp.asarray(wd), jnp.asarray(x),
                                         Vl)))
    stacked = stack_streams(built)
    x_all = jnp.asarray(np.stack(xs))
    mesh = Mesh(np.array(jax.devices()[:D]), ("data",))

    def body(ss_stacked, x_stk):
        ss_local = local_stream(ss_stacked)
        out = stream_spmm(ss_local, x=x_stk[0],
                          compute_dtype=jnp.float32)
        return out[None]

    out = jax.jit(shard_map(
        body, mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=P("data"), check_vma=False,
    ))(stacked, x_all)
    for d in range(D):
        np.testing.assert_allclose(np.asarray(out[d]), refs[d],
                                   rtol=1e-5, atol=1e-5)
