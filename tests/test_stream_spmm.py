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
def test_forward_matches_xla(V, E, F, params):
    rng = np.random.RandomState(0)
    s, r, w = _rand_graph(rng, V, E)
    x = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32))
    ss = build_stream(s, r, V, weights=w, **params)
    got = stream_spmm(ss, x=x, compute_dtype=jnp.float32)
    ref = _xla_spmm(jnp.asarray(s), jnp.asarray(r), jnp.asarray(w), x, V)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


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
