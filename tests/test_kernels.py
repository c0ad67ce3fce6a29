"""Kernel-path equivalence tests: fused dense gconv, ELL, Pallas (interpret)."""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_graph_batch import _toy_batch


def test_gconv_dense_fused_matches_reference_math():
    from kgcn_tpu.ops.spmm import gconv_dense

    rng = np.random.RandomState(0)
    C, B, N, Fi, Fo = 2, 3, 6, 5, 4
    adj = rng.standard_normal((C, B, N, N)).astype(np.float32)
    x = rng.standard_normal((B, N, Fi)).astype(np.float32)
    w = rng.standard_normal((C, Fi, Fo)).astype(np.float32)
    b = rng.standard_normal((C, Fo)).astype(np.float32)
    out = gconv_dense(*map(jnp.asarray, (adj, x, w, b)))
    want = np.zeros((B, N, Fo), np.float32)
    for c in range(C):
        for g in range(B):
            want[g] += adj[c, g] @ (x[g] @ w[c] + b[c])
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-4)


def test_ell_matches_coo():
    from kgcn_tpu.ops.ell import coo_to_ell, spmm_ell
    from kgcn_tpu.ops.spmm import spmm

    gb, dense, feats = _toy_batch(C=1)
    B, N, F = feats.shape
    V = B * N
    x = jnp.asarray(feats.reshape(V, F))
    idx, w = coo_to_ell(
        np.asarray(gb.senders[0]), np.asarray(gb.receivers[0]),
        np.asarray(gb.edge_weights[0]), V,
    )
    out_ell = spmm_ell(jnp.asarray(idx), jnp.asarray(w), x)
    out_coo = spmm(gb.senders[0], gb.receivers[0], gb.edge_weights[0], x, V)
    np.testing.assert_allclose(
        np.asarray(out_ell), np.asarray(out_coo), rtol=1e-5, atol=1e-5
    )


def test_ell_multichannel():
    from kgcn_tpu.ops.ell import coo_to_ell, spmm_ell_multichannel
    from kgcn_tpu.ops.spmm import spmm_multichannel

    gb, dense, feats = _toy_batch(C=2)
    B, N, F = feats.shape
    V = B * N
    x = jnp.asarray(feats.reshape(V, F))
    idxs, ws = [], []
    K = 0
    pairs = []
    for c in range(2):
        idx, w = coo_to_ell(
            np.asarray(gb.senders[c]), np.asarray(gb.receivers[c]),
            np.asarray(gb.edge_weights[c]), V,
        )
        pairs.append((idx, w))
        K = max(K, idx.shape[1])
    for idx, w in pairs:
        pad = K - idx.shape[1]
        idxs.append(np.pad(idx, ((0, 0), (0, pad))))
        ws.append(np.pad(w, ((0, 0), (0, pad))))
    out = spmm_ell_multichannel(
        jnp.asarray(np.stack(idxs)), jnp.asarray(np.stack(ws)), x
    )
    want = spmm_multichannel(gb.senders, gb.receivers, gb.edge_weights, x, V)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_pallas_gconv_interpret_mode():
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        from kgcn_tpu.ops.pallas_gconv import gconv_fused
        from kgcn_tpu.ops.spmm import gconv_dense

        rng = np.random.RandomState(0)
        C, B, N, Fi, Fo = 2, 2, 10, 7, 5
        adj = jnp.asarray(rng.standard_normal((C, B, N, N)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((B, N, Fi)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((C, Fi, Fo)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((C, Fo)).astype(np.float32))
        out = gconv_fused(adj, x, w, b)
        want = gconv_dense(adj, x, w, b)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(want), rtol=1e-4, atol=1e-4
        )
        # custom VJP matches autodiff of the reference formulation
        g = jnp.asarray(rng.standard_normal(out.shape).astype(np.float32))
        f1 = lambda *a: jnp.sum(gconv_fused(*a) * g)
        f2 = lambda *a: jnp.sum(gconv_dense(*a) * g)
        g1 = jax.grad(f1, argnums=(0, 1, 2, 3))(adj, x, w, b)
        g2 = jax.grad(f2, argnums=(0, 1, 2, 3))(adj, x, w, b)
        for a, bb in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(bb), rtol=1e-4, atol=1e-4
            )
    finally:
        pl.pallas_call = orig


def test_batcher_ell_path_matches_coo():
    """Batcher-built ELL arrays drive GraphConv/GIN identically to COO."""
    from kgcn_tpu.data import Batcher, build_dataset
    from kgcn_tpu.data.synthetic import make_random_graphs
    from kgcn_tpu import nn as knn

    data = make_random_graphs(9, 8, 5, num_channels=2, seed=4)
    ds, info = build_dataset(data, {})
    b = Batcher(ds, info, 6, seed=0)
    batch = b.make_batch(np.array([1, 3, 5, 7]))  # partial batch too
    g = batch.graph
    assert g.ell_senders is not None
    g_coo = g.replace(ell_senders=None, ell_weights=None)
    x = batch.graph.nodes
    for layer in (knn.GraphConv(7, channels=2), knn.GINAggregate(channels=2)):
        params = layer.init(jax.random.PRNGKey(0), x, g_coo)
        out_coo = layer.apply(params, x, g_coo)
        out_ell = layer.apply(params, x, g)
        np.testing.assert_allclose(
            np.asarray(out_ell), np.asarray(out_coo), rtol=1e-5, atol=1e-5
        )


def test_take_rows_matches_plain_gather_and_grad():
    """Sort-backward gather: forward and gradient identical to table[idx]."""
    from kgcn_tpu.ops.segment import take_rows

    rng = np.random.RandomState(0)
    V, L, F = 37, 400, 6
    table = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, V, L).astype(np.int32))
    out = take_rows(table, idx, V)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table[idx]))
    cot = jnp.asarray(rng.standard_normal((L, F)).astype(np.float32))
    g1 = jax.grad(lambda tb: jnp.sum(take_rows(tb, idx, V) * cot))(table)
    g2 = jax.grad(lambda tb: jnp.sum(tb[idx] * cot))(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6, atol=1e-6)


def test_embed_rows_matches_plain_gather_and_grad():
    """One-hot-matmul gather: exact forward, matching gradient; scalar and
    large-table fallbacks hit the plain-gather path."""
    from kgcn_tpu.ops.segment import embed_rows

    rng = np.random.RandomState(1)
    C, L, F = 5, 300, 4
    table = jnp.asarray(rng.standard_normal((C, F)).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, C, L).astype(np.int32))
    np.testing.assert_allclose(
        np.asarray(embed_rows(table, idx)), np.asarray(table[idx]), rtol=1e-6
    )
    cot = jnp.asarray(rng.standard_normal((L, F)).astype(np.float32))
    g1 = jax.grad(lambda tb: jnp.sum(embed_rows(tb, idx) * cot))(table)
    g2 = jax.grad(lambda tb: jnp.sum(tb[idx] * cot))(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5)
    # scalar index fallback
    np.testing.assert_array_equal(
        np.asarray(embed_rows(table, jnp.int32(3))), np.asarray(table[3])
    )
    # large-table fallback keeps the plain gather
    big = jnp.asarray(rng.standard_normal((512, F)).astype(np.float32))
    bidx = jnp.asarray(rng.randint(0, 512, 10).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(embed_rows(big, bidx)), np.asarray(big[bidx])
    )


def test_pallas_gconv_tile_misaligned_n():
    """N padded to a multiple of 128 but not 256 (e.g. 300→384): the grid
    must still cover every row tile — floor division with tile 256 used to
    silently never write rows 256..383."""
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        from kgcn_tpu.ops.pallas_gconv import gconv_fused
        from kgcn_tpu.ops.spmm import gconv_dense

        rng = np.random.RandomState(1)
        C, B, N, Fi, Fo = 1, 1, 300, 5, 3
        adj = jnp.asarray(rng.standard_normal((C, B, N, N)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((B, N, Fi)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((C, Fi, Fo)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((C, Fo)).astype(np.float32))
        out = gconv_fused(adj, x, w, b)
        want = gconv_dense(adj, x, w, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=1e-3, atol=1e-3)
    finally:
        pl.pallas_call = orig


def test_coo_to_ell_device_ignores_zero_weight_edges():
    """Zero-weight (padding) edges must not consume ELL slots — ranking them
    pushed real edges past max_degree and silently dropped them."""
    from kgcn_tpu.ops.ell import spmm_ell
    from kgcn_tpu.ops.pallas_spmm import coo_to_ell_device

    V, F = 6, 4
    # receiver 2 has max_degree=2 real edges, but a zero-weight edge listed
    # FIRST used to claim slot 0 and push the second real edge out
    s = jnp.asarray(np.array([0, 1, 3, 0], np.int32))
    r = jnp.asarray(np.array([2, 2, 2, 4], np.int32))
    w = jnp.asarray(np.array([0.0, 1.0, 2.0, 3.0], np.float32))
    x = jnp.asarray(np.arange(V * F, dtype=np.float32).reshape(V, F))
    idx, wv = coo_to_ell_device(s, r, w, V, max_degree=2)
    got = spmm_ell(idx, wv, x)
    want = jax.ops.segment_sum(x[s] * w[:, None], r, num_segments=V)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_spmm_multichannel_pallas_backend_matches_xla():
    from kgcn_tpu.ops.spmm import spmm_multichannel

    rng = np.random.RandomState(2)
    C, V, E, F = 3, 12, 40, 8
    s = jnp.asarray(rng.randint(0, V, (C, E)).astype(np.int32))
    r = jnp.asarray(rng.randint(0, V, (C, E)).astype(np.int32))
    w = jnp.asarray(rng.rand(C, E).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32))
    a_x = spmm_multichannel(s, r, w, x, V, backend="xla")
    a_p = spmm_multichannel(s, r, w, x, V, backend="pallas")
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_x),
                               rtol=1e-5, atol=1e-5)
    # per-channel features [C, V, F] too
    x3 = jnp.asarray(rng.standard_normal((C, V, F)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(spmm_multichannel(s, r, w, x3, V, backend="pallas")),
        np.asarray(spmm_multichannel(s, r, w, x3, V, backend="xla")),
        rtol=1e-5, atol=1e-5)


def test_segment_softmax_multihead_mask():
    """[E, H] logits with an [E] mask — documented but previously broadcast
    along the wrong axis."""
    from kgcn_tpu.ops.segment import segment_softmax

    rng = np.random.RandomState(0)
    E, H, S = 10, 4, 3
    logits = jnp.asarray(rng.standard_normal((E, H)).astype(np.float32))
    seg = jnp.asarray(rng.randint(0, S, E).astype(np.int32))
    mask = jnp.asarray((rng.rand(E) > 0.3).astype(np.float32))
    out = segment_softmax(logits, seg, S, mask=mask)
    assert out.shape == (E, H)
    out = np.asarray(out)
    m = np.asarray(mask)
    assert (out[m == 0] == 0).all()
    for s in range(S):
        sel = (np.asarray(seg) == s) & (m > 0)
        if sel.any():
            np.testing.assert_allclose(out[sel].sum(axis=0),
                                       np.ones(H), rtol=1e-5)
