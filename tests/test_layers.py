import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgcn_tpu import nn as knn
from tests.test_graph_batch import _toy_batch


def _x(gb, feats):
    return jnp.asarray(feats.reshape(gb.total_nodes, feats.shape[-1]))


def _init_apply(layer, *args, method=None):
    params = layer.init(jax.random.PRNGKey(0), *args)
    out = layer.apply(params, *args, method=method)
    return params, out


def test_graphconv_dense_vs_sparse_vs_numpy():
    gb, dense, feats = _toy_batch(C=2)
    B, N, F = feats.shape
    layer = knn.GraphConv(features=7, channels=2)
    x = _x(gb, feats)
    params = layer.init(jax.random.PRNGKey(0), x, gb)
    out_sparse = layer.apply(params, x, gb)
    out_dense = layer.apply(params, x, gb.with_dense_adj())
    np.testing.assert_allclose(
        np.asarray(out_sparse), np.asarray(out_dense), rtol=1e-5, atol=1e-5
    )
    # numpy reference: Σ_c A_c (X W_c + b_c)  (kgcn/layers.py:107-115)
    w = np.asarray(params["params"]["kernel"])
    b = np.asarray(params["params"]["bias"])
    want = np.zeros((B, N, 7), np.float32)
    for c in range(2):
        for g in range(B):
            want[g] += dense[c, g] @ (feats[g] @ w[c] + b[c])
    np.testing.assert_allclose(
        np.asarray(out_sparse).reshape(B, N, 7), want, rtol=1e-4, atol=1e-4
    )


def test_gin_matches_numpy():
    gb, dense, feats = _toy_batch(C=2)
    B, N, F = feats.shape
    layer = knn.GINAggregate(channels=2)
    x = _x(gb, feats)
    params = layer.init(jax.random.PRNGKey(0), x, gb)
    # set nonzero epsilon to exercise the term
    params = jax.tree_util.tree_map(lambda p: p + 0.25, params)
    out = layer.apply(params, x, gb)
    out_d = layer.apply(params, x, gb.with_dense_adj())
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_d), rtol=1e-5, atol=1e-5)
    want = np.zeros((B, N, F), np.float32)
    for c in range(2):
        for g in range(B):
            want[g] += 0.25 * feats[g] + dense[c, g] @ feats[g]
    np.testing.assert_allclose(
        np.asarray(out).reshape(B, N, F), want, rtol=1e-4, atol=1e-4
    )


def test_gat_receiver_softmax_normalised():
    gb, dense, feats = _toy_batch(C=1)
    x = _x(gb, feats)
    layer = knn.GAT(channels=1, normalize="receiver")
    params, out = _init_apply(layer, x, gb)
    assert np.asarray(out).shape == x.shape
    assert np.all(np.asarray(out) >= 0) and np.all(np.asarray(out) <= 1)


def _symmetric_toy_batch(seed=0, B=2, N=4, F=3):
    """Symmetric adjacency + self loops (molecular-style), so the reference's
    sender-gathered softmax denominator is always positive."""
    from kgcn_tpu.graph.batch import batch_graphs

    rng = np.random.RandomState(seed)
    dense = np.zeros((1, B, N, N), np.float32)
    adjs = []
    for g in range(B):
        a = (rng.random_sample((N, N)) < 0.4).astype(np.float32)
        a = np.maximum(a, a.T)
        np.fill_diagonal(a, 1.0)
        dense[0, g] = a
        row, col = np.nonzero(a)
        adjs.append([(np.stack([row, col], 1).astype(np.int32), a[row, col], (N, N))])
    feats = (0.5 * rng.standard_normal((B, N, F))).astype(np.float32)
    return batch_graphs(adjs, feats, N), dense, feats


def test_gat_sender_mode_matches_reference_numpy():
    gb, dense, feats = _symmetric_toy_batch()
    B, N, F = feats.shape
    x = _x(gb, feats)
    layer = knn.GAT(channels=1, normalize="sender")
    params = layer.init(jax.random.PRNGKey(0), x, gb)
    out = np.asarray(layer.apply(params, x, gb)).reshape(B, N, F)
    a = np.asarray(params["params"]["attn"])[0]  # [2F, 1]

    # numpy reproduction of kgcn/layers.py:521-535
    flat = feats.reshape(B * N, F)
    s = np.asarray(gb.senders[0])
    r = np.asarray(gb.receivers[0])
    ne = int(np.asarray(gb.n_edge)[0])
    s, r = s[:ne], r[:ne]
    aa = np.concatenate([flat[s], flat[r]], axis=1)
    logit = aa @ a
    logit = np.where(logit > 0, logit, 0.2 * logit)  # leaky_relu
    e = np.exp(logit[:, 0])
    denom = np.zeros(B * N)
    np.add.at(denom, r, e)
    alpha = e / (denom[s] + 1e-10)
    agg = np.zeros((B * N, F))
    np.add.at(agg, r, alpha[:, None] * flat[s])
    want = 1.0 / (1.0 + np.exp(-agg))
    np.testing.assert_allclose(out.reshape(B * N, F), want, rtol=1e-4, atol=1e-4)


def test_maxpool_matches_dense_numpy():
    gb, dense, feats = _toy_batch(C=2)
    B, N, F = feats.shape
    x = _x(gb, feats)
    layer = knn.GraphMaxPooling(channels=2)
    params, out = _init_apply(layer, x, gb)
    want = np.zeros((B, N, F), np.float32)
    for c in range(2):
        for g in range(B):
            # reference: max over dense (A ⊙ x) rows, implicit zeros included
            prod = dense[c, g][:, :, None] * feats[g][None, :, :]
            want[g] += prod.max(axis=1)
    np.testing.assert_allclose(
        np.asarray(out).reshape(B, N, F), want, rtol=1e-4, atol=1e-4
    )


def test_gather_masks_padding():
    gb, dense, feats = _toy_batch()
    x = _x(gb, feats)
    layer = knn.GraphGather()
    params, out = _init_apply(layer, x, gb)
    want = feats.sum(axis=1)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)


def test_graph_dense_zeroes_padding():
    gb, dense, feats = _toy_batch(B=2, N=4)
    # mark the last node of graph 1 as padding
    mask = np.asarray(gb.node_mask).copy()
    mask[-1] = 0.0
    gb = gb.replace(node_mask=jnp.asarray(mask))
    x = _x(gb, feats)
    layer = knn.GraphDense(features=6)
    params, out = _init_apply(layer, x, gb)
    assert np.all(np.asarray(out)[-1] == 0.0)
    assert np.any(np.asarray(out)[0] != 0.0)


def test_batchnorm_masked_moments():
    gb, dense, feats = _toy_batch(B=2, N=4, F=3)
    mask = np.asarray(gb.node_mask).copy()
    mask[-2:] = 0.0
    gb = gb.replace(node_mask=jnp.asarray(mask))
    x = _x(gb, feats)
    layer = knn.GraphBatchNormalization(use_running_average=False)
    vars0 = layer.init(jax.random.PRNGKey(0), x, gb)
    out, updates = layer.apply(vars0, x, gb, mutable=["batch_stats"])
    out = np.asarray(out)
    valid = mask > 0
    # normalised valid rows have ~zero mean / unit variance per feature
    np.testing.assert_allclose(out[valid].mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(out[valid].var(axis=0), 1.0, atol=2e-2)
    # padding rows zeroed
    assert np.all(out[~valid] == 0)


def test_decoders_and_distmult():
    gb, dense, feats = _toy_batch(B=2, N=4, F=3)
    x = _x(gb, feats)
    ip = knn.GraphDecoderInnerProd()
    params, out = _init_apply(ip, x, gb)
    want = np.einsum("bnf,bmf->bnm", feats, feats)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-4)

    dm = knn.GraphDecoderDistMult()
    params, out = _init_apply(dm, x, gb)
    w = np.asarray(params["params"]["kernel"])
    want = np.einsum("bnf,bmf->bnm", w * feats, feats)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-4)

    md = knn.DistMult(dim=3, channels=2)
    params, out = _init_apply(md, x, gb)
    assert np.asarray(out).shape == (2, 2, 4, 4)
    w = np.asarray(params["params"]["kernel"])
    want = np.einsum("cf,bnf,bmf->bcnm", w, feats, feats)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-4)

    # score consistency: score(h,t,c) == diagonal of full reconstruction
    zh = feats[0, :2]
    zt = feats[0, 2:]
    sc = md.apply(params, zh, zt, jnp.array([0, 1]), method=md.score)
    want_sc = [
        np.sum(zh[0] * zt[0] * w[0]),
        np.sum(zh[1] * zt[1] * w[1]),
    ]
    np.testing.assert_allclose(np.asarray(sc), want_sc, rtol=1e-4)


def test_node_embedding():
    gb, dense, feats = _toy_batch(B=2, N=4)
    ids = jnp.asarray(np.arange(8, dtype=np.int32) % 5)
    gb = gb.replace(node_ids=ids, nodes=None)
    layer = knn.NodeEmbedding(vocab_size=5, features=6)
    params, out = _init_apply(layer, gb)
    assert np.asarray(out).shape == (8, 6)


@pytest.mark.parametrize("normalize", ["receiver", "sender"])
def test_gat_dense_path_matches_coo(normalize):
    """The dense [B,N,N] MXU attention grid must equal the edge-list
    segment path for both softmax normalizations."""
    from tests.test_graph_batch import _toy_batch
    from kgcn_tpu import nn as knn

    gb, _, feats = _toy_batch(seed=3, B=3, N=5, F=4, C=2)
    x = jnp.asarray(feats.reshape(-1, feats.shape[-1]))
    layer = knn.GAT(channels=2, normalize=normalize)
    params = layer.init(jax.random.PRNGKey(0), x, gb)
    out_coo = layer.apply(params, x, gb)
    out_dense = layer.apply(params, x, gb.with_dense_adj())
    np.testing.assert_allclose(
        np.asarray(out_dense), np.asarray(out_coo), rtol=2e-5, atol=2e-5
    )
    # gradients agree too (both paths train identically)
    def loss(p, g):
        return jnp.sum(layer.apply(p, x, g) ** 2)

    g1 = jax.grad(loss)(params, gb)
    g2 = jax.grad(loss)(params, gb.with_dense_adj())
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        ),
        g1, g2,
    )
