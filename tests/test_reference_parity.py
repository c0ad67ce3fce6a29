"""Per-layer numerical parity vs the MOUNTED TF reference implementation.

BASELINE.json requires "allclose per-layer activations vs mounted TF
reference".  These tests build the reference's actual layers
(/root/reference/kgcn/layers.py) in a TF1-compat graph, run them on a small
batch, copy the initialised TF weights into our flax layers, and compare
activations to ~1e-5.
"""
import sys

import numpy as np
import pytest

_tf2 = pytest.importorskip("tensorflow")
sys.path.insert(0, "/root/reference")
tf = _tf2.compat.v1

try:
    import kgcn.layers as ref_layers

    HAVE_REF = True
except Exception:  # pragma: no cover
    HAVE_REF = False

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference unavailable")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kgcn_tpu import nn as knn  # noqa: E402
from kgcn_tpu.graph.batch import batch_graphs  # noqa: E402

B, N, F, C = 2, 6, 5, 2


def _toy(seed=0, symmetric=True, channels=C):
    rng = np.random.RandomState(seed)
    dense = np.zeros((channels, B, N, N), np.float32)
    for c in range(channels):
        for g in range(B):
            a = (rng.random_sample((N, N)) < 0.5).astype(np.float32)
            if symmetric:
                a = np.maximum(a, a.T)
            np.fill_diagonal(a, 1.0)
            dense[c, g] = a * (0.5 + rng.random_sample((N, N))).astype(np.float32) if False else a
    feats = rng.standard_normal((B, N, F)).astype(np.float32)
    return dense, feats


def _graph_batch(dense, feats):
    channels = dense.shape[0]
    adjs = []
    for g in range(B):
        chans = []
        for c in range(channels):
            r, col = np.nonzero(dense[c, g])
            chans.append(
                (np.stack([r, col], 1).astype(np.int32),
                 dense[c, g][r, col].astype(np.float32), (N, N))
            )
        adjs.append(chans)
    return batch_graphs(adjs, feats, N)


def _tf_sparse_feed(dense):
    """Build per-(graph, channel) sparse placeholders + their feeds
    (the reference feed model, kgcn/feed.py:112-126)."""
    phs, feed = [], {}
    channels = dense.shape[0]
    for g in range(B):
        row = []
        for c in range(channels):
            ph = tf.sparse_placeholder(tf.float32)
            idx = np.stack(np.nonzero(dense[c, g]), 1).astype(np.int64)
            val = dense[c, g][idx[:, 0], idx[:, 1]].astype(np.float32)
            feed[ph] = tf.SparseTensorValue(idx, val, (N, N))
            row.append(ph)
        phs.append(row)
    return phs, feed


def _run_ref(build_fn, dense, feats):
    """Build + run a reference layer; returns (output, trainable values)."""
    tf.reset_default_graph()
    tf.set_random_seed(0)
    x = tf.constant(feats)
    phs, feed = _tf_sparse_feed(dense)
    out_t, layer = build_fn(x, phs)
    with tf.Session() as sess:
        sess.run(tf.global_variables_initializer())
        weights = sess.run(
            {v.name: v for v in tf.trainable_variables()}
        )
        out = sess.run(out_t, feed_dict=feed)
    return out, weights


def test_graphconv_parity():
    dense, feats = _toy()

    def build(x, phs):
        layer = ref_layers.GraphConv(7, C)
        return layer(x, adj=phs), layer

    ref_out, weights = _run_ref(build, dense, feats)
    kernel = np.stack(
        [weights[f"graph_conv/kernel{i}:0"] for i in range(C)]
    )
    bias = np.stack(
        [weights[f"graph_conv/bias{i}:0"][0] for i in range(C)]
    )
    gb = _graph_batch(dense, feats)
    x = jnp.asarray(feats.reshape(B * N, F))
    ours = knn.GraphConv(features=7, channels=C).apply(
        {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}},
        x, gb,
    )
    np.testing.assert_allclose(
        np.asarray(ours).reshape(B, N, 7), ref_out, rtol=1e-4, atol=1e-5
    )
    # dense MXU path too
    ours_d = knn.GraphConv(features=7, channels=C).apply(
        {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}},
        x, gb.with_dense_adj(),
    )
    np.testing.assert_allclose(
        np.asarray(ours_d).reshape(B, N, 7), ref_out, rtol=1e-4, atol=1e-5
    )


def test_gin_parity():
    dense, feats = _toy()

    def build(x, phs):
        layer = ref_layers.GINAggregate(C)
        return layer(x, adj=phs), layer

    ref_out, weights = _run_ref(build, dense, feats)
    # reference inits ε to zeros; the naive path applies ε_c·X + A_c X
    eps = np.array(
        [weights[f"gin_aggregate/epsilon{i}:0"] for i in range(C)], np.float32
    )
    gb = _graph_batch(dense, feats)
    x = jnp.asarray(feats.reshape(B * N, F))
    ours = knn.GINAggregate(channels=C).apply(
        {"params": {"epsilon": jnp.asarray(eps)}}, x, gb
    )
    np.testing.assert_allclose(
        np.asarray(ours).reshape(B, N, F), ref_out, rtol=1e-4, atol=1e-5
    )


def test_gat_parity_sender_mode():
    dense, feats = _toy(channels=1)

    def build(x, phs):
        layer = ref_layers.GAT(1)
        return layer(x, adj=phs), layer

    ref_out, weights = _run_ref(build, dense, feats)
    attn = weights["gat/weight_a0:0"][None]  # [1, 2F, 1]
    gb = _graph_batch(dense, feats)
    x = jnp.asarray(feats.reshape(B * N, F))
    ours = knn.GAT(channels=1, normalize="sender").apply(
        {"params": {"attn": jnp.asarray(attn)}}, x, gb
    )
    np.testing.assert_allclose(
        np.asarray(ours).reshape(B, N, F), ref_out, rtol=1e-4, atol=1e-4
    )


def test_maxpool_parity():
    dense, feats = _toy(channels=C)

    def build(x, phs):
        layer = ref_layers.GraphMaxPooling(C)
        return layer(x, adj=phs), layer

    ref_out, _ = _run_ref(build, dense, feats)
    gb = _graph_batch(dense, feats)
    x = jnp.asarray(feats.reshape(B * N, F))
    ours = knn.GraphMaxPooling(channels=C).apply({"params": {}}, x, gb)
    np.testing.assert_allclose(
        np.asarray(ours).reshape(B, N, F), ref_out, rtol=1e-4, atol=1e-5
    )


def test_gather_parity():
    dense, feats = _toy()

    def build(x, phs):
        layer = ref_layers.GraphGather()
        return layer(x), layer

    ref_out, _ = _run_ref(build, dense, feats)
    gb = _graph_batch(dense, feats)
    x = jnp.asarray(feats.reshape(B * N, F))
    ours = knn.GraphGather().apply({"params": {}}, x, gb)
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=1e-5, atol=1e-5)


def test_decoder_distmult_parity():
    dense, feats = _toy()

    def build(x, phs):
        layer = ref_layers.GraphDecoderDistMult()
        return layer(x), layer

    ref_out, weights = _run_ref(build, dense, feats)
    w = weights["graph_decoder_dist_mult/kernel:0"]
    gb = _graph_batch(dense, feats)
    x = jnp.asarray(feats.reshape(B * N, F))
    ours = knn.GraphDecoderDistMult().apply(
        {"params": {"kernel": jnp.asarray(w)}}, x, gb
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=1e-4, atol=1e-5)


def test_distmult_full_parity():
    dense, feats = _toy()

    def build(x, phs):
        layer = ref_layers.DistMult(adj_channel_num=C)
        return layer(x), layer

    ref_out, weights = _run_ref(build, dense, feats)
    w = weights["dist_mult/kernel:0"]
    gb = _graph_batch(dense, feats)
    x = jnp.asarray(feats.reshape(B * N, F))
    ours = knn.DistMult(dim=F, channels=C).apply(
        {"params": {"kernel": jnp.asarray(w)}}, x, gb
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=1e-4, atol=1e-5)
