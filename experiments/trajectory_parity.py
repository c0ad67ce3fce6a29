"""Trajectory-level parity: 5-epoch loss curves, reference TF1 stack vs ours.

Builds the reference GCN architecture (example_model/model.py:30-71) from the
MOUNTED reference layers in a TF1-compat graph, trains it with Adam on the
ring dataset (full-batch, shuffle off, dropout 0), then trains OUR `gcn`
model from the SAME initial weights on the same data and compares the
per-epoch training-cost curves.
"""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

import scipy

scipy.interp = np.interp
sys.path.insert(0, "/root/reference")

import tensorflow as _tf2

tf = _tf2.compat.v1
tf.disable_v2_behavior()
from tensorflow.python.keras import layers as _legacy_layers  # noqa: E402

import kgcn.layers as ref_layers  # noqa: E402

B, N, F = 40, 10, 20
EPOCHS = 5
LR = 0.01


def make_data(seed=0):
    from kgcn_tpu.data.synthetic import make_ring_dataset

    data = make_ring_dataset(num_pairs=B // 2, seed=seed)
    dense = np.asarray(data["dense_adj"], np.float32)[None]  # [1, B, N, N]
    # add self loops like build_dataset's default pipeline
    for g in range(B):
        np.fill_diagonal(dense[0, g], 1.0)
    # Kipf-normalise like normalize_adj_flag (both sides use the same math)
    from kgcn_tpu.graph.transforms import normalize_adj

    for g in range(B):
        r, c = np.nonzero(dense[0, g])
        v = dense[0, g][r, c]
        rn, cn, vn = normalize_adj(r, c, v, N)
        dense[0, g] = 0
        dense[0, g][rn, cn] = vn
    feats = np.asarray(data["feature"], np.float32)
    labels = np.asarray(data["label"], np.float32)
    if labels.ndim == 1:  # to one-hot
        oh = np.zeros((len(labels), 2), np.float32)
        oh[np.arange(len(labels)), labels.astype(int)] = 1.0
        labels = oh
    return dense, feats, labels


def run_reference(dense, feats, labels, seed=0):
    tf.reset_default_graph()
    tf.set_random_seed(seed)
    phs = []
    feed = {}
    for g in range(B):
        ph = tf.sparse_placeholder(tf.float32)
        idx = np.stack(np.nonzero(dense[0, g]), 1).astype(np.int64)
        val = dense[0, g][idx[:, 0], idx[:, 1]].astype(np.float32)
        feed[ph] = tf.SparseTensorValue(idx, val, (N, N))
        phs.append([ph])
    x = tf.constant(feats)
    y = tf.constant(labels)
    enabled = tf.constant(np.full((B,), N, np.int32))

    layer = ref_layers.GraphConv(50, 1)(x, adj=phs)
    layer = tf.sigmoid(layer)
    layer = ref_layers.GraphConv(50, 1)(layer, adj=phs)
    layer = tf.sigmoid(layer)
    layer = ref_layers.GraphConv(50, 1)(layer, adj=phs)
    layer = ref_layers.GraphBatchNormalization()(
        layer, max_node_num=N, enabled_node_nums=enabled
    )
    layer = tf.sigmoid(layer)
    layer = ref_layers.GraphDense(50)(layer)
    layer = tf.sigmoid(layer)
    layer = ref_layers.GraphGather()(layer)
    logits = _legacy_layers.Dense(2)(layer)
    cost = tf.nn.softmax_cross_entropy_with_logits_v2(labels=y, logits=logits)
    cost_opt = tf.reduce_mean(cost)
    update_ops = tf.get_collection(tf.GraphKeys.UPDATE_OPS)
    with tf.control_dependencies(update_ops):
        step = tf.train.AdamOptimizer(LR).minimize(cost_opt)

    sess = tf.Session()
    sess.run(tf.global_variables_initializer())
    weights = {
        v.name: sess.run(v) for v in tf.trainable_variables()
    }
    print("[ref] update_ops:", len(update_ops))
    print("[ref] vars:", sorted(weights))
    curve = []
    for ep in range(EPOCHS):
        c0 = sess.run(cost_opt, feed_dict=feed)
        sess.run(step, feed_dict=feed)
        curve.append(float(c0))
    curve.append(float(sess.run(cost_opt, feed_dict=feed)))
    sess.close()
    return curve, weights


def run_ours(dense, feats, labels, weights, bn_momentum=0.9, frozen_bn=False):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import optax
    from flax.core import freeze, unfreeze

    from kgcn_tpu import nn as knn
    from flax import linen as nn
    from kgcn_tpu.graph.batch import batch_graphs
    from kgcn_tpu.models.base import ModelOutput

    class RefGCN(nn.Module):
        @nn.compact
        def __call__(self, x, g, train=True):
            x = jax.nn.sigmoid(knn.GraphConv(50, 1)(x, g))
            x = jax.nn.sigmoid(knn.GraphConv(50, 1)(x, g))
            x = knn.GraphConv(50, 1)(x, g)
            x = knn.GraphBatchNormalization(momentum=bn_momentum)(
                x, g, use_running_average=frozen_bn or not train
            )
            x = jax.nn.sigmoid(x)
            x = jax.nn.sigmoid(knn.GraphDense(50)(x, g))
            h = knn.GraphGather()(x, g)
            return nn.Dense(2)(h)

    adjs = []
    for g in range(B):
        r, c = np.nonzero(dense[0, g])
        adjs.append([(np.stack([r, c], 1), dense[0, g][r, c], (N, N))])
    gb = batch_graphs(adjs, feats, N)
    x = jnp.asarray(feats.reshape(B * N, feats.shape[-1]))
    y = jnp.asarray(labels)

    model = RefGCN()
    variables = model.init(jax.random.PRNGKey(0), x, gb, train=True)
    params = unfreeze(variables["params"])

    # map reference weights in
    def W(name):
        return jnp.asarray(weights[name])

    params["GraphConv_0"] = {"kernel": W("graph_conv/kernel0:0")[None],
                             "bias": W("graph_conv/bias0:0")}
    params["GraphConv_1"] = {"kernel": W("graph_conv_1/kernel0:0")[None],
                             "bias": W("graph_conv_1/bias0:0")}
    params["GraphConv_2"] = {"kernel": W("graph_conv_2/kernel0:0")[None],
                             "bias": W("graph_conv_2/bias0:0")}
    bn_g = [k for k in weights if "gamma" in k][0]
    bn_b = [k for k in weights if "beta" in k][0]
    params["GraphBatchNormalization_0"] = {"scale": W(bn_g), "bias": W(bn_b)}
    gd_k = [k for k in weights if "graph_dense" in k and "kernel" in k][0]
    gd_b = [k for k in weights if "graph_dense" in k and "bias" in k][0]
    params["GraphDense_0"] = {"Dense_0": {"kernel": W(gd_k),
                                          "bias": W(gd_b)}}
    d_k = [k for k in weights if k.startswith("dense") and "kernel" in k][0]
    d_b = [k for k in weights if k.startswith("dense") and "bias" in k][0]
    params["Dense_0"] = {"kernel": W(d_k), "bias": W(d_b)}
    # fix shapes: reference bias is [1, dim] for graph layers
    for lyr in ("GraphConv_0", "GraphConv_1", "GraphConv_2"):
        b = params[lyr]["bias"]
        params[lyr]["bias"] = b.reshape(1, -1)

    bstats = variables.get("batch_stats", {})
    tx = optax.adam(LR)
    opt_state = tx.init(params)

    def loss_fn(p, bs):
        out, upd = model.apply(
            {"params": p, "batch_stats": bs}, x, gb, train=True,
            mutable=["batch_stats"],
        )
        logits = out.astype(jnp.float32)
        logp = jax.nn.log_softmax(logits)
        return jnp.mean(-jnp.sum(y * logp, axis=-1)), upd.get("batch_stats", bs)

    import functools

    @jax.jit
    def step(p, bs, opt):
        (c, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, bs)
        updates, opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, updates), new_bs, opt, c

    curve = []
    for ep in range(EPOCHS):
        params, bstats, opt_state, c = step(params, bstats, opt_state)
        curve.append(float(c))
    c, _ = loss_fn(params, bstats)
    curve.append(float(c))
    return curve


def main():
    dense, feats, labels = make_data()
    ref_curve, weights = run_reference(dense, feats, labels)
    print("[ref]  curve:", [f"{c:.6f}" for c in ref_curve])
    for m, fb in ((0.9, False), (0.9, True)):
        ours = run_ours(dense, feats, labels, weights, bn_momentum=m,
                        frozen_bn=fb)
        tag = f"momentum={m} frozen_bn={fb}"
        print(f"[ours {tag}] curve:", [f"{c:.6f}" for c in ours])
        drift = [abs(a - b) / max(abs(a), 1e-6)
                 for a, b in zip(ref_curve, ours)]
        print(f"[ours {tag}] rel drift per epoch:",
              [f"{d:.4f}" for d in drift])


if __name__ == "__main__":
    main()
