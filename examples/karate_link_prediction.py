#!/usr/bin/env python
"""Karate-club link prediction demo.

Reference: sample_nx/link_prediction/model_gcn.py:25-50 — a GCN encoder over
one small social graph with an inner-product decoder, trained to reconstruct
the adjacency with some edges held out; evaluated by AUC on held-out edges
vs random non-edges.

Run: python examples/karate_link_prediction.py [--cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def karate_graph():
    """Zachary's karate club (34 nodes) via networkx."""
    import networkx as nx

    G = nx.karate_club_graph()
    n = G.number_of_nodes()
    A = np.zeros((n, n), np.float32)
    for u, v in G.edges():
        A[u, v] = A[v, u] = 1.0
    return A


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--epochs", type=int, default=150)
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import optax
    from flax import linen as nn

    from kgcn_tpu import nn as knn
    from kgcn_tpu.data import Batcher, build_dataset

    A = karate_graph()
    n = len(A)
    rng = np.random.RandomState(0)

    # hold out 20% of edges (symmetric) for evaluation
    iu = np.transpose(np.triu_indices(n, 1))
    edges = iu[A[iu[:, 0], iu[:, 1]] > 0]
    non_edges = iu[A[iu[:, 0], iu[:, 1]] == 0]
    rng.shuffle(edges)
    n_test = len(edges) // 5
    test_edges = edges[:n_test]
    train_A = A.copy()
    train_A[test_edges[:, 0], test_edges[:, 1]] = 0
    train_A[test_edges[:, 1], test_edges[:, 0]] = 0
    np.fill_diagonal(train_A, 1.0)

    data = {
        "dense_adj": train_A[None].astype(np.int64),
        "feature": np.eye(n, dtype=np.float64)[None],
        "label": np.zeros((1, 2)),
        "mask_label": np.ones((1, 2), np.int64),
        "max_node_num": np.int64(n),
    }
    ds, info = build_dataset(data, {"normalize_adj_flag": True})
    batch = Batcher(ds, info, 1, seed=0).make_batch(np.arange(1))

    class LinkGCN(nn.Module):
        @nn.compact
        def __call__(self, batch):
            g = batch.graph.with_dense_adj()
            x = jnp.tanh(knn.GraphConv(32, 1)(batch.graph.nodes, g))
            z = knn.GraphConv(16, 1)(x, g)
            return knn.GraphDecoderInnerProd()(z, g)[0]  # [n, n] logits

    model = LinkGCN()
    params = model.init(jax.random.PRNGKey(0), batch)
    target = jnp.asarray(A)
    pos_weight = (n * n - A.sum()) / A.sum()

    def loss_fn(params):
        logits = model.apply(params, batch)
        ce = (1 - target) * jax.nn.softplus(logits) + target * pos_weight * (
            jax.nn.softplus(-logits)
        )
        return jnp.mean(ce)

    tx = optax.adam(0.01)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        g = jax.grad(loss_fn)(params)
        updates, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, updates), opt

    for ep in range(args.epochs):
        params, opt = step(params, opt)
        if ep % 30 == 0:
            print(f"epoch {ep}: loss {float(loss_fn(params)):.4f}")

    scores = np.asarray(model.apply(params, batch))
    from sklearn.metrics import roc_auc_score

    neg_sample = non_edges[rng.choice(len(non_edges), len(test_edges), replace=False)]
    y = np.concatenate([np.ones(len(test_edges)), np.zeros(len(neg_sample))])
    s = np.concatenate(
        [scores[test_edges[:, 0], test_edges[:, 1]],
         scores[neg_sample[:, 0], neg_sample[:, 1]]]
    )
    auc = roc_auc_score(y, s)
    print(f"held-out link prediction AUC: {auc:.3f}")
    assert auc > 0.7, "link prediction failed to learn"
    return auc


if __name__ == "__main__":
    main()
