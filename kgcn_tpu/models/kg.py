"""Knowledge-graph link prediction (reference: sample_kg/network_prediction/
model_py/{distmult,gcn,gin,ip}.py + preference-pair feed kgcn/feed.py:33-86).

Workload shape: ONE big multi-relation graph (batch = 1, node-embedding mode),
trained on preference pairs — a positive triple (h, r, t) against a corrupted
negative (h', r', t'), margin-logistic loss
``cost = −log σ(s_pos − s_neg − γ)`` (distmult.py:52-56 with
score = s2 − s1 + γ and output = 1/(1+exp(score))).

Triple layout matches the reference label_list columns:
``[h, r, t, h_neg, r_neg, t_neg]`` (kgcn/feed.py:33-86).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from kgcn_tpu import nn as knn
from kgcn_tpu.data.batcher import Batch
from kgcn_tpu.models.base import ModelOutput


def sample_negatives(
    label_list: np.ndarray,
    all_nodes: np.ndarray,
    rng: np.random.RandomState,
    mode: str = "both",
) -> np.ndarray:
    """Fill columns 3..5 with a corrupted copy of the positive triple
    (reference: get_preference_label_list_feed, kgcn/feed.py:33-86;
    ``preference_pair_mode`` right / left / both)."""
    out = np.array(label_list, dtype=np.int32, copy=True)
    n = len(out)
    neg = rng.choice(all_nodes, (n,))
    if mode == "right":
        out[:, 3] = out[:, 0]
        out[:, 4] = out[:, 1]
        out[:, 5] = neg
    elif mode == "left":
        out[:, 3] = neg
        out[:, 4] = out[:, 1]
        out[:, 5] = out[:, 2]
    else:  # both: corrupt one random side
        out[:, 3] = out[:, 0]
        out[:, 4] = out[:, 1]
        out[:, 5] = out[:, 2]
        side = rng.choice([3, 5], (n,))
        out[np.arange(n), side] = neg
    return out


class KGLinkPredictor(nn.Module):
    """Node-embedding (optionally GCN/GIN-refined) encoder + DistMult scorer.

    ``encoder``: 'embedding' (distmult.py), 'gcn' or 'gin' (the reference's
    gcn.py / gin.py variants refine embeddings with graph convolutions over
    the relation-typed adjacency before scoring).
    """

    all_node_num: int
    embedding_dim: int = 10
    channels: int = 1
    encoder: str = "embedding"
    gamma: float = 0.1

    def setup(self):
        self.embed = nn.Embed(self.all_node_num, self.embedding_dim)
        if self.encoder in ("gcn", "gin"):
            self.conv1 = (
                knn.GraphConv(self.embedding_dim, self.channels)
                if self.encoder == "gcn"
                else knn.GINAggregate(self.channels)
            )
            self.conv2 = (
                knn.GraphConv(self.embedding_dim, self.channels)
                if self.encoder == "gcn"
                else knn.GINAggregate(self.channels)
            )
        self.distmult = knn.DistMult(
            dim=self.embedding_dim, channels=self.channels
        )

    def node_embeddings(self, batch: Batch):
        g = batch.graph
        x = self.embed(g.node_ids) * g.node_mask[:, None]
        if self.encoder in ("gcn", "gin"):
            x = jnp.tanh(self.conv1(x, g))
            x = jnp.tanh(self.conv2(x, g))
        return x  # [V, dim]

    def __call__(self, batch: Batch, train: bool = False) -> ModelOutput:
        z = self.node_embeddings(batch)
        ll = batch.label_list[0]  # [L, 6] — batch=1 whole-graph mode
        h_pos, r_pos, t_pos = ll[:, 0], ll[:, 1], ll[:, 2]
        h_neg, r_neg, t_neg = ll[:, 3], ll[:, 4], ll[:, 5]
        s1 = self.distmult.score(z[h_pos], z[t_pos], r_pos)
        s2 = self.distmult.score(z[h_neg], z[t_neg], r_neg)
        # reference loss (distmult.py:52-56) in its gradient-stable form:
        # -log(1/(1+exp(s))) == softplus(s); the literal transcription NaNs
        # the backward pass once s ≳ 88 in float32 (exp overflow → -inf/inf)
        score = s2 - s1 + self.gamma
        cost = jax.nn.softplus(score)
        # wrap-padded slice rows (KGBatcher pads the last slice cyclically)
        # must not be double-counted in gradients or metrics
        lv = (batch.label_valid[0] if batch.label_valid is not None
              else jnp.ones((ll.shape[0],), jnp.float32))
        cost = cost * lv
        n = jnp.maximum(jnp.sum(lv), 1.0)
        metrics = {
            "correct_count": jnp.sum((s1 > s2).astype(jnp.float32) * lv),
            "count": jnp.sum(lv),
        }
        return ModelOutput(
            prediction=z[None],  # [1, V, dim] node embeddings
            cost_opt=jnp.sum(cost) / n,
            cost_sum=jnp.sum(cost),
            metrics=metrics,
        )

    def left_prediction(self, batch: Batch, tails, relations):
        """Score EVERY entity as head for each (r, t): [K, V]
        (reference: distmult.py:63-66 via compute_left_prediction)."""
        z = self.node_embeddings(batch)
        return self.distmult.left_prediction(z, z[tails], relations)

    def right_prediction(self, batch: Batch, heads, relations):
        z = self.node_embeddings(batch)
        return self.distmult.right_prediction(z[heads], z, relations)


class KGBatcher:
    """Yields whole-graph batches with label-list slices + fresh negatives.

    Implements the reference's ``label_batch_size`` inner label iteration
    (kgcn/core.py:219-222,258) and per-step negative resampling
    (kgcn/feed.py:33-86).
    """

    def __init__(self, ds, info, *, label_batch_size: Optional[int] = None,
                 pair_mode: str = "both", seed: int = 0, test: bool = False):
        from kgcn_tpu.data.batcher import Batcher

        self.ds = ds
        self.info = info
        base = Batcher(ds, info, batch_size=1, seed=seed)
        self.graph_batch = base.make_batch(np.arange(1))
        self.label_list = np.asarray(ds.label_list[0], dtype=np.int32)
        if self.label_list.shape[1] == 3:  # pad pos-only triples to 6 cols
            self.label_list = np.concatenate(
                [self.label_list, self.label_list], axis=1
            )
        self.label_batch_size = label_batch_size or len(self.label_list)
        self.pair_mode = pair_mode
        self.all_nodes = np.arange(info.all_node_num, dtype=np.int32)
        self._rng = np.random.RandomState(seed)
        self.test = test

    @property
    def num_labels(self) -> int:
        return len(self.label_list)

    @property
    def valid_per_epoch(self) -> int:
        # one whole-graph "example" per label slice (pad_mask is [1] per batch)
        L = self.label_batch_size
        return (self.num_labels + L - 1) // L

    def batch_valid_counts(self):
        return [1] * self.valid_per_epoch

    def _epoch_label_lists(self, shuffle: bool) -> np.ndarray:
        """[S, L, 6] label slices for one epoch (wrap-padded last slice,
        fresh negatives) — the same stream ``batches`` yields."""
        order = np.arange(self.num_labels)
        if shuffle:
            self._rng.shuffle(order)
        L = self.label_batch_size
        slices, valids = [], []
        for start in range(0, self.num_labels, L):
            idx = order[start : start + L]
            n_real = len(idx)
            if n_real < L:  # pad to static shape by cyclic wrapping
                # (np.resize repeats idx however large the shortfall —
                # a single concatenate falls short when L > 2·num_labels)
                idx = np.resize(idx, L)
            ll = self.label_list[idx]
            if not self.test:
                ll = sample_negatives(ll, self.all_nodes, self._rng, self.pair_mode)
            slices.append(ll)
            valids.append((np.arange(L) < n_real).astype(np.float32))
        return np.stack(slices), np.stack(valids)

    def init_batch(self) -> Batch:
        """A shape-complete batch for ``Trainer.init_state`` — the first
        label slice with positives echoed as negatives; consumes no RNG and
        samples no negatives (unlike iterating ``batches``, which now
        materialises the whole epoch eagerly)."""
        L = self.label_batch_size
        idx = np.arange(L) % self.num_labels
        lv = (np.arange(L) < self.num_labels).astype(np.float32)
        return self.graph_batch.replace(
            label_list=jnp.asarray(self.label_list[idx][None]),
            label_valid=jnp.asarray(lv[None]),
        )

    def batches(self, shuffle: bool = True):
        lls, lvs = self._epoch_label_lists(shuffle)
        for ll, lv in zip(lls, lvs):
            yield self.graph_batch.replace(
                label_list=jnp.asarray(ll[None]),
                label_valid=jnp.asarray(lv[None]),
            )

    # --- whole-epoch scan protocol (see Trainer._run_epoch_scanned) -------
    def epoch_scan_inputs(self, shuffle: bool = True, epoch=None):
        """(constant batch, per-step xs): the graph is static across steps;
        only the [S, 1, L, 6] label slices vary — a whole KG epoch becomes
        one jit dispatch instead of S (reference: label_batch_size inner
        loop, kgcn/core.py:219-222)."""
        lls, lvs = self._epoch_label_lists(shuffle)
        return self.graph_batch, (jnp.asarray(lls[:, None]),
                                  jnp.asarray(lvs[:, None]))

    @staticmethod
    def make_scan_batch(const_batch: Batch, x) -> Batch:
        ll, lv = x
        return const_batch.replace(label_list=ll, label_valid=lv)
