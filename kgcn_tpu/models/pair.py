"""Pairwise preference ranking (RankNet) over graph pairs.

Reference: gcn_pair.py driver + example_model/model_pair.py:60-172 — a shared
GCN tower scores each graph of a preference pair (graph1 preferred over
graph0); cost = ``−log σ(s1 − s0)`` (the RankNet loss, model_pair.py:140-142);
``correct_count`` counts pairs ranked the right way.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct

from kgcn_tpu import nn as knn
from kgcn_tpu.data.batcher import Batch, Batcher
from kgcn_tpu.models.base import ModelOutput


@struct.dataclass
class PairBatch:
    """Two aligned graph batches: ``b`` is the preferred graph of each pair."""

    a: Batch
    b: Batch

    @property
    def pad_mask(self):
        return self.a.pad_mask


class GCNPairRanker(nn.Module):
    """Shared tower (GraphConv×3 + MaxPool + BN + Dense + Gather → score)
    applied to both graphs; RankNet loss."""

    channels: int = 1
    label_dim: int = 1
    hidden: int = 32
    dropout_rate: float = 0.2

    def setup(self):
        self.conv1 = knn.GraphConv(self.hidden, self.channels)
        self.conv2 = knn.GraphConv(self.hidden, self.channels)
        self.conv3 = knn.GraphConv(self.hidden, self.channels)
        self.maxpool = knn.GraphMaxPooling(self.channels)
        self.bn = knn.GraphBatchNormalization()
        self.dense = knn.GraphDense(self.hidden)
        self.gather = knn.GraphGather()
        self.head = nn.Dense(self.label_dim)
        self.dropout = nn.Dropout(self.dropout_rate)

    def tower(self, batch: Batch, train: bool):
        g = batch.graph.with_dense_adj()
        x = jax.nn.sigmoid(self.conv1(batch.graph.nodes, g))
        x = jax.nn.sigmoid(self.conv2(x, g))
        x = self.conv3(x, g)
        x = self.maxpool(x, batch.graph)  # maxpool uses edge lists
        x = jax.nn.sigmoid(self.bn(x, g, use_running_average=not train))
        x = self.dropout(x, deterministic=not train)
        x = jax.nn.sigmoid(self.dense(x, g))
        return self.head(self.gather(x, g))  # [B, label_dim]

    def __call__(self, pair: PairBatch, train: bool = False) -> ModelOutput:
        s0 = self.tower(pair.a, train)
        s1 = self.tower(pair.b, train)
        mask = pair.a.pad_mask
        # RankNet: −log σ(s1 − s0) (model_pair.py:140-142) in its
        # gradient-stable softplus form — the literal 1/(1+exp(s0−s1))
        # NaNs the backward once the score gap exceeds ~88 in float32
        cost = mask * jax.nn.softplus((s0 - s1)[:, 0])
        correct = mask * (s1[:, 0] > s0[:, 0]).astype(jnp.float32)
        miss = mask * (s1[:, 0] < s0[:, 0]).astype(jnp.float32)
        metrics = {
            "correct_count": jnp.sum(correct),
            "miss_count": jnp.sum(miss),
            "count": jnp.sum(mask),
        }
        prediction = jnp.stack([s0, s1], axis=1)  # [B, 2, label_dim]
        return ModelOutput(prediction, jnp.mean(cost), jnp.sum(cost), metrics)


class PairBatcher:
    """Yields PairBatch from a dataset + index pairs.

    ``pairs[i] = (idx_worse, idx_better)`` — the reference feeds these through
    ``graph_index_list`` (kgcn/feed_index.py:8-111, gcn_pair.py:22-112).
    """

    def __init__(self, ds, info, pairs, batch_size: int, seed: int = 0):
        # one Batcher serves both towers — make_batch is stateless w.r.t.
        # which tower consumes it, and a second instance would duplicate the
        # native COO/ELL precomputation and its memory
        self.b0 = Batcher(ds, info, batch_size, seed=seed)
        self.b1 = self.b0
        self.pairs = np.asarray(pairs)
        self.batch_size = batch_size
        self.ds = ds
        self._rng = np.random.RandomState(seed)

    @property
    def valid_per_epoch(self) -> int:
        return len(self.pairs)

    def batch_valid_counts(self):
        n, bs = len(self.pairs), self.batch_size
        return [min(bs, n - s) for s in range(0, n, bs)]

    def make_batch(self, pair_idx) -> PairBatch:
        p = self.pairs[pair_idx]
        self.last_valid = len(p)
        return PairBatch(
            a=self.b0.make_batch(p[:, 0]), b=self.b1.make_batch(p[:, 1])
        )

    def batches(self, shuffle: bool = True):
        order = np.arange(len(self.pairs))
        if shuffle:
            self._rng.shuffle(order)
        for start in range(0, len(order), self.batch_size):
            yield self.make_batch(order[start : start + self.batch_size])


class ResidentPairBatcher:
    """Device-resident pair batcher: the dataset lives in HBM once; each
    scanned step gathers BOTH towers' graphs on device — one jit dispatch
    per epoch (Trainer's generic scan protocol)."""

    def __init__(self, ds, info, pairs, batch_size: int, seed: int = 0):
        import jax

        from kgcn_tpu.runtime.resident import build_device_dataset, gather_batch

        self.device_data = build_device_dataset(ds, info)
        self.pairs = np.asarray(pairs)
        self.batch_size = int(batch_size)
        self.ds = ds
        self.seed = int(seed)
        self._rng = np.random.RandomState(seed)
        self._gather = jax.jit(gather_batch)

    @property
    def valid_per_epoch(self) -> int:
        return len(self.pairs)

    def batch_valid_counts(self):
        n, bs = len(self.pairs), self.batch_size
        return [min(bs, n - s) for s in range(0, n, bs)]

    def _schedule(self, shuffle: bool):
        from kgcn_tpu.data.batcher import epoch_permutation

        order = epoch_permutation(
            len(self.pairs), self.seed, None, rng=self._rng if shuffle else None
        )
        B = self.batch_size
        S = (len(order) + B - 1) // B
        pad = S * B - len(order)
        sched = np.concatenate([order, np.zeros(pad, order.dtype)])
        valid = (np.arange(S * B) < len(order)).astype(np.float32)
        p = self.pairs[sched]  # [S*B, 2]
        return (
            p[:, 0].astype(np.int32).reshape(S, B),
            p[:, 1].astype(np.int32).reshape(S, B),
            valid.reshape(S, B),
        )

    def epoch_scan_inputs(self, shuffle: bool = True, epoch=None):
        import jax.numpy as jnp

        ia, ib, v = self._schedule(shuffle)
        return self.device_data, (jnp.asarray(ia), jnp.asarray(ib), jnp.asarray(v))

    @staticmethod
    def make_scan_batch(dd, x) -> PairBatch:
        from kgcn_tpu.runtime.resident import gather_batch

        ia, ib, v = x
        return PairBatch(a=gather_batch(dd, ia, v), b=gather_batch(dd, ib, v))

    def make_batch(self, pair_idx) -> PairBatch:
        import jax.numpy as jnp

        p = self.pairs[np.asarray(pair_idx)]
        B = self.batch_size
        pad = B - len(p)
        ia = np.concatenate([p[:, 0], np.zeros(pad, np.int64)]).astype(np.int32)
        ib = np.concatenate([p[:, 1], np.zeros(pad, np.int64)]).astype(np.int32)
        v = (np.arange(B) < len(p)).astype(np.float32)
        self.last_valid = len(p)
        return PairBatch(
            a=self._gather(self.device_data, jnp.asarray(ia), jnp.asarray(v)),
            b=self._gather(self.device_data, jnp.asarray(ib), jnp.asarray(v)),
        )

    def batches(self, shuffle: bool = True):
        ia, ib, v = self._schedule(shuffle)
        import jax.numpy as jnp

        for s in range(ia.shape[0]):
            yield PairBatch(
                a=self._gather(self.device_data, jnp.asarray(ia[s]),
                               jnp.asarray(v[s])),
                b=self._gather(self.device_data, jnp.asarray(ib[s]),
                               jnp.asarray(v[s])),
            )
