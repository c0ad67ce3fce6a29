"""Pipeline-parallel GNN training over a ``pipe`` mesh axis (GPipe schedule).

The reference has no pipeline parallelism (SURVEY.md §2.11 — single GPU);
shallow molecular GNNs rarely need it, but deep GCN towers (message-passing
depth = receptive-field radius, e.g. long-range protein-interaction paths)
do not fit one chip once ``layers × hidden² × channels`` weights plus
activation working set exceed HBM.  This module supplies the TPU-native
design for that regime:

* The layer stack is split into ``S = |pipe|`` **stages**; device ``s``
  holds ONLY its stage's parameters (stacked leaf layout ``[S, ...]``
  sharded over ``pipe`` — nothing is replicated, so weight memory scales
  ``1/S``).
* The global batch is split into ``M`` **microbatches**.  One training step
  runs ``T = M + S - 1`` ticks of a ``lax.scan``: at tick ``t`` stage ``s``
  processes microbatch ``t - s`` (when in range) and hands its activation
  to stage ``s+1`` with a ``ppermute`` ring shift — the classic GPipe
  schedule with bubble fraction ``(S-1)/T``.
* The backward pass is **derived by autodiff**: ``jax.grad`` through the
  scan transposes every ``ppermute`` into the reverse shift, yielding the
  mirror-image backward pipeline without any hand-written schedule.
* Stage 0 embeds raw features; the last stage computes readout + head
  logits.  Logits are combined with ``psum`` (only the last stage
  contributes) so the loss is computed once, replicated, outside the
  shard_map — each parameter is touched by exactly one device, so
  per-device gradients are exact with no double counting.

Parity note: the per-stage block is the reference's GraphConv math
(kgcn/layers.py:32-119, dense path) + ReLU, the readout is GraphGather
(kgcn/layers.py:156-167), and the loss is the masked softmax CE of
example_model/model.py:57-69 — i.e. this pipelines the same model family
the reference runs single-device.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class PPConfig:
    stages: int                 # pipe-axis size S
    layers_per_stage: int = 1   # k GraphConv+ReLU blocks per stage
    hidden: int = 64            # uniform activation width H
    microbatches: int = 4       # M
    channels: int = 1           # adjacency channels C
    label_dim: int = 2


def init_pipeline_params(rng, cfg: PPConfig, feature_dim: int) -> Dict:
    """Stage-stacked parameter tree: every leaf has leading axis S (sharded
    over ``pipe``).  Only stage 0's embed and stage S-1's head slices are
    ever used; the spares keep the pytree uniform and get zero gradients."""
    S, k, C, H, L = (cfg.stages, cfg.layers_per_stage, cfg.channels,
                     cfg.hidden, cfg.label_dim)
    ks = jax.random.split(rng, 4)

    def glorot(key, shape, fan_in, fan_out):
        lim = np.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, jnp.float32, -lim, lim)

    return {
        "embed_w": glorot(ks[0], (S, feature_dim, H), feature_dim, H),
        "embed_b": jnp.zeros((S, H)),
        "body_w": glorot(ks[1], (S, k, C, H, H), H, H),
        "body_b": jnp.zeros((S, k, C, H)),
        "head_w": glorot(ks[2], (S, H, L), H, L),
        "head_b": jnp.zeros((S, L)),
    }


def _stage_apply(p_local, z, adj):
    """k × (multi-channel GraphConv + ReLU) on one microbatch.

    ``adj``: [mb, C, N, N] dense (receiver-row convention), ``z``: [mb, N, H].
    Math = kgcn/layers.py:110-115 summed over channels, dense-MXU form.
    """
    k = p_local["body_w"].shape[0]
    for i in range(k):  # k is static and small — unrolled
        w, b = p_local["body_w"][i], p_local["body_b"][i]
        hw = jnp.einsum("mnf,cfo->mcno", z, w) + b[:, None, :]
        z = jax.nn.relu(jnp.einsum("mcnv,mcvo->mno", adj, hw))
    return z


def pipeline_logits(params, x_mbs, adj_mbs, node_mask_mbs, *,
                    cfg: PPConfig, axis: str = "pipe"):
    """Inside-shard_map pipeline forward.

    Args (per device): ``params`` leaves ``[1, ...]`` (this stage's slice);
    data replicated: ``x_mbs`` [M, mb, N, F], ``adj_mbs`` [M, mb, C, N, N],
    ``node_mask_mbs`` [M, mb, N].
    Returns psum'd logits [M, mb, L] (identical on every device).
    """
    S, M = cfg.stages, cfg.microbatches
    s = lax.axis_index(axis)
    p_local = jax.tree_util.tree_map(lambda x: x[0], params)
    T = M + S - 1
    mb, N = x_mbs.shape[1], x_mbs.shape[2]
    H, L = cfg.hidden, cfg.label_dim

    def tick(carry, t):
        buf, logits_acc = carry
        mb_idx = jnp.clip(t - s, 0, M - 1)
        active = ((t - s) >= 0) & ((t - s) < M)
        x_raw = lax.dynamic_index_in_dim(x_mbs, mb_idx, keepdims=False)
        adj = lax.dynamic_index_in_dim(adj_mbs, mb_idx, keepdims=False)
        nmask = lax.dynamic_index_in_dim(node_mask_mbs, mb_idx, keepdims=False)
        # stage 0 embeds the fresh microbatch; later stages consume the ring
        embedded = x_raw @ p_local["embed_w"] + p_local["embed_b"]
        z_in = jnp.where(s == 0, embedded, buf)
        z_out = _stage_apply(p_local, z_in, adj)
        z_out = jnp.where(active, z_out, jnp.zeros_like(z_out))
        # last stage: masked-sum readout (GraphGather) + dense head
        pooled = jnp.sum(z_out * nmask[..., None], axis=1)  # [mb, H]
        logits = pooled @ p_local["head_w"] + p_local["head_b"]
        contrib = jnp.where(active & (s == S - 1), logits,
                            jnp.zeros_like(logits))
        logits_acc = lax.dynamic_update_index_in_dim(
            logits_acc,
            lax.dynamic_index_in_dim(logits_acc, mb_idx, keepdims=False)
            + contrib,
            mb_idx, axis=0,
        )
        buf = lax.ppermute(z_out, axis, [(i, (i + 1) % S) for i in range(S)])
        return (buf, logits_acc), None

    buf0 = jnp.zeros((mb, N, H), x_mbs.dtype)
    acc0 = jnp.zeros((M, mb, L), jnp.float32)
    (_, logits_acc), _ = lax.scan(tick, (buf0, acc0), jnp.arange(T))
    return lax.psum(logits_acc, axis)


def _to_microbatches(arr, M):
    G = arr.shape[0]
    assert G % M == 0, f"batch {G} not divisible by {M} microbatches"
    return arr.reshape(M, G // M, *arr.shape[1:])


class PPTrainer:
    """GPipe trainer: stage-sharded parameters, microbatched steps.

    ``mesh`` must carry a ``pipe`` axis of size ``cfg.stages``.  Parameters
    and optimizer state live sharded ``[S, ...]`` over that axis; one
    ``train_step`` is a single jitted SPMD program.
    """

    def __init__(self, cfg: PPConfig, mesh: Mesh, *, axis: str = "pipe",
                 learning_rate: float = 0.01):
        assert dict(mesh.shape)[axis] == cfg.stages, (
            f"mesh axis {axis}={dict(mesh.shape)[axis]} != stages {cfg.stages}"
        )
        self.cfg = cfg
        self.mesh = mesh
        self.axis = axis
        self.tx = optax.adam(learning_rate)
        self._step = None
        self._logits_fn = None

    # -- state ------------------------------------------------------------
    def init_state(self, feature_dim: int, seed: int = 0):
        params = init_pipeline_params(
            jax.random.PRNGKey(seed), self.cfg, feature_dim
        )
        stage_sharding = NamedSharding(self.mesh, P(self.axis))
        params = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, stage_sharding), params
        )
        opt_state = self.tx.init(params)
        # place moment tables exactly like the params they track
        opt_state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, stage_sharding)
            if hasattr(x, "ndim") and x.ndim >= 1
            and x.shape[:1] == (self.cfg.stages,) else x,
            opt_state,
        )
        return {"params": params, "opt_state": opt_state, "step": jnp.zeros((), jnp.int32)}

    # -- batch prep --------------------------------------------------------
    def prepare_batch(self, batch) -> Tuple[jnp.ndarray, ...]:
        """Split a Batch (from Batcher, dense-adj path) into microbatch
        stacks: x [M,mb,N,F], adj [M,mb,C,N,N], node_mask [M,mb,N],
        labels [M,mb,L], pad_mask [M,mb]."""
        M = self.cfg.microbatches
        g = batch.graph
        # the pipeline needs the dense adjacency UNCONDITIONALLY —
        # with_dense_adj() is a no-op when set_dense_path(False) is active
        # (spmm_backend: xla/pallas configs), so materialise directly
        dense = g.dense_adj if g.dense_adj is not None else g.dense_adjacency()
        x = g.nodes_batched()
        adj = jnp.transpose(dense, (1, 0, 2, 3))  # [C,B,N,N] → [B,C,N,N]
        nmask = g.mask_batched()
        return (
            _to_microbatches(jnp.asarray(x), M),
            _to_microbatches(jnp.asarray(adj), M),
            _to_microbatches(jnp.asarray(nmask), M),
            _to_microbatches(jnp.asarray(batch.labels), M),
            _to_microbatches(jnp.asarray(batch.pad_mask), M),
        )

    # -- compiled step ------------------------------------------------------
    def _make_step(self):
        cfg, axis, tx = self.cfg, self.axis, self.tx

        forward = shard_map(
            partial(pipeline_logits, cfg=cfg, axis=axis),
            mesh=self.mesh,
            in_specs=(P(axis), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )

        def loss_fn(params, x, adj, nmask, labels, pad):
            logits = forward(params, x, adj, nmask)  # [M, mb, L] f32
            logp = jax.nn.log_softmax(logits, axis=-1)
            cost = -jnp.sum(labels * logp, axis=-1) * pad
            correct = pad * (
                jnp.argmax(logits, -1) == jnp.argmax(labels, -1)
            ).astype(jnp.float32)
            metrics = {"correct_count": jnp.sum(correct),
                       "count": jnp.sum(pad)}
            return jnp.sum(cost) / jnp.maximum(jnp.sum(pad), 1.0), (
                jnp.sum(cost), metrics)

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, x, adj, nmask, labels, pad):
            grads, (cost_sum, metrics) = jax.grad(loss_fn, has_aux=True)(
                state["params"], x, adj, nmask, labels, pad
            )
            updates, new_opt = tx.update(grads, state["opt_state"],
                                         state["params"])
            new_params = optax.apply_updates(state["params"], updates)
            return (
                {"params": new_params, "opt_state": new_opt,
                 "step": state["step"] + 1},
                cost_sum, metrics,
            )

        return step

    def train_step(self, state, batch):
        if self._step is None:
            self._step = self._make_step()
        return self._step(state, *self.prepare_batch(batch))

    def logits(self, state, batch):
        """Full-batch inference through the pipeline (compiled once — a
        fresh jit per call would retrace the whole pipeline program)."""
        cfg, axis = self.cfg, self.axis
        if self._logits_fn is None:
            forward = shard_map(
                partial(pipeline_logits, cfg=cfg, axis=axis),
                mesh=self.mesh,
                in_specs=(P(axis), P(), P(), P()),
                out_specs=P(),
                check_vma=False,
            )
            self._logits_fn = jax.jit(forward)
        x, adj, nmask, labels, pad = self.prepare_batch(batch)
        out = self._logits_fn(state["params"], x, adj, nmask)
        return out.reshape(-1, cfg.label_dim)


# -- single-device reference (for gradient-exactness tests) -----------------

def sequential_logits(params, x, adj, node_mask, *, cfg: PPConfig):
    """The SAME network run unpipelined on one device: stage 0's embed, all
    S×k conv layers in order, last stage's head.  ``params`` is the stacked
    tree from :func:`init_pipeline_params` (unsharded)."""
    S = cfg.stages
    z = x @ params["embed_w"][0] + params["embed_b"][0]
    for s in range(S):
        p_local = jax.tree_util.tree_map(lambda a: a[s], params)
        z = _stage_apply(p_local, z, adj)
    pooled = jnp.sum(z * node_mask[..., None], axis=1)
    return pooled @ params["head_w"][S - 1] + params["head_b"][S - 1]
