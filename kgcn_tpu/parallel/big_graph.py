"""Sharded whole-graph KG training — the big-graph scaling path.

The reference trains knowledge graphs batch=1 on ONE device with the whole
node-embedding table and adjacency resident (sample_kg/network_prediction,
kgcn/core.py:219-222 label batching).  That caps the graph at one chip's HBM.
Here the single giant graph is partitioned across the mesh (SURVEY.md §2.11
"graph/edge partitioning" — the GNN analogue of sequence/context parallelism):

* the node-embedding table lives SHARDED, ``[V/D, dim]`` rows per device —
  the model no longer has to fit one chip;
* GCN/GIN refinement over the relation-typed adjacency runs through the
  edge-partitioned ring SpMM (``parallel/edge_partition.py``): receiver-block
  local scatters, sender blocks rotated by ``ppermute`` so the collective
  overlaps the per-offset gather/segment-sum;
* DistMult triple scoring shards the label list over devices; each device
  ``all_gather``s the final (small, [V, dim]) embeddings once per step and
  scores its triple shard; the all_gather's transpose (a reduce_scatter)
  routes score gradients back to the owning embedding shards;
* replicated encoder/scorer parameters get psum'd gradients, sharded
  embedding rows keep theirs local — one SPMD step, Adam applied under the
  same jit so the sharded moments never leave their devices.

Loss/scoring semantics are the reference's margin-logistic preference loss
verbatim (sample_kg/network_prediction/model_py/distmult.py:52-56); parity
with the single-device ``KGLinkPredictor`` is pinned by
tests/test_big_graph.py (same parameters → same loss, gradients, and update).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kgcn_tpu.nn.layers import glorot_uniform_nd, per_channel_glorot
from kgcn_tpu.ops import segment
from kgcn_tpu.parallel.edge_partition import partition_edges


class BigGraphKGTrainer:
    """Edge-partitioned trainer for one giant multi-relation graph.

    Parameters
    ----------
    num_nodes: true entity count V (padded internally to a multiple of D).
    channels:  relation/adjacency channel count C.
    embedding_dim: entity embedding width.
    encoder: 'embedding' (pure DistMult), 'gcn' (tanh∘GraphConv layers) or
        'gin' (tanh∘GINAggregate layers) — the reference's model_py variants.
    num_layers: conv layers for gcn/gin encoders (reference uses 2).
    gamma: margin of the preference loss.
    strategy: 'ring' (O(V/D·F) memory) or 'allgather' halo exchange.
    """

    def __init__(self, *, num_nodes: int, channels: int, embedding_dim: int,
                 mesh: Mesh, axis: str = "data", encoder: str = "gcn",
                 num_layers: int = 2, gamma: float = 0.1,
                 learning_rate: float = 0.01, strategy: str = "ring",
                 node_mask: Optional[np.ndarray] = None,
                 tx: Optional[optax.GradientTransformation] = None,
                 tx_shard_safe: bool = True):
        if encoder not in ("embedding", "gcn", "gin"):
            raise ValueError(f"unknown encoder {encoder!r}")
        if strategy not in ("ring", "allgather"):
            # a typo would otherwise silently select allgather — the
            # O(V·F)-per-device path this module exists to avoid
            raise ValueError(f"unknown halo strategy {strategy!r}")
        self.mesh, self.axis = mesh, axis
        self.D = mesh.shape[axis]
        self.num_nodes = int(num_nodes)
        self.v_pad = ((self.num_nodes + self.D - 1) // self.D) * self.D
        self.channels = int(channels)
        self.dim = int(embedding_dim)
        self.encoder = encoder
        self.num_layers = int(num_layers) if encoder != "embedding" else 0
        self.gamma = float(gamma)
        self.strategy = strategy
        self.tx = tx if tx is not None else optax.adam(learning_rate)
        # whether tx is elementwise per-leaf (adam/sgd/...) and therefore
        # correct to apply INSIDE shard_map on per-device shards; cross-leaf
        # norm transforms (global-norm clip, lamb) are NOT — their norms
        # would be computed per shard (fit_resident falls back to fit then)
        self.tx_shard_safe = bool(tx_shard_safe)
        mask = np.ones(self.v_pad, np.float32)
        if node_mask is not None:
            # node_mask may be longer than v_pad (the Batcher lane-aligns its
            # node padding to multiples of 128) — trim to the rows we keep
            node_mask = np.asarray(node_mask, np.float32)
            n = min(len(node_mask), self.v_pad)
            mask[:n] = node_mask[:n]
        mask[self.num_nodes :] = 0.0
        self._mask = jax.device_put(
            jnp.asarray(mask), NamedSharding(mesh, P(axis))
        )
        self._edges = None
        self._step_fn = None
        self._eval_fn = None
        self._embed_fn = None
        self._grads_fn = None

    # ------------------------------------------------------------------ #
    # graph partitioning
    # ------------------------------------------------------------------ #
    def partition_graph(self, senders, receivers, weights) -> None:
        """Partition the [C, E] COO relation-typed adjacency for the ring.

        Per channel, edges are grouped by receiver block and sender-block
        offset (``partition_edges``); channels share one padded edge budget so
        the stacks are rectangular ``[C, D, D, E]``.
        """
        senders = np.asarray(senders)
        if senders.ndim == 1:  # single channel convenience
            senders = senders[None]
            receivers = np.asarray(receivers)[None]
            weights = np.asarray(weights)[None]
        C = senders.shape[0]
        parts = [
            partition_edges(
                senders[c], receivers[c], weights[c], self.v_pad, self.D
            )
            for c in range(C)
        ]
        E = max(p.senders_local.shape[-1] for p in parts)

        def padded(arrs, dtype):
            out = np.zeros((C, self.D, self.D, E), dtype)
            for c, a in enumerate(arrs):
                out[c, :, :, : a.shape[-1]] = a
            return out

        sl = padded([p.senders_local for p in parts], np.int32)
        rl = padded([p.receivers_local for p in parts], np.int32)
        wl = padded([p.weights for p in parts], np.float32)
        shard = NamedSharding(self.mesh, P(None, self.axis))
        self._edges = tuple(
            jax.device_put(jnp.asarray(a), shard) for a in (sl, rl, wl)
        )
        # the compiled fns close over the edge arrays as constants — a new
        # partition must invalidate them or steps would use the stale graph
        self._step_fn = self._eval_fn = self._embed_fn = None
        self._grads_fn = None

    # ------------------------------------------------------------------ #
    # parameters
    # ------------------------------------------------------------------ #
    def init_params(self, seed: int = 0) -> dict:
        """{'embed': [V_pad, dim] (sharded rows), 'theta': replicated}."""
        k_embed, k_dm, *k_layers = jax.random.split(
            jax.random.PRNGKey(seed), 2 + max(self.num_layers, 1)
        )
        embed = jax.random.normal(k_embed, (self.v_pad, self.dim)) * 0.05
        embed = jax.device_put(embed, NamedSharding(self.mesh, P(self.axis)))
        theta = {
            "distmult": glorot_uniform_nd()(k_dm, (self.channels, self.dim))
        }
        for i in range(self.num_layers):
            if self.encoder == "gcn":
                theta[f"w{i}"] = per_channel_glorot()(
                    k_layers[i], (self.channels, self.dim, self.dim)
                )
                theta[f"b{i}"] = jnp.zeros((self.channels, self.dim))
            else:  # gin
                theta[f"eps{i}"] = jnp.zeros((self.channels,))
        rep = NamedSharding(self.mesh, P())
        theta = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), theta
        )
        return {"embed": embed, "theta": theta}

    def from_flax_variables(self, variables: dict) -> dict:
        """Import a single-device ``KGLinkPredictor`` parameter tree (for
        parity tests and for scaling up a model trained small)."""
        if self.num_layers not in (0, 2):
            # a 1-layer trainer would silently import conv1 only and drop
            # conv2's weights
            raise ValueError(
                f"KGLinkPredictor has exactly 2 conv layers; cannot import "
                f"into a {self.num_layers}-layer trainer"
            )
        p = variables["params"]
        embed = np.zeros((self.v_pad, self.dim), np.float32)
        src = np.asarray(p["embed"]["embedding"])
        embed[: src.shape[0]] = src
        theta = {"distmult": jnp.asarray(p["distmult"]["kernel"])}
        for i in range(self.num_layers):
            lp = p[f"conv{i + 1}"]
            if self.encoder == "gcn":
                theta[f"w{i}"] = jnp.asarray(lp["kernel"])
                theta[f"b{i}"] = jnp.asarray(lp["bias"])
            else:
                theta[f"eps{i}"] = jnp.asarray(lp["epsilon"])
        embed = jax.device_put(
            jnp.asarray(embed), NamedSharding(self.mesh, P(self.axis))
        )
        rep = NamedSharding(self.mesh, P())
        theta = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), theta)
        return {"embed": embed, "theta": theta}

    def to_flax_variables(self, state: dict) -> dict:
        """Export back to the single-device ``KGLinkPredictor`` tree (padding
        rows stripped) — checkpoints stay interchangeable with the
        single-device engine."""
        params = jax.device_get(state["params"])
        theta = params["theta"]
        p = {
            "embed": {"embedding": np.asarray(params["embed"])[: self.num_nodes]},
            "distmult": {"kernel": np.asarray(theta["distmult"])},
        }
        for i in range(self.num_layers):
            if self.encoder == "gcn":
                p[f"conv{i + 1}"] = {
                    "kernel": np.asarray(theta[f"w{i}"]),
                    "bias": np.asarray(theta[f"b{i}"]),
                }
            else:
                p[f"conv{i + 1}"] = {"epsilon": np.asarray(theta[f"eps{i}"])}
        return {"params": p}

    def init_state(self, seed: int = 0, params: Optional[dict] = None) -> dict:
        params = params if params is not None else self.init_params(seed)
        opt_state = jax.jit(self.tx.init)(params)
        # place every optimizer leaf explicitly: embed-shaped moment tables
        # row-sharded over the mesh (jit(tx.init) may hand them back
        # REPLICATED — that materialises [V, dim] moments on every device
        # and makes the train step's first output mismatch its input avals,
        # forcing a second full compilation), scalars/theta replicated
        opt_state = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s))
            if isinstance(x, jax.Array)
            else x,
            opt_state,
            self._opt_specs(opt_state),
        )
        rep = NamedSharding(self.mesh, P())
        # the step counter must enter the jitted step exactly as the step
        # emits it (strong-typed replicated i32 scalar) — a Python int here
        # causes a silent SECOND compilation of the train step on call 1
        # (10s+ through this environment's remote-compile tunnel)
        step0 = jax.device_put(jnp.asarray(0, jnp.int32), rep)
        return {"params": params, "opt_state": opt_state, "step": step0}

    # ------------------------------------------------------------------ #
    # forward pieces (run INSIDE shard_map, on one device's block)
    # ------------------------------------------------------------------ #
    def _encode_local(self, embed_blk, theta, mask_blk, sl, rl, wl):
        from kgcn_tpu.parallel.edge_partition import (
            allgather_spmm_local_channels,
            ring_spmm_local_channels,
        )

        # channel-STACKED halo exchange: one collective per hop for all C
        # relation channels (per-channel loops would issue C·(D−1)
        # ppermutes per layer; GIN additionally shares one x rotation)
        local = (
            ring_spmm_local_channels if self.strategy == "ring"
            else allgather_spmm_local_channels
        )
        x = embed_blk * mask_blk[:, None]
        for i in range(self.num_layers):
            if self.encoder == "gcn":
                # Σ_c A_c (X W_c + b_c)  (kgcn/layers.py:32-119 semantics)
                hw = (
                    jnp.einsum("vf,cfo->cvo", x, theta[f"w{i}"])
                    + theta[f"b{i}"][:, None, :]
                )
                agg = local(hw, sl, rl, wl, self.axis)
            else:  # gin: Σ_c (ε_c X + A_c X)  (kgcn/layers.py:400-475)
                eps = theta[f"eps{i}"]
                agg = jnp.sum(eps) * x + local(x, sl, rl, wl, self.axis)
            x = jnp.tanh(agg)
        return x

    def _score(self, z_full, dm, triples):
        h, r, t = triples[:, 0], triples[:, 1], triples[:, 2]
        # the relation gather goes through a one-hot MXU matmul: its
        # backward is a [C, L]·[L, F] matmul instead of an L-row
        # scatter-add colliding into C rows (ops/segment.embed_rows)
        return jnp.sum(z_full[h] * z_full[t] * segment.embed_rows(dm, r), axis=-1)

    def _local_loss(self, embed_blk, theta, mask_blk, sl, rl, wl, ll, lv):
        z_local = self._encode_local(embed_blk, theta, mask_blk, sl, rl, wl)
        z_full = jax.lax.all_gather(z_local, self.axis, tiled=True)
        s1 = self._score(z_full, theta["distmult"], ll[:, :3])
        s2 = self._score(z_full, theta["distmult"], ll[:, 3:])
        # reference loss (distmult.py:52-56) in its gradient-stable softplus
        # form (see models/kg.py — the literal version NaNs at score ≳ 88)
        score = s2 - s1 + self.gamma
        cost = jax.nn.softplus(score) * lv
        correct = jnp.sum((s1 > s2).astype(jnp.float32) * lv)
        return jnp.sum(cost), (correct, jnp.sum(lv))

    # ------------------------------------------------------------------ #
    # compiled step / eval
    # ------------------------------------------------------------------ #
    def _sharded_grads(self):
        axis = self.axis

        def local_grads(embed, theta, mask, sl, rl, wl, ll, lv):
            sl, rl, wl = sl[:, 0], rl[:, 0], wl[:, 0]  # [C, D, E]
            # ll/lv arrive already sliced to this device's triple shard
            grad_fn = jax.value_and_grad(
                self._local_loss, argnums=(0, 1), has_aux=True
            )
            (loss, (correct, count)), (g_embed, g_theta) = grad_fn(
                embed, theta, mask, sl, rl, wl, ll, lv
            )
            # replicated params accumulate every device's contribution;
            # sharded embedding rows already received theirs through the
            # all_gather/ppermute transposes.
            g_theta = jax.lax.psum(g_theta, axis)
            stats = jax.lax.psum(
                jnp.stack([loss, correct, count]), axis
            )
            return g_embed, g_theta, stats

        return shard_map(
            local_grads,
            mesh=self.mesh,
            in_specs=(P(axis), P(), P(axis), P(None, axis), P(None, axis),
                      P(None, axis), P(axis), P(axis)),
            out_specs=(P(axis), P(), P()),
            check_vma=False,
        )

    def _constrain(self, tree):
        """Pin embed-shaped leaves to the row sharding, the rest replicated.

        Without this, GSPMD re-shards Adam's embedding-moment tables to
        replicated on the step OUTPUT: on a real mesh that materialises the
        full [V, dim] moments on every device (defeating the sharded-table
        design), and the input/output sharding mismatch forces a second
        full compilation of the step on its second call.
        """
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(
                x,
                NamedSharding(
                    self.mesh,
                    P(self.axis)
                    if getattr(x, "ndim", 0) >= 1 and x.shape[0] == self.v_pad
                    else P(),
                ),
            ),
            tree,
        )

    def _build_step(self):
        sharded = self._sharded_grads()
        tx = self.tx

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, ll, lv, inv_n):
            g_embed, g_theta, stats = sharded(
                state["params"]["embed"], state["params"]["theta"],
                self._mask, *self._edges, ll, lv,
            )
            grads = jax.tree_util.tree_map(
                lambda g: g * inv_n, {"embed": g_embed, "theta": g_theta}
            )
            updates, opt_state = tx.update(
                grads, state["opt_state"], state["params"]
            )
            params = optax.apply_updates(state["params"], updates)
            return (
                {"params": self._constrain(params),
                 "opt_state": self._constrain(opt_state),
                 "step": state["step"] + 1},
                stats,
            )

        return step

    def gradients(self, state: dict, label_list: np.ndarray):
        """Mean-loss gradients {'embed', 'theta'} — the exact tensors the
        optimizer consumes (parity/debugging hook)."""
        assert self._edges is not None, "call partition_graph first"
        ll, lv, n = self._shard_labels(label_list)
        if getattr(self, "_grads_fn", None) is None:
            self._grads_fn = jax.jit(self._sharded_grads())
        g_embed, g_theta, _ = self._grads_fn(
            state["params"]["embed"], state["params"]["theta"], self._mask,
            *self._edges, ll, lv,
        )
        inv_n = 1.0 / max(n, 1)
        return jax.tree_util.tree_map(
            lambda g: np.asarray(g) * inv_n,
            {"embed": g_embed, "theta": g_theta},
        )

    def _build_eval(self):
        axis = self.axis

        def local_eval(embed, theta, mask, sl, rl, wl, ll, lv):
            sl, rl, wl = sl[:, 0], rl[:, 0], wl[:, 0]
            loss, (correct, count) = self._local_loss(
                embed, theta, mask, sl, rl, wl, ll, lv
            )
            return jax.lax.psum(jnp.stack([loss, correct, count]), axis)

        sharded = shard_map(
            local_eval,
            mesh=self.mesh,
            in_specs=(P(axis), P(), P(axis), P(None, axis), P(None, axis),
                      P(None, axis), P(axis), P(axis)),
            out_specs=P(),
            check_vma=False,
        )

        @jax.jit
        def ev(params, ll, lv):
            return sharded(
                params["embed"], params["theta"], self._mask, *self._edges,
                ll, lv,
            )

        return ev

    def _shard_labels(self, label_list: np.ndarray, width: int = 6):
        """Pad a [L, width] triple list to D equal shards →
        ([L_pad, width] sharded, [L_pad] validity sharded, L)."""
        ll = np.asarray(label_list, np.int32)[:, :width]
        n = len(ll)
        per = ((n + self.D - 1) // self.D + 0) if n else 1
        l_pad = per * self.D
        out = np.zeros((l_pad, width), np.int32)
        out[:n] = ll
        lv = (np.arange(l_pad) < n).astype(np.float32)
        shard = NamedSharding(self.mesh, P(self.axis))
        return (
            jax.device_put(jnp.asarray(out), shard),
            jax.device_put(jnp.asarray(lv), shard),
            n,
        )

    # ------------------------------------------------------------------ #
    # public API
    # ------------------------------------------------------------------ #
    def train_step(self, state: dict, label_list: np.ndarray):
        """One SPMD step on a [L, 6] (h,r,t,h',r',t') triple list.

        Returns (state, {'cost': mean loss, 'accuracy': rank accuracy}).
        """
        assert self._edges is not None, "call partition_graph first"
        ll, lv, n = self._shard_labels(label_list)
        if self._step_fn is None:
            # one jitted program; jit's cache covers label-budget variation
            self._step_fn = self._build_step()
        state, stats = self._step_fn(
            state, ll, lv, jnp.float32(1.0 / max(n, 1))
        )
        loss, correct, count = np.asarray(stats)
        return state, {
            "cost": float(loss) / max(n, 1),
            "accuracy": float(correct) / max(count, 1.0),
        }

    def evaluate(self, state: dict, label_list: np.ndarray) -> dict:
        assert self._edges is not None, "call partition_graph first"
        ll, lv, n = self._shard_labels(label_list)
        if self._eval_fn is None:
            self._eval_fn = self._build_eval()
        loss, correct, count = np.asarray(
            self._eval_fn(state["params"], ll, lv)
        )
        return {
            "cost": float(loss) / max(n, 1),
            "accuracy": float(correct) / max(count, 1.0),
            "num": n,
        }

    def node_embeddings(self, state: dict) -> np.ndarray:
        """Gathered [V, dim] final embeddings (for MRR / hits@k / export)."""
        assert self._edges is not None, "call partition_graph first"
        axis = self.axis

        if self._embed_fn is None:
            def local(embed, theta, mask, sl, rl, wl):
                z = self._encode_local(
                    embed, theta, mask, sl[:, 0], rl[:, 0], wl[:, 0]
                )
                return z

            sharded = shard_map(
                local,
                mesh=self.mesh,
                in_specs=(P(axis), P(), P(axis), P(None, axis),
                          P(None, axis), P(None, axis)),
                out_specs=P(axis),
                check_vma=False,
            )
            self._embed_fn = jax.jit(
                lambda params: sharded(
                    params["embed"], params["theta"], self._mask, *self._edges
                )
            )
        z = np.asarray(self._embed_fn(state["params"]))
        return z[: self.num_nodes]

    # ------------------------------------------------------------------ #
    # fully device-resident training: negatives sampled in-kernel, the
    # whole multi-epoch run is ONE dispatch (lax.scan inside shard_map)
    # ------------------------------------------------------------------ #
    def _device_negatives(self, key, ll3, pair_mode: str):
        """Corrupt positives on device (reference semantics:
        kgcn/feed.py:33-86 — one random side for 'both')."""
        L = ll3.shape[0]
        k_ent, k_side = jax.random.split(key)
        neg = jax.random.randint(k_ent, (L,), 0, self.num_nodes)
        h, r, t = ll3[:, 0], ll3[:, 1], ll3[:, 2]
        if pair_mode == "right":
            h_n, t_n = h, neg
        elif pair_mode == "left":
            h_n, t_n = neg, t
        else:  # both: corrupt one random side per triple
            side = jax.random.bernoulli(k_side, 0.5, (L,))
            h_n = jnp.where(side, h, neg)
            t_n = jnp.where(side, neg, t)
        return jnp.stack([h, r, t, h_n, r, t_n], axis=1)

    def _opt_specs(self, opt_state):
        """PartitionSpec tree for an optax state: embed-shaped leaves are
        row-sharded, everything else replicated."""
        return jax.tree_util.tree_map(
            lambda x: P(self.axis)
            if getattr(x, "ndim", 0) >= 1 and x.shape[0] == self.v_pad
            else P(),
            opt_state,
        )

    def fit_resident(self, state: dict, label_list: np.ndarray, *,
                     epochs: int, pair_mode: str = "both", seed: int = 0):
        """The entire training run as ONE jit dispatch: positives live
        sharded on device, each scanned epoch draws fresh in-kernel
        negatives (per-device folded RNG), takes one Adam step, and psums
        the stats — zero host↔device traffic until the final history
        readback.  Returns (state, history) like ``fit``."""
        assert self._edges is not None, "call partition_graph first"
        if not self.tx_shard_safe:
            # cross-leaf optimizer transforms (global-norm clip, lamb) need
            # GLOBAL norms; inside shard_map each device would compute them
            # from its own shard, mis-clipping and silently de-replicating
            # theta.  The per-step path applies tx OUTSIDE shard_map on
            # global arrays (GSPMD handles cross-shard norms) — route there.
            print("[big-graph] optimizer needs global norms — using the "
                  "per-step path instead of the one-dispatch resident run")
            return self.fit(state, label_list, epochs=epochs,
                            pair_mode=pair_mode, seed=seed)
        ll3, lvd, n = self._shard_labels(label_list, width=3)

        axis, tx, mode = self.axis, self.tx, pair_mode
        inv_n = 1.0 / max(n, 1)
        opt_specs = self._opt_specs(state["opt_state"])

        def local_fit(embed, theta, opt_state, mask, sl, rl, wl,
                      ll3_loc, lv_loc, keys):
            sl, rl, wl = sl[:, 0], rl[:, 0], wl[:, 0]
            d = jax.lax.axis_index(axis)

            def body(carry, key):
                params, opt = carry
                ll6 = self._device_negatives(
                    jax.random.fold_in(key, d), ll3_loc, mode
                )
                grad_fn = jax.value_and_grad(
                    self._local_loss, argnums=(0, 1), has_aux=True
                )
                (loss, (correct, count)), (g_e, g_t) = grad_fn(
                    params["embed"], params["theta"], mask, sl, rl, wl,
                    ll6, lv_loc,
                )
                g_t = jax.lax.psum(g_t, axis)
                grads = jax.tree_util.tree_map(
                    lambda g: g * inv_n, {"embed": g_e, "theta": g_t}
                )
                updates, opt = tx.update(grads, opt, params)
                params = optax.apply_updates(params, updates)
                stats = jax.lax.psum(jnp.stack([loss, correct, count]), axis)
                return (params, opt), stats

            (params, opt_state), stats = jax.lax.scan(
                body, ({"embed": embed, "theta": theta}, opt_state), keys
            )
            return params["embed"], params["theta"], opt_state, stats

        sharded = shard_map(
            local_fit,
            mesh=self.mesh,
            in_specs=(P(axis), P(), opt_specs, P(axis), P(None, axis),
                      P(None, axis), P(None, axis), P(axis), P(axis), P()),
            out_specs=(P(axis), P(), opt_specs, P()),
            check_vma=False,
        )

        # donate params+opt_state: the whole-run dispatch would otherwise
        # hold input AND output copies of the [V, dim] table and both Adam
        # moment tables live simultaneously (2× peak HBM)
        @partial(jax.jit, donate_argnums=(0, 1))
        def run(params, opt_state, keys):
            return sharded(
                params["embed"], params["theta"], opt_state, self._mask,
                *self._edges, ll3, lvd, keys,
            )

        keys = jax.random.split(jax.random.PRNGKey(seed), epochs)
        embed, theta, opt_state, stats = run(
            state["params"], state["opt_state"], keys
        )
        stats = np.asarray(stats)  # the ONE readback
        history = [
            {"epoch": e,
             "train_cost": float(stats[e, 0]) * inv_n,
             "train_accuracy": float(stats[e, 1]) / max(stats[e, 2], 1.0)}
            for e in range(epochs)
        ]
        step_out = jax.device_put(
            jnp.asarray(int(state["step"]) + epochs, jnp.int32),
            NamedSharding(self.mesh, P()),
        )
        return (
            {"params": {"embed": embed, "theta": theta},
             "opt_state": opt_state, "step": step_out},
            history,
        )

    def save(self, path: str, state: dict) -> str:
        """Sharded orbax checkpoint — the embedding table and its Adam
        moments are written shard-by-shard, never gathered to one host
        (msgpack/to_flax_variables would materialise the full [V, dim]
        table; at real KG scale that is exactly what must not happen)."""
        from kgcn_tpu.runtime import checkpoint as ckpt

        return ckpt.save_sharded(
            path,
            {"params": state["params"], "opt_state": state["opt_state"],
             "step": np.asarray(state["step"], np.int32)[None]},
        )

    def restore(self, path: str, state: dict) -> dict:
        """Restore into the current mesh's shardings (target = ``state``)."""
        from kgcn_tpu.runtime import checkpoint as ckpt

        tree = ckpt.load_sharded(
            path,
            {"params": state["params"], "opt_state": state["opt_state"],
             "step": np.asarray(state["step"], np.int32)[None]},
        )
        step0 = jax.device_put(
            jnp.asarray(int(np.asarray(tree["step"])[0]), jnp.int32),
            NamedSharding(self.mesh, P()),
        )
        return {"params": tree["params"], "opt_state": tree["opt_state"],
                "step": step0}

    def fit(self, state: dict, label_list: np.ndarray, *, epochs: int,
            pair_mode: str = "both", seed: int = 0,
            validation_list: Optional[np.ndarray] = None,
            label_batch_size: Optional[int] = None,
            log_every: int = 0):
        """Epoch loop with per-epoch negative resampling
        (reference: kgcn/feed.py:33-86 preference pairs).

        ``label_batch_size``: optimizer steps per epoch operate on slices of
        this many triples (wrap-padded last slice, like the single-device
        KGBatcher — reference kgcn/core.py:219-222); default one step on the
        whole list."""
        from kgcn_tpu.models.kg import sample_negatives

        rng = np.random.RandomState(seed)
        all_nodes = np.arange(self.num_nodes, dtype=np.int32)
        ll = np.asarray(label_list, np.int32)
        if ll.shape[1] == 3:
            ll = np.concatenate([ll, ll], axis=1)
        if validation_list is not None:
            # same 3-column convenience as the train list — _shard_labels
            # consumes [L, 6]
            validation_list = np.asarray(validation_list, np.int32)
            if validation_list.shape[1] == 3:
                validation_list = np.concatenate(
                    [validation_list, validation_list], axis=1
                )
        L = int(label_batch_size) if label_batch_size else len(ll)
        history = []
        for epoch in range(epochs):
            ep = sample_negatives(ll, all_nodes, rng, pair_mode)
            order = np.arange(len(ep))
            rng.shuffle(order)
            costs, corrects, counts = [], [], []
            for start in range(0, len(ep), L):
                idx = order[start : start + L]
                if len(idx) < L:  # cyclic wrap-pad to keep one compiled shape
                    idx = np.resize(idx, L)
                state, tr = self.train_step(state, ep[idx])
                costs.append(tr["cost"])
                corrects.append(tr["accuracy"] * L)
                counts.append(L)
            tr = {
                "cost": float(np.mean(costs)),
                "accuracy": float(np.sum(corrects) / np.sum(counts)),
            }
            rec = {"epoch": epoch, **{f"train_{k}": v for k, v in tr.items()}}
            if validation_list is not None:
                va = self.evaluate(state, validation_list)
                rec.update({f"valid_{k}": v for k, v in va.items() if k != "num"})
            history.append(rec)
            if log_every and epoch % log_every == 0:
                print(
                    f"[big_graph] epoch {epoch}: "
                    + " ".join(f"{k}={v:.4f}" for k, v in rec.items() if k != "epoch")
                )
        return state, history


def _make_tx(config):
    from kgcn_tpu.runtime.optim import make_optimizer

    return make_optimizer({"learning_rate": 0.01, **config})


def _tx_shard_safe(config) -> bool:
    """True when the configured optimizer chain is elementwise per-leaf and
    therefore valid to apply inside shard_map on per-device shards (adam,
    sgd, ... — anything without cross-leaf norms)."""
    if config.get("gradient_clip"):
        return False  # clip_by_global_norm needs the GLOBAL gradient norm
    return str(config.get("optimizer", "adam")).lower() != "lamb"


def from_kg_dataset(ds, info, config, mesh, axis: str = "data"):
    """Build a BigGraphKGTrainer from a loaded KG dataset (the same
    ``ds/info`` the single-device ``KGBatcher`` consumes).

    Reads the [C, E] COO adjacency straight off ``ds.adjs[0]`` — building a
    Batcher here would run the native packer + ELL precompute over a graph
    explicitly too big for one chip, then upload it whole, only to pull it
    back to host for partitioning."""
    adj = ds.adjs[0]  # per-channel (row, col, val) triples, whole-graph mode
    C = len(adj)
    E = max((len(ch[2]) for ch in adj), default=1) or 1
    senders = np.zeros((C, E), np.int64)
    receivers = np.zeros((C, E), np.int64)
    weights = np.zeros((C, E), np.float32)
    for c, (row, col, val) in enumerate(adj):
        k = len(val)
        # GraphBatch convention: receiver = row, sender = col
        receivers[c, :k] = row
        senders[c, :k] = col
        weights[c, :k] = val

    trainer = BigGraphKGTrainer(
        num_nodes=int(info.all_node_num),
        channels=int(info.adj_channel_num),
        embedding_dim=int(config.get("embedding_dim", 10)),
        mesh=mesh,
        axis=axis,
        encoder=config.get("kg_encoder", "embedding"),
        num_layers=int(config.get("kg_layers", 2)),
        gamma=float(config.get("kg_gamma", 0.1)),
        learning_rate=float(config.get("learning_rate", 0.01)),
        strategy=config.get("halo_strategy", "ring"),
        tx=_make_tx(config),
        tx_shard_safe=_tx_shard_safe(config),
    )
    trainer.partition_graph(senders, receivers, weights)
    return trainer
