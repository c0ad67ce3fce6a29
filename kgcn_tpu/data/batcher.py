"""Mini-batch assembly: Dataset → fixed-shape device batches.

The reference rebuilt a Python feed_dict of per-graph SparseTensorValues every
step (kgcn/feed.py:91-234) — the known host-side bottleneck.  Here batch
assembly is a NumPy concatenation into ONE statically-shaped pytree; every
batch of a dataset shares the same shapes (node padding ``B*N``, lane-rounded
edge budget), so the jitted train step compiles exactly once.

The last partial batch is padded with empty graphs and reported via
``pad_mask`` (the reference's ``mask`` vector, kgcn/feed.py:148-151).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Iterator, Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from kgcn_tpu.data.dataset import Dataset, DatasetInfo
from kgcn_tpu.graph.batch import GraphBatch, batch_graphs, pad_edge_budget


@struct.dataclass
class Batch:
    """One device batch: the graph plus aligned task tensors."""

    graph: GraphBatch
    labels: Optional[jnp.ndarray] = None
    mask_label: Optional[jnp.ndarray] = None
    node_label: Optional[jnp.ndarray] = None
    mask_node_label: Optional[jnp.ndarray] = None
    sequences: Optional[jnp.ndarray] = None
    sequences_len: Optional[jnp.ndarray] = None
    vector_modal: Optional[tuple] = None
    pad_mask: Optional[jnp.ndarray] = None  # [B] 1.0 = real example
    rng_normal: Optional[jnp.ndarray] = None  # ε for VAE reparameterisation
    label_list: Optional[jnp.ndarray] = None  # [B, L, 6] KG preference triples
    label_valid: Optional[jnp.ndarray] = None  # [B, L] 1.0 = real pair (0 = wrap pad)

    @property
    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.pad_mask)

    def cast_compute(self, dtype) -> "Batch":
        """Cast compute-path floats (graph payload, vector modals, VAE ε) to
        ``dtype`` for mixed-precision execution.  Labels, masks, and integer
        id tensors stay as-is — losses and metrics run in float32."""
        vm = self.vector_modal
        if vm is not None:
            vm = tuple(v.astype(dtype) for v in vm)
        return self.replace(
            graph=self.graph.astype(dtype),
            vector_modal=vm,
            rng_normal=(
                None if self.rng_normal is None else self.rng_normal.astype(dtype)
            ),
        )


def epoch_permutation(n: int, seed: int, epoch: Optional[int] = None,
                      rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    """THE permutation law, shared by every batcher (streaming, resident,
    sharded) so their data orders are interchangeable: with ``epoch`` the
    order is a pure function of (seed, epoch) — deterministic resume; with
    only ``rng`` it advances the caller's stateful stream; with neither it
    is the identity (shuffle off)."""
    idx = np.arange(n)
    if epoch is not None:
        np.random.RandomState((seed * 100003 + epoch) % (2**31)).shuffle(idx)
    elif rng is not None:
        rng.shuffle(idx)
    return idx


class Batcher:
    """Yields fixed-shape ``Batch`` pytrees from a host Dataset."""

    def __init__(
        self,
        ds: Dataset,
        info: DatasetInfo,
        batch_size: int,
        *,
        edge_budget: Optional[int] = None,
        epsilon_dim: int = 0,
        seed: int = 0,
    ):
        self.ds = ds
        self.info = info
        self.batch_size = int(batch_size)
        self.max_nodes = int(ds.max_node_num or info.graph_node_num)
        # Lane-align the node padding: an unaligned N makes the dense-MXU
        # aggregation path collapse (measured 739 ms vs 1.0 ms per train step
        # at N=203 vs N=256 on the reaction-scale workload).  Only rounds
        # when N exceeds one lane tile — small molecules stay compact.
        if self.max_nodes > 128:
            self.max_nodes = ((self.max_nodes + 127) // 128) * 128
        per_graph = info.edge_budget_per_graph or self._scan_edge_budget()
        self.edge_budget = edge_budget or pad_edge_budget(per_graph * self.batch_size)
        self.epsilon_dim = epsilon_dim
        self.seed = int(seed)
        self._rng = np.random.RandomState(seed)
        self._native = None
        self._prepare_native()
        self._ell = None
        self._prepare_ell()
        # tiled-backend state: (ts, tr, chunk) fixed after the first batch,
        # chunk budget padded so every batch shares one compiled executable
        self._tiled_cfg = None
        self._tiled_budget = None
        self._tiled_loc = None
        self._stream_budget = None

    def _prepare_native(self) -> None:
        """Precompute flat COO blocks so each batch is one native C call
        (kgcn_tpu/native/batcher.cpp) instead of a Python per-graph loop."""
        ds = self.ds
        if ds.adjs is None:
            return
        try:
            from kgcn_tpu import native
        except Exception:
            return
        if not native.available(build=True):
            return
        C = len(ds.adjs[0])
        rows, cols, vals = [], [], []
        off = np.zeros((ds.num, C), np.int64)
        length = np.zeros((ds.num, C), np.int64)
        cursor = 0
        for g, chans in enumerate(ds.adjs):
            for c, (r, cc, v) in enumerate(chans):
                off[g, c] = cursor
                length[g, c] = len(r)
                rows.append(np.asarray(r, np.int32))
                cols.append(np.asarray(cc, np.int32))
                vals.append(np.asarray(v, np.float32))
                cursor += len(r)
        self._native = {
            "mod": native,
            "rows": np.concatenate(rows) if rows else np.zeros(0, np.int32),
            "cols": np.concatenate(cols) if cols else np.zeros(0, np.int32),
            "vals": np.concatenate(vals) if vals else np.zeros(0, np.float32),
            "off": off,
            "len": length,
            "channels": C,
        }

    def _native_graph(self, idx: np.ndarray, B: int):
        """GraphBatch via the native packer (None → fall back to Python)."""
        from kgcn_tpu.graph.batch import GraphBatch

        nt = self._native
        if nt is None:
            return None
        ds = self.ds
        G = len(idx)
        C = nt["channels"]
        try:
            senders, receivers, weights, n_edge = nt["mod"].pack_edges(
                nt["rows"], nt["cols"], nt["vals"],
                nt["off"][idx].reshape(-1), nt["len"][idx].reshape(-1),
                G, C, self.max_nodes, self.edge_budget,
            )
        except RuntimeError:
            return None
        N = self.max_nodes
        # NB: the node-count inference / mask / id padding below mirrors
        # graph/batch.batch_graphs (the non-native path) — keep both in sync
        if ds.enabled_node_nums is not None:
            nn = np.asarray(ds.enabled_node_nums)[idx].astype(np.int32)
        elif ds.features is not None:
            f = ds.features[idx]
            nn = np.maximum(
                (np.abs(f).sum(axis=-1) > 0).sum(axis=-1), 1
            ).astype(np.int32)
        else:
            nn = np.full((G,), N, np.int32)
        nn_pad = np.zeros((B,), np.int32)
        nn_pad[:G] = nn
        mask = (
            (np.arange(N)[None, :] < nn_pad[:, None]).astype(np.float32).reshape(-1)
        )
        nodes = None
        if ds.features is not None:
            feats = np.ascontiguousarray(ds.features, np.float32)
            padded = nt["mod"].gather_pad_features(
                feats, idx.astype(np.int64), B
            )
            if padded.shape[1] != N:
                tmp = np.zeros((B, N, padded.shape[2]), np.float32)
                tmp[:, : padded.shape[1]] = padded[:, :N]
                padded = tmp
            nodes = jnp.asarray(padded.reshape(B * N, -1))
        ids = None
        if ds.nodes is not None:
            ids_np = np.zeros((B, N), np.int32)
            for j, g in enumerate(idx):
                row = np.asarray(ds.nodes[g], np.int32)
                ids_np[j, : len(row)] = row
            ids = jnp.asarray(ids_np.reshape(-1))
        return GraphBatch(
            senders=jnp.asarray(senders),
            receivers=jnp.asarray(receivers),
            edge_weights=jnp.asarray(weights),
            n_edge=jnp.asarray(n_edge),
            n_node=jnp.asarray(nn_pad),
            node_mask=jnp.asarray(mask),
            nodes=nodes,
            node_ids=ids,
            n_graph=B,
            max_nodes=N,
        )

    def _prepare_ell(self) -> None:
        """Per-graph ELL (padded per-row neighbour lists) built once; batches
        assemble them by concatenation + node-offset — giving layers the
        scatter-free aggregation path (see kgcn_tpu/ops/ell.py)."""
        ds = self.ds
        if ds.adjs is None:
            return
        from kgcn_tpu.ops.ell import coo_to_ell, ell_layout_ok, scan_ell_stats

        C = len(ds.adjs[0])
        N = self.max_nodes
        max_deg, total_edges = scan_ell_stats(ds.adjs)
        if not ell_layout_ok(max_deg, len(ds.adjs) * C * N, total_edges):
            return
        K = max_deg
        per_graph = np.zeros((len(ds.adjs), C, N, K), np.int32)
        per_graph_w = np.zeros((len(ds.adjs), C, N, K), np.float32)
        for g, gs in enumerate(ds.adjs):
            for c, (r, cc, v) in enumerate(gs):
                idx, w = coo_to_ell(cc, r, v, N, max_degree=K)
                per_graph[g, c] = idx
                per_graph_w[g, c] = w
        self._ell = {"idx": per_graph, "w": per_graph_w, "K": K}

    def _ell_arrays(self, idx: np.ndarray, B: int):
        """Batch-assembled [C, B*N, K] ELL arrays for graph indices ``idx``."""
        if self._ell is None:
            return None, None
        N = self.max_nodes
        K = self._ell["K"]
        gi = self._ell["idx"][idx]  # [G, C, N, K]
        gw = self._ell["w"][idx]
        G = len(idx)
        offs = (np.arange(G, dtype=np.int32) * N)[:, None, None, None]
        gi = gi + offs * (gw != 0)  # padding slots stay at global 0
        C = gi.shape[1]
        out_i = np.zeros((C, B * N, K), np.int32)
        out_w = np.zeros((C, B * N, K), np.float32)
        out_i[:, : G * N] = np.transpose(gi, (1, 0, 2, 3)).reshape(C, G * N, K)
        out_w[:, : G * N] = np.transpose(gw, (1, 0, 2, 3)).reshape(C, G * N, K)
        return jnp.asarray(out_i), jnp.asarray(out_w)

    def _scan_edge_budget(self) -> int:
        if self.ds.adjs is None:
            return 1
        return max(max((len(ch[0]) for ch in gs), default=1) for gs in self.ds.adjs)

    @property
    def num_batches(self) -> int:
        return (self.ds.num + self.batch_size - 1) // self.batch_size

    @property
    def valid_per_epoch(self) -> int:
        """Total real (non-padding) examples per epoch — lets the train loop
        skip per-step device synchronisation."""
        return self.ds.num

    def batch_valid_counts(self):
        """Per-batch valid-example counts for a shuffle=False iteration
        (deterministic — lets eval avoid per-batch device syncs)."""
        n, bs = self.ds.num, self.batch_size
        return [min(bs, n - s) for s in range(0, n, bs)]

    def epoch_indices(self, shuffle: bool = True,
                      epoch: Optional[int] = None) -> np.ndarray:
        """Epoch order; with ``epoch`` given the permutation is a pure
        function of (seed, epoch) → training resumed from a checkpoint
        replays the exact data order (SURVEY §5: deterministic resume)."""
        return epoch_permutation(
            self.ds.num, self.seed, epoch if shuffle else None,
            rng=self._rng if shuffle else None,
        )

    def make_batch(self, idx: np.ndarray) -> Batch:
        """Assemble one batch from dataset indices (host-side numpy)."""
        ds = self.ds
        B = self.batch_size
        G = len(idx)
        assert G <= B
        idx = np.asarray(idx)
        self.last_valid = G  # host-side count (avoids device sync to learn it)

        graph = self._native_graph(idx, B)
        if graph is not None:
            ei, ew = self._ell_arrays(idx, B)
            if ei is not None:
                graph = graph.replace(ell_senders=ei, ell_weights=ew)
            return self._finish_batch(graph, idx, G, B)

        if ds.adjs is not None:
            adjs = [
                [
                    # batch_graphs accepts (row, col, val) via scipy-style
                    # tuples; re-pack our triple as a COO tuple
                    (np.stack([r, c], axis=1), v, (self.max_nodes, self.max_nodes))
                    for (r, c, v) in ds.adjs[i]
                ]
                for i in idx
            ]
        else:
            adjs = [[(np.zeros((0, 2), np.int32), np.zeros(0, np.float32),
                      (self.max_nodes, self.max_nodes))]] * G

        feats = ds.features[idx] if ds.features is not None else None
        node_ids = [ds.nodes[i] for i in idx] if ds.nodes is not None else None
        n_nodes = (
            ds.enabled_node_nums[idx] if ds.enabled_node_nums is not None else None
        )
        graph = batch_graphs(
            adjs,
            feats,
            self.max_nodes,
            node_ids=node_ids,
            n_nodes=n_nodes,
            edge_budget=self.edge_budget,
            n_graph=B,
        )
        ei, ew = self._ell_arrays(idx, B)
        if ei is not None:
            graph = graph.replace(ell_senders=ei, ell_weights=ew)
        return self._finish_batch(graph, idx, G, B)

    def _pad_node_axis(self, x):
        """Pad a [G, N_ds, ...] per-node array to the (possibly lane-rounded)
        ``self.max_nodes`` — node_label/mask arrays carry the DATASET's node
        count, which diverges from the batch padding once max_nodes is
        rounded above 128 (e.g. 200 → 256)."""
        if x is None:
            return None
        x = np.asarray(x)
        pad = self.max_nodes - x.shape[1]
        if pad <= 0:
            return x
        widths = [(0, 0)] * x.ndim
        widths[1] = (0, pad)
        return np.pad(x, widths)

    def _attach_tiled(self, graph):
        """Attach per-channel tiled edge structures when the ``tiled`` spmm
        backend is active (Pallas one-hot MXU kernel, ops/tiled_spmm.py).

        The tiling config is chosen from the first batch and then pinned —
        with the chunk list padded to a budget — so streaming batches of
        varying topology share ONE compiled executable.  If a later batch
        overflows the budget it is doubled (one recompilation)."""
        import importlib
        spmm_mod = importlib.import_module("kgcn_tpu.ops.spmm")

        if spmm_mod.get_backend() != "tiled":
            return graph
        F = int(self.info.feature_dim or 128)
        if self._tiled_cfg is None:
            probe = graph.with_tiled(feature_dim=F)
            m = probe.tiled_adj[0].meta
            self._tiled_cfg = (m.ts, m.tr, m.chunk)
            # pin the probe's per-channel locality decisions too: a pinned
            # tiling bypasses the auto branch, and rebuilding without the
            # relabel would both lose the win and overflow the budget the
            # relabeled probe measured
            self._tiled_loc = tuple(
                t.node_perm is not None for t in probe.tiled_adj
            )
            budget = max(
                max(t.meta.n_chunks for t in probe.tiled_adj),
                max(t.transpose.meta.n_chunks for t in probe.tiled_adj),
            )
            self._tiled_budget = -(-int(budget * 1.25) // 8) * 8
        while True:
            try:
                return graph.with_tiled(
                    tiling=self._tiled_cfg,
                    chunk_budget=self._tiled_budget,
                    feature_dim=F,
                    locality=self._tiled_loc,
                )
            except ValueError:
                self._tiled_budget *= 2

    def _attach_stream(self, graph):
        """Attach per-channel stream structures when the ``stream`` spmm
        backend is active (streaming scatter kernel, ops/stream_spmm.py).

        The macro list is padded to a pinned budget (grown by doubling on
        overflow) so streaming batches share one compiled executable;
        adjacency weights are baked in at build time."""
        import importlib
        spmm_mod = importlib.import_module("kgcn_tpu.ops.spmm")

        if spmm_mod.get_backend() != "stream":
            return graph
        if self._stream_budget is None:
            probe = graph.with_stream()
            budget = max(
                max(t.meta.n_macros for t in probe.stream_adj),
                max(t.transpose.meta.n_macros for t in probe.stream_adj),
            )
            self._stream_budget = max(int(budget * 1.25), budget + 1)
        while True:
            try:
                return graph.with_stream(macro_budget=self._stream_budget)
            except ValueError:
                self._stream_budget *= 2

    def _finish_batch(self, graph, idx, G: int, B: int) -> Batch:
        graph = self._attach_tiled(graph)
        graph = self._attach_stream(graph)
        ds = self.ds

        def pad_rows(x):
            if x is None:
                return None
            x = np.asarray(x)
            if G == B:
                return jnp.asarray(x)
            pad = np.zeros((B - G, *x.shape[1:]), dtype=x.dtype)
            return jnp.asarray(np.concatenate([x, pad], axis=0))

        pad_mask = np.zeros((B,), np.float32)
        pad_mask[:G] = 1.0

        vm = None
        if ds.vector_modal:
            vm = tuple(pad_rows(v[idx]) for v in ds.vector_modal)

        eps = None
        if self.epsilon_dim:
            eps = jnp.asarray(
                self._rng.normal(size=(B, self.max_nodes, self.epsilon_dim)).astype(
                    np.float32
                )
            )

        return Batch(
            graph=graph,
            labels=pad_rows(ds.labels[idx]) if ds.labels is not None else None,
            mask_label=(
                pad_rows(ds.mask_label[idx]) if ds.mask_label is not None else None
            ),
            node_label=(
                pad_rows(self._pad_node_axis(ds.node_label[idx]))
                if ds.node_label is not None else None
            ),
            mask_node_label=(
                pad_rows(self._pad_node_axis(ds.mask_node_label[idx]))
                if ds.mask_node_label is not None
                else None
            ),
            sequences=(
                pad_rows(ds.sequences[idx]) if ds.sequences is not None else None
            ),
            sequences_len=(
                pad_rows(ds.sequences_len[idx])
                if ds.sequences_len is not None
                else None
            ),
            vector_modal=vm,
            pad_mask=jnp.asarray(pad_mask),
            rng_normal=eps,
        )

    def batches(self, shuffle: bool = True,
                epoch: Optional[int] = None) -> Iterator[Batch]:
        idx = self.epoch_indices(shuffle, epoch=epoch)
        for start in range(0, len(idx), self.batch_size):
            yield self.make_batch(idx[start : start + self.batch_size])
