"""Statically-shaped batched graph container.

This is the TPU-native replacement for the reference's feed model, where each
batch rebuilt hundreds of per-graph, per-channel ``tf.SparseTensorValue``s in
Python (reference: kgcn/feed.py:112-126, kgcn/default_model.py:10).  Here a
batch of graphs is ONE pytree of fixed-shape arrays, so a jitted step compiles
once and every subsequent batch reuses the executable.

Layout decisions (TPU-first):

* **Uniform node padding.** Every graph is padded to ``max_nodes`` nodes, so
  the flat node tensor has a static ``V = n_graph * max_nodes`` rows and the
  batched view ``[B, N, F]`` is a free reshape.  Graph membership of node ``v``
  is ``v // max_nodes`` — no segment-id array needed for readout, which becomes
  a masked sum over a dense axis (MXU/VPU friendly) instead of a scatter.
* **Packed, padded COO edges.** Edges are global-node-index COO lists per
  adjacency channel, ``[C, E]`` with valid edges packed first and the count in
  ``n_edge``; padding edges point at node 0 with weight 0, so weighted
  segment-sums need no masking and attention paths mask with
  ``iota < n_edge``.  ``E`` is a per-dataset budget rounded up to a lane
  multiple so batches of different edge counts share one compiled executable.
* **Optional dense adjacency.** Molecular graphs are tiny (≤ a few hundred
  nodes).  For those, aggregation as a batched dense matmul
  ``[B*C, N, N] @ [B*C, N, F]`` runs on the MXU at full tilt and beats any
  scatter-based path; ``dense_adjacency()`` materialises it on device from the
  COO lists.  Large block-diagonal batches (reaction / KG workloads) stay
  sparse and use the segment-sum / Pallas path in ``kgcn_tpu.ops``.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

LANE = 128  # TPU lane width; edge budgets are rounded up to a multiple.


def pad_edge_budget(n: int, multiple: int = LANE) -> int:
    """Round an edge count up to a hardware-friendly multiple (min one lane)."""
    n = max(int(n), 1)
    return ((n + multiple - 1) // multiple) * multiple


@struct.dataclass
class GraphBatch:
    """A batch of ``n_graph`` graphs, each padded to ``max_nodes`` nodes.

    Attributes
    ----------
    nodes:      ``[V, F]`` float node features (``V = n_graph * max_nodes``),
                or ``None`` in node-embedding mode (KG workloads), where
                ``node_ids`` indexes an embedding table instead
                (reference: kgcn/default_model.py:24-27 "with_node_embedding").
    node_ids:   ``[V]`` int32 vocabulary ids, or ``None``.
    senders:    ``[C, E]`` int32 global source-node index per edge.
    receivers:  ``[C, E]`` int32 global destination-node index per edge.
    edge_weights: ``[C, E]`` float edge weight; 0 marks padding edges.
    n_edge:     ``[C]`` int32 count of valid (packed-first) edges per channel.
    n_node:     ``[B]`` int32 true node count per graph (pre-padding).
    node_mask:  ``[V]`` float 1.0 for real nodes, 0.0 for padding
                (plays the role of ``enabled_node_nums`` slicing in the
                reference, kgcn/layers.py:188-217, without data-dependent
                shapes).
    n_graph, max_nodes: static Python ints (pytree aux data) — safe to use in
                shape arithmetic under jit.
    """

    senders: jnp.ndarray
    receivers: jnp.ndarray
    edge_weights: jnp.ndarray
    n_edge: jnp.ndarray
    n_node: jnp.ndarray
    node_mask: jnp.ndarray
    nodes: Optional[jnp.ndarray] = None
    node_ids: Optional[jnp.ndarray] = None
    # Optional cached dense adjacency [C, B, N, N] for the MXU path; populate
    # once per forward with ``with_dense_adj()`` so all layers share it.
    dense_adj: Optional[jnp.ndarray] = None
    # Optional ELL neighbour lists ``[C, V, K]`` (padded per-row senders +
    # weights) — the scatter-free sparse path; built by the Batcher when the
    # per-node degree is bounded.  Padding slots: index 0, weight 0.
    ell_senders: Optional[jnp.ndarray] = None
    ell_weights: Optional[jnp.ndarray] = None
    # Optional explicit [C, E] edge-validity mask.  The default layout packs
    # valid edges first so ``edge_mask()`` derives validity from ``n_edge``;
    # the device-resident layout (kgcn_tpu/runtime/resident.py) interleaves
    # per-graph padding and supplies the mask explicitly instead.
    edge_valid: Optional[jnp.ndarray] = None
    # Optional per-channel tiled edge structures (tuple of TiledCOO) for the
    # Pallas one-hot MXU SpMM kernel (ops/tiled_spmm.py) — the ``tiled``
    # spmm backend; built host-side by ``with_tiled()`` / the Batcher.
    tiled_adj: Optional[tuple] = None
    # Optional per-channel stream structures (tuple of StreamCOO) for the
    # streaming scatter SpMM kernel (ops/stream_spmm.py) — the ``stream``
    # spmm backend for scattered big graphs; adjacency weights are baked in
    # (static per batch), so layers call it weight-free.
    stream_adj: Optional[tuple] = None
    n_graph: int = struct.field(pytree_node=False, default=1)
    max_nodes: int = struct.field(pytree_node=False, default=1)

    # ---- derived views -------------------------------------------------
    @property
    def num_channels(self) -> int:
        return self.senders.shape[0]

    @property
    def edge_budget(self) -> int:
        return self.senders.shape[1]

    @property
    def total_nodes(self) -> int:
        return self.n_graph * self.max_nodes

    def nodes_batched(self) -> jnp.ndarray:
        """``[B, N, F]`` view of the flat node features (free reshape)."""
        return self.nodes.reshape(self.n_graph, self.max_nodes, -1)

    def mask_batched(self) -> jnp.ndarray:
        """``[B, N]`` view of the node mask."""
        return self.node_mask.reshape(self.n_graph, self.max_nodes)

    def graph_ids(self) -> jnp.ndarray:
        """``[V]`` segment ids: node v belongs to graph v // max_nodes."""
        return jnp.arange(self.total_nodes, dtype=jnp.int32) // self.max_nodes

    def edge_mask(self) -> jnp.ndarray:
        """``[C, E]`` 1.0 for valid edges (valid edges are packed first,
        unless an explicit ``edge_valid`` mask is carried)."""
        if self.edge_valid is not None:
            return self.edge_valid
        iota = jnp.arange(self.edge_budget, dtype=jnp.int32)[None, :]
        return (iota < self.n_edge[:, None]).astype(jnp.float32)

    def dense_adjacency(self, dtype=None) -> jnp.ndarray:
        """Materialise ``[C, B, N, N]`` dense adjacency from the COO lists.

        Built on device with one scatter-add per channel; padding edges carry
        weight 0 so they are harmless.  Used by the dense MXU aggregation path
        for small graphs.
        """
        C, E = self.senders.shape
        B, N = self.n_graph, self.max_nodes
        if dtype is None:  # follow the payload dtype (mixed-precision path)
            dtype = self.edge_weights.dtype
        out = jnp.zeros((C, B * N * N), dtype=dtype)
        # receiver row, sender col: out[r, s] += w  (A @ X aggregates senders
        # into receivers, matching A·X in the reference GraphConv,
        # kgcn/layers.py:110-115).
        b = self.receivers // N
        flat = b * (N * N) + (self.receivers % N) * N + (self.senders % N)
        out = jax.vmap(
            lambda o, f, w: o.at[f].add(w)
        )(out, flat, self.edge_weights.astype(dtype))
        return out.reshape(C, B, N, N)

    def astype(self, dtype) -> "GraphBatch":
        """Cast the floating-point payload (features, weights, cached dense
        adjacency, masks) to ``dtype`` — the mixed-precision hook.  With
        ``jnp.bfloat16`` every aggregation matmul runs as a true bf16 MXU op
        with halved HBM traffic; integer index arrays are untouched."""

        def cast(a):
            return None if a is None else a.astype(dtype)

        return self.replace(
            edge_weights=cast(self.edge_weights),
            node_mask=cast(self.node_mask),
            nodes=cast(self.nodes),
            dense_adj=cast(self.dense_adj),
            ell_weights=cast(self.ell_weights),
            edge_valid=cast(self.edge_valid),
        )

    def with_dense_adj(self) -> "GraphBatch":
        """Return a copy carrying the materialised dense adjacency (no-op if
        already cached).  Call once at the top of a model's forward so every
        layer's aggregation becomes a batched MXU matmul.

        Honours the global backend toggle (``set_dense_path``): when the
        sparse backend is forced (config ``spmm_backend`` = xla/pallas),
        this is a no-op and layers take their edge-list paths."""
        if not _DENSE_PATH_ENABLED[0]:
            return self
        if self.dense_adj is not None:
            return self
        return self.replace(dense_adj=self.dense_adjacency())

    def with_tiled(self, *, tiling: Optional[tuple] = None,
                   chunk_budget: Optional[int] = None,
                   feature_dim: int = 128,
                   locality: "bool | str" = "auto") -> "GraphBatch":
        """Return a copy carrying per-channel tiled edge structures for the
        Pallas one-hot MXU SpMM kernel (``spmm_backend: "tiled"``).

        HOST-SIDE ONLY (numpy packing of the edge lists) — call it where the
        batch is assembled, not under jit.  ``tiling``: explicit (ts, tr,
        chunk); default picks per-channel via ``choose_tiling``.
        ``chunk_budget``: pad the chunk list to a fixed length so streaming
        batches of varying topology share one compiled executable.
        ``locality``: degree-descending node relabel before tiling
        (ops/tiled_spmm.locality_order) — "auto" runs the tiling cost model
        on both the raw and the relabeled edge list for single whole-graph
        batches and relabels only on a ≥20% modeled win (measured 1.6× on
        steep power laws, neutral on mild skew — see
        choose_tiling_with_locality); block-diagonal molecular batches keep
        their natural (already clustered) order.
        """
        if self.tiled_adj is not None:
            return self
        import numpy as _np

        from kgcn_tpu.ops.tiled_spmm import (
            build_tiled, choose_tiling, choose_tiling_with_locality,
        )

        s = _np.asarray(self.senders)
        r = _np.asarray(self.receivers)
        w = _np.asarray(self.edge_weights)
        ev = (_np.asarray(self.edge_valid)
              if self.edge_valid is not None else None)
        tes = []
        for c in range(s.shape[0]):
            tl = tiling
            if locality == "auto":
                loc = False
                if self.n_graph == 1 and tiling is None:
                    tl, loc = choose_tiling_with_locality(
                        s[c], r[c], self.total_nodes, feature_dim,
                        weights=w[c],
                    )
            elif isinstance(locality, (tuple, list)):
                # per-channel decisions pinned by a probe batch
                # (Batcher._attach_tiled) — must match the probe or the
                # pinned chunk budget is wrong
                loc = bool(locality[c])
            else:
                loc = bool(locality)
            if tl is None:
                tl = choose_tiling(
                    s[c], r[c], self.total_nodes, feature_dim, weights=w[c]
                )
            ts, tr, chunk = tl
            tes.append(
                build_tiled(
                    s[c], r[c], self.total_nodes, weights=w[c],
                    ts=ts, tr=tr, chunk=chunk, chunk_budget=chunk_budget,
                    locality=loc,
                    # drop by the padding MASK, not by weight==0: a valid
                    # edge with zero adjacency weight must stay in the
                    # structure for dynamic (attention) weights
                    valid_mask=ev[c] if ev is not None else None,
                )
            )
        return self.replace(tiled_adj=tuple(tes))

    def with_stream(self, *, macro_budget: Optional[int] = None,
                    params: Optional[dict] = None) -> "GraphBatch":
        """Return a copy carrying per-channel stream structures for the
        streaming scatter SpMM kernel (``spmm_backend: "stream"`` —
        ops/stream_spmm.py, the scattered big-graph kernel).

        HOST-SIDE ONLY.  Adjacency weights are baked into the structures
        (and into materialised one-hots when they fit the budget), so the
        layer-side call carries no per-step weight traffic.
        ``macro_budget``: pad the macro list so streaming batches of varying
        topology share one compiled executable."""
        if self.stream_adj is not None:
            return self
        import numpy as _np

        from kgcn_tpu.ops.stream_spmm import build_stream

        s = _np.asarray(self.senders)
        r = _np.asarray(self.receivers)
        w = _np.asarray(self.edge_weights)
        ev = (_np.asarray(self.edge_valid)
              if self.edge_valid is not None else None)
        kw = dict(params or {})
        sss = tuple(
            build_stream(s[c], r[c], self.total_nodes, weights=w[c],
                         macro_budget=macro_budget,
                         valid_mask=ev[c] if ev is not None else None, **kw)
            for c in range(s.shape[0])
        )
        return self.replace(stream_adj=sss)


_DENSE_PATH_ENABLED = [True]


def set_dense_path(enabled: bool) -> None:
    """Globally enable/disable the dense-MXU aggregation path (mirrors the
    reference's --bspmm/--bconv op-selection flags, kgcn/layers.py:19-29)."""
    _DENSE_PATH_ENABLED[0] = bool(enabled)


def _coo_normalize(mat) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Accept scipy sparse / (indices, values, shape) tuple / dense ndarray and
    return (row, col, values) numpy arrays."""
    if hasattr(mat, "tocoo"):  # scipy sparse
        coo = mat.tocoo()
        return (
            coo.row.astype(np.int32),
            coo.col.astype(np.int32),
            coo.data.astype(np.float32),
        )
    if isinstance(mat, tuple) and len(mat) == 3:  # kGCN jbl COO tuple
        indices, values, _shape = mat
        indices = np.asarray(indices)
        return (
            indices[:, 0].astype(np.int32),
            indices[:, 1].astype(np.int32),
            np.asarray(values, dtype=np.float32),
        )
    dense = np.asarray(mat)
    row, col = np.nonzero(dense)
    return (
        row.astype(np.int32),
        col.astype(np.int32),
        dense[row, col].astype(np.float32),
    )


def batch_graphs(
    adjs: Sequence[Sequence],
    features: Optional[np.ndarray],
    max_nodes: int,
    *,
    node_ids: Optional[Sequence[Sequence[int]]] = None,
    n_nodes: Optional[Sequence[int]] = None,
    edge_budget: Optional[int] = None,
    n_graph: Optional[int] = None,
) -> GraphBatch:
    """Assemble a ``GraphBatch`` from per-graph adjacency channels (host side).

    Parameters
    ----------
    adjs: ``adjs[g][c]`` is graph g's channel-c adjacency (scipy sparse, COO
        tuple, or dense ndarray) — the jbl ``adj`` schema
        (reference: docs/dataset_file.md, kgcn/data_util.py:374-592).
    features: ``[G, N, F]`` padded node features or None (embedding mode).
    max_nodes: pad target N.
    node_ids: per-graph node vocabulary ids (embedding mode).
    n_nodes: true node counts; inferred from feature non-zero rows if omitted.
    edge_budget: static per-channel edge capacity; computed (and lane-rounded)
        from this batch if omitted — pass a dataset-wide budget to keep one
        compiled executable across batches.
    n_graph: pad the batch itself to this many graphs (last partial batch).
    """
    G = len(adjs)
    B = n_graph or G
    assert B >= G
    C = len(adjs[0]) if G else 1
    N = int(max_nodes)

    coo = [[_coo_normalize(adjs[g][c]) for g in range(G)] for c in range(C)]
    need = max((sum(len(r) for (r, _, _) in coo[c]) for c in range(C)), default=1)
    E = edge_budget or pad_edge_budget(need)
    if need > E:
        raise ValueError(f"edge budget {E} < required {need}")

    senders = np.zeros((C, E), dtype=np.int32)
    receivers = np.zeros((C, E), dtype=np.int32)
    weights = np.zeros((C, E), dtype=np.float32)
    n_edge = np.zeros((C,), dtype=np.int32)
    for c in range(C):
        off = 0
        for g in range(G):
            row, col, val = coo[c][g]
            k = len(row)
            if k and (row.max() >= N or col.max() >= N):
                # silently offsetting out-of-range indices would bleed this
                # graph's edges into graph g+1's block — hard error instead
                raise ValueError(
                    f"graph {g} channel {c} has node index "
                    f"{int(max(row.max(), col.max()))} >= max_nodes {N}"
                )
            receivers[c, off : off + k] = row + g * N
            senders[c, off : off + k] = col + g * N
            weights[c, off : off + k] = val
            off += k
        n_edge[c] = off

    if n_nodes is not None:
        nn = np.asarray(n_nodes, dtype=np.int32)
    elif features is not None:
        nn = (np.abs(features).sum(axis=-1) > 0).sum(axis=-1).astype(np.int32)
        nn = np.maximum(nn, 1)
    else:
        nn = np.full((G,), N, dtype=np.int32)
    nn_pad = np.zeros((B,), dtype=np.int32)
    nn_pad[:G] = nn[:G]

    mask = (np.arange(N)[None, :] < nn_pad[:, None]).astype(np.float32).reshape(-1)

    nodes = None
    ids = None
    if features is not None:
        F = features.shape[-1]
        nodes_np = np.zeros((B, N, F), dtype=np.float32)
        nodes_np[:G, : features.shape[1]] = features[:, :N]
        nodes = jnp.asarray(nodes_np.reshape(B * N, F))
    if node_ids is not None:
        ids_np = np.zeros((B, N), dtype=np.int32)
        for g, row in enumerate(node_ids):
            row = np.asarray(row, dtype=np.int32)
            ids_np[g, : len(row)] = row
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
