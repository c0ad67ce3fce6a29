"""Neighbour-sampled subgraph batching for giant graphs.

BASELINE.json's big-graph story: "subgraph/batch sampling feeds devices via a
sharded pipeline".  For graphs too large even for edge partitioning (or for
stochastic mini-batch training on one big graph), this module draws
GraphSAGE-style fixed-fanout neighbourhood samples around seed nodes and
packs them as ordinary statically-shaped :class:`GraphBatch` subgraphs —
so every downstream layer/trainer works unchanged.

Static shapes: a (hops, fanout) sample around ``seeds_per_batch`` seeds has a
fixed node budget ``seeds · (1 + Σ fanoutᵏ)`` and edge budget; short
neighbourhoods are padded (weight-0 edges, masked nodes).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from kgcn_tpu.graph.batch import GraphBatch, pad_edge_budget


class NeighborSampler:
    """Fixed-fanout neighbourhood sampler over one big multi-channel graph.

    ``adjs``: one graph's channel list [(row, col, val), ...] (node count V).
    Sampling unions all channels for neighbourhood expansion; the induced
    subgraph keeps per-channel edges.
    """

    def __init__(self, adjs: Sequence[Tuple], num_nodes: int,
                 fanout: int = 10, hops: int = 2, seed: int = 0):
        self.adjs = [tuple(np.asarray(a) for a in ch) for ch in adjs]
        self.num_nodes = int(num_nodes)
        self.fanout = int(fanout)
        self.hops = int(hops)
        self._rng = np.random.RandomState(seed)
        self._auto_edge_budget = 1  # sticky budget; see sample_batch
        # CSR-style neighbour lists over the channel union (outgoing edges
        # from each node; reference KG adjacencies include reverse edges so
        # this covers both directions)
        nbrs: List[List[int]] = [[] for _ in range(self.num_nodes)]
        for (row, col, val) in self.adjs:
            for r, c in zip(row, col):
                nbrs[int(r)].append(int(c))
        self._nbr_idx = [np.asarray(sorted(set(n)), np.int32) for n in nbrs]

    @property
    def max_sample_nodes(self) -> int:
        n, total = 1, 1
        for _ in range(self.hops):
            n *= self.fanout
            total += n
        return total

    def sample_nodes(self, seed_node: int) -> np.ndarray:
        """Union of the seed's sampled k-hop neighbourhood (≤ max_sample_nodes)."""
        frontier = {int(seed_node)}
        nodes = {int(seed_node)}
        for _ in range(self.hops):
            nxt = set()
            for v in frontier:
                nb = self._nbr_idx[v]
                if len(nb) == 0:
                    continue
                take = (
                    nb
                    if len(nb) <= self.fanout
                    else self._rng.choice(nb, self.fanout, replace=False)
                )
                nxt.update(int(u) for u in take)
            frontier = nxt - nodes
            nodes |= nxt
        return np.asarray(sorted(nodes), np.int32)

    def induced_subgraph(self, nodes: np.ndarray):
        """Per-channel (row_local, col_local, val) edges among ``nodes``."""
        pos = -np.ones(self.num_nodes, np.int64)
        pos[nodes] = np.arange(len(nodes))
        out = []
        for (row, col, val) in self.adjs:
            keep = (pos[row] >= 0) & (pos[col] >= 0)
            out.append(
                (
                    pos[row[keep]].astype(np.int32),
                    pos[col[keep]].astype(np.int32),
                    np.asarray(val)[keep].astype(np.float32),
                )
            )
        return out

    def sample_batch(
        self,
        seeds: Sequence[int],
        *,
        features: Optional[np.ndarray] = None,  # [V, F] global node features
        node_budget: Optional[int] = None,
        edge_budget: Optional[int] = None,
    ) -> Tuple[GraphBatch, np.ndarray]:
        """One GraphBatch of sampled subgraphs (one per seed).

        Returns (batch, global_node_ids [B, N_budget], padded with -1) — the
        seed is always local node 0 of its subgraph, so seed-node readouts
        are ``nodes_batched()[:, 0]``.
        """
        B = len(seeds)
        N = int(node_budget or self.max_sample_nodes)
        C = len(self.adjs)
        all_nodes = []
        all_edges: List[List[Tuple]] = []
        need = 1
        for s in seeds:
            nodes = self.sample_nodes(int(s))
            # seed first (stable position for readout), then the rest
            nodes = np.concatenate(
                [[int(s)], nodes[nodes != int(s)]]
            ).astype(np.int32)[:N]
            sub = self.induced_subgraph(nodes)
            need = max(need, sum(len(ch[0]) for ch in sub))
            all_nodes.append(nodes)
            all_edges.append(sub)
        total_need = pad_edge_budget(need * B)
        if edge_budget is not None:
            E = int(edge_budget)
            if total_need > E:
                raise ValueError(
                    f"edge_budget {E} < {total_need} edges sampled this "
                    "batch — raise the budget (or omit it to auto-size)"
                )
        else:
            # sticky auto budget: grow monotonically and REUSE, so batch
            # shapes stabilise after the first few batches instead of
            # recompiling the jitted step on every edge-count wiggle
            if total_need > self._auto_edge_budget:
                self._auto_edge_budget = total_need
            E = self._auto_edge_budget

        import jax.numpy as jnp

        senders = np.zeros((C, E), np.int32)
        receivers = np.zeros((C, E), np.int32)
        weights = np.zeros((C, E), np.float32)
        n_edge = np.zeros((C,), np.int32)
        for c in range(C):
            off = 0
            for g, sub in enumerate(all_edges):
                r, cc, v = sub[c]
                k = len(r)
                receivers[c, off : off + k] = r + g * N
                senders[c, off : off + k] = cc + g * N
                weights[c, off : off + k] = v
                off += k
            n_edge[c] = off

        nn = np.asarray([len(x) for x in all_nodes], np.int32)
        mask = (np.arange(N)[None, :] < nn[:, None]).astype(np.float32).reshape(-1)
        gids = -np.ones((B, N), np.int64)
        for g, nodes in enumerate(all_nodes):
            gids[g, : len(nodes)] = nodes

        nodes_arr = None
        ids = None
        if features is not None:
            F = features.shape[1]
            buf = np.zeros((B, N, F), np.float32)
            for g, nodes in enumerate(all_nodes):
                buf[g, : len(nodes)] = features[nodes]
            nodes_arr = jnp.asarray(buf.reshape(B * N, F))
        else:
            idbuf = np.zeros((B, N), np.int32)
            for g, nodes in enumerate(all_nodes):
                idbuf[g, : len(nodes)] = nodes
            ids = jnp.asarray(idbuf.reshape(-1))

        batch = GraphBatch(
            senders=jnp.asarray(senders),
            receivers=jnp.asarray(receivers),
            edge_weights=jnp.asarray(weights),
            n_edge=jnp.asarray(n_edge),
            n_node=jnp.asarray(nn),
            node_mask=jnp.asarray(mask),
            nodes=nodes_arr,
            node_ids=ids,
            n_graph=B,
            max_nodes=N,
        )
        return batch, gids
