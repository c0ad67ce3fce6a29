"""ELL-format (padded per-row neighbour lists) aggregation.

The TPU-friendly sparse layout: each node's in-edges are padded to a fixed
``max_degree`` K, giving dense ``[V, K]`` index/weight matrices.  Aggregation
becomes gather + weighted K-sum — **no scatter at all**, which matters on TPU
where scatters serialise.  Molecular graphs have tiny bounded degree
(≤ 4-6 with self loops), so padding waste is small; this is the execution
strategy for big block-diagonal batches where the dense [B,N,N] path would
waste O(N²) memory (the reference's analogue is the bspmm/batched custom ops,
kgcn/bspmm_call.py, kgcn/batched_call.py).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


# Max in-degree above which the padded-neighbour-list layout stops paying
# off, and the padded-slot waste cap (V·K vs E) — measured on TPU
# (MEASURED.md); shared by every batch builder so path selection is uniform.
ELL_MAX_DEGREE = 32


def ell_layout_ok(max_degree: int, node_slots: int, total_edges: int) -> bool:
    """Whether the ELL layout is worth building: bounded degree and padded
    gather work within 2x of the true edge count."""
    return (
        0 < max_degree <= ELL_MAX_DEGREE
        and node_slots * max_degree <= 2.0 * max(total_edges, 1)
    )


def scan_ell_stats(adjs) -> tuple[int, int]:
    """(max in-degree, total edge count) over per-graph per-channel COO
    triples — the inputs to :func:`ell_layout_ok`."""
    max_deg = 0
    total_edges = 0
    for gs in adjs:
        for (r, _c, _v) in gs:
            total_edges += len(r)
            if len(r):
                max_deg = max(max_deg, int(np.bincount(np.asarray(r)).max()))
    return max_deg, total_edges


def coo_to_ell(senders, receivers, weights, num_nodes: int,
               max_degree: int | None = None):
    """Host-side conversion: packed COO → (idx [V,K], w [V,K]).

    Fully vectorised (sort + searchsorted slot ranks).  Padding slots point
    at node 0 with weight 0 (harmless for weighted sums).  Edges beyond
    ``max_degree`` per row are DROPPED — pass None to size K to the true max.
    """
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    weights = np.asarray(weights)
    valid = weights != 0
    s, r, w_v = senders[valid], receivers[valid], weights[valid]
    order = np.argsort(r, kind="stable")
    r_sorted = r[order]
    first = np.searchsorted(r_sorted, r_sorted, side="left")
    slot = np.arange(len(r_sorted)) - first
    if max_degree is None:
        K = int(slot.max()) + 1 if len(slot) else 1
    else:
        K = int(max_degree)
        keep = slot < K
        order, r_sorted, slot = order[keep], r_sorted[keep], slot[keep]
    idx = np.zeros((num_nodes, max(K, 1)), np.int32)
    w = np.zeros((num_nodes, max(K, 1)), np.float32)
    idx[r_sorted, slot] = s[order]
    w[r_sorted, slot] = w_v[order]
    return idx, w


def spmm_ell(idx, w, x):
    """``out[v] = Σ_k w[v,k] · x[idx[v,k]]`` — gather + weighted sum.

    idx/w: [V, K]; x: [V, F] → [V, F].  XLA lowers the gather natively and
    fuses the multiply-reduce; fully vectorised, scatter-free.
    """
    gathered = x[idx]  # [V, K, F]
    return jnp.einsum("vk,vkf->vf", w.astype(x.dtype), gathered)


def spmm_ell_multichannel(idxs, ws, x):
    """Channel-summed ELL spmm: idxs/ws [C, V, K] → [V, F]."""
    gathered = x[idxs]  # [C, V, K, F]
    return jnp.einsum("cvk,cvkf->vf", ws.astype(x.dtype), gathered)
