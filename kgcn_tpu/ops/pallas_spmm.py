"""Pallas ELL SpMM kernel: VMEM-resident features, row-tiled gather.

Strategy: convert the COO edge list to ELL (padded per-row neighbour lists,
``kgcn_tpu.ops.ell``) on device, keep the WHOLE feature matrix ``x`` in VMEM
(molecular block-diagonal batches are small enough: V·F·4B ≤ ~12 MB), and
let each grid cell produce one row tile:

    out[v] = Σ_k w[v, k] · x[idx[v, k], :]

The inner gather reads rows of the VMEM-resident ``x`` — on-chip gathers
instead of HBM ones, which is the entire point vs the XLA path.  Falls back
to the XLA segment-sum path when ``x`` exceeds the VMEM budget.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Leave headroom below the ~16 MB/core VMEM for tiles and scratch.
VMEM_X_BUDGET_BYTES = 10 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ell_kernel(idx_ref, w_ref, x_ref, out_ref):
    """idx/w tile [TV, K]; x [V, F] resident; out tile [TV, F]."""
    K = idx_ref.shape[1]
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for k in range(K):  # static K — molecular degree is tiny
        rows = jnp.take(x_ref[:], idx_ref[:, k], axis=0)
        acc = acc + w_ref[:, k][:, None].astype(jnp.float32) * rows
    out_ref[:] = acc.astype(out_ref.dtype)


def spmm_ell_pallas(idx, w, x, *, tile_v: int = 256):
    """ELL aggregation as a Pallas kernel; idx/w [V, K], x [V, F] → [V, F]."""
    V, K = idx.shape
    F = x.shape[1]
    V_p = _round_up(V, tile_v)
    F_p = _round_up(F, 128)
    if V_p != V:
        idx = jnp.pad(idx, ((0, V_p - V), (0, 0)))
        w = jnp.pad(w, ((0, V_p - V), (0, 0)))
    if V_p != V or F_p != F:
        x = jnp.pad(x, ((0, V_p - V), (0, F_p - F)))

    out = pl.pallas_call(
        _ell_kernel,
        grid=(V_p // tile_v,),
        in_specs=[
            pl.BlockSpec((tile_v, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_v, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V_p, F_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_v, F_p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V_p, F_p), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * V_p * K * F_p,
            bytes_accessed=4 * (V_p * F_p + 2 * V_p * K + V_p * F_p),
            transcendentals=0,
        ),
    )(idx, w, x)
    return out[:V, :F]


def coo_to_ell_device(senders, receivers, weights, num_nodes: int,
                      max_degree: int):
    """On-device COO → ELL conversion (scatter into per-row slots)."""
    E = senders.shape[0]
    valid = weights != 0
    # slot of edge e within its receiver's list = rank of e among earlier
    # VALID edges with the same receiver.  Invalid (weight-0 padding) edges
    # are sorted into a sentinel group so they never consume a slot —
    # ranking them would push real edges past max_degree and drop them
    # (the host-side coo_to_ell filters invalid edges the same way).
    r_eff = jnp.where(valid, receivers.astype(jnp.int32), num_nodes)
    order = jnp.argsort(r_eff, stable=True)
    r_sorted = r_eff[order]
    first = jnp.searchsorted(r_sorted, r_sorted, side="left")
    slot_sorted = jnp.arange(E, dtype=jnp.int32) - first.astype(jnp.int32)
    slot = jnp.zeros((E,), jnp.int32).at[order].set(slot_sorted)
    ok = valid & (slot < max_degree)
    # invalid/padding edges go to a sacrificial extra slot that is sliced off
    flat = jnp.where(
        ok,
        receivers.astype(jnp.int32) * max_degree + slot,
        num_nodes * max_degree,
    )
    idx = jnp.zeros((num_nodes * max_degree + 1,), jnp.int32).at[flat].set(
        senders.astype(jnp.int32)
    )[:-1]
    wv = jnp.zeros((num_nodes * max_degree + 1,), weights.dtype).at[flat].set(
        weights
    )[:-1]
    return idx.reshape(num_nodes, max_degree), wv.reshape(num_nodes, max_degree)


@jax.custom_vjp
def spmm_ell_ad(idx, w, x):
    """Differentiable Pallas ELL aggregation ``out[v] = Σ_k w[v,k]·x[idx[v,k]]``.

    The kernel itself has no autodiff rule, so the VJP is supplied manually:
    ``dx`` is the transpose scatter (segment-sum over flattened slots) and
    ``dw[v,k] = ⟨g[v], x[idx[v,k]]⟩`` — the same transpose-spmm + SDDMM pair
    the reference registers for bspmm (kgcn/bspmm_call.py:21-57)."""
    return spmm_ell_pallas(idx, w, x)


def _spmm_ell_ad_fwd(idx, w, x):
    return spmm_ell_pallas(idx, w, x), (idx, w, x)


def _spmm_ell_ad_bwd(res, g):
    idx, w, x = res
    V, K = idx.shape
    g32 = g.astype(jnp.float32)
    # dx[u] = Σ_{v,k: idx[v,k]=u} w[v,k] · g[v]
    contrib = (w[:, :, None].astype(jnp.float32) * g32[:, None, :]).reshape(
        V * K, -1
    )
    dx = jax.ops.segment_sum(contrib, idx.reshape(-1), num_segments=x.shape[0])
    # dw[v,k] = ⟨g[v], x[idx[v,k]]⟩
    dw = jnp.einsum("vf,vkf->vk", g32, x[idx].astype(jnp.float32))
    d_idx = jnp.zeros(idx.shape, dtype=jax.dtypes.float0)
    return d_idx, dw.astype(w.dtype), dx.astype(x.dtype)


spmm_ell_ad.defvjp(_spmm_ell_ad_fwd, _spmm_ell_ad_bwd)


_KERNEL_OK: list = []  # empty = unprobed; [True]/[False] after probe


def _kernel_supported() -> bool:
    """One-time compile probe: current Mosaic versions may reject the VMEM
    row-gather; fall back to the (still scatter-free) ELL-XLA path then."""
    if _KERNEL_OK:
        return _KERNEL_OK[0]
    try:
        idx = jnp.zeros((8, 2), jnp.int32)
        w = jnp.ones((8, 2), jnp.float32)
        x = jnp.ones((8, 8), jnp.float32)
        jax.block_until_ready(spmm_ell_pallas(idx, w, x, tile_v=8))
        _KERNEL_OK.append(True)
    except Exception:
        _KERNEL_OK.append(False)
    return _KERNEL_OK[0]


def spmm_pallas(senders, receivers, weights, x, num_nodes: int,
                max_degree: int | None = None):
    """COO SpMM through the Pallas ELL kernel (ELL-XLA fallback when the
    kernel cannot lower on this backend; segment-sum fallback when x exceeds
    the VMEM budget)."""
    V, F = num_nodes, x.shape[1]
    # the ELL kernel's VMEM block and padding assume x has exactly
    # num_nodes rows (out[v] gathers rows of the SAME block it writes);
    # budget on x's true row count, and decline mismatched shapes
    if (x.shape[0] != V
            or x.shape[0] * _round_up(F, 128) * 4 > VMEM_X_BUDGET_BYTES):
        gathered = x[senders] * weights[:, None].astype(x.dtype)
        return jax.ops.segment_sum(gathered, receivers, num_segments=V)
    if max_degree is None:
        # A static per-row degree bound is required.  Traced edge lists have
        # no host-visible degrees — guessing a cap would SILENTLY DROP edges
        # beyond it, so that is a hard error rather than a fallback.
        if isinstance(receivers, jax.core.Tracer):
            raise ValueError(
                "spmm_pallas called under jit without max_degree: pass the "
                "dataset-wide max in-degree explicitly (a traced edge list "
                "has no host-visible degrees, and capping would drop edges)"
            )
        deg = np.zeros(V, np.int64)
        if isinstance(weights, jax.core.Tracer):
            # weights traced but topology concrete: count every edge slot —
            # a safe overestimate (padding edges only add zero rows)
            np.add.at(deg, np.asarray(receivers), 1)
        else:
            np.add.at(deg, np.asarray(receivers)[np.asarray(weights) != 0], 1)
        max_degree = max(int(deg.max()), 1)
    idx, w = coo_to_ell_device(senders, receivers, weights, V, max_degree)
    if _kernel_supported():
        return spmm_ell_ad(idx, w, x)
    from kgcn_tpu.ops.ell import spmm_ell

    return spmm_ell(idx, w, x)
