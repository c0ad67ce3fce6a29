"""Fused multi-channel graph convolution Pallas kernel.

Computes ``out_b = Σ_c A[c,b] @ (X_b W_c + b_c)`` for a batch of dense
padded adjacencies — the semantics of the reference's Bconv custom CUDA op
(kgcn/bconv_call.py:6-21, channel sum at :46) — as ONE Pallas kernel:

* grid over (graph, N-tile, Fout-tile); channels iterated INSIDE the kernel
  so the ``X_b W_c`` intermediate lives in VMEM and never round-trips HBM
  (the XLA einsum path materialises the whole [C,B,N,F] tensor);
* both matmuls land on the MXU with fp32 accumulation;
* backward is expressed with the same kernel on transposed operands
  (dX = Σ_c Aᵀ g Wᵀ; dW_c = Σ_b Xᵀ Aᵀ g; db_c = Σ rows) via a custom VJP.

Shapes: adj [C, B, N, N], x [B, N, Fin], w [C, Fin, Fout], b [C, Fout]
→ out [B, N, Fout].  N, Fin, Fout are padded to lane multiples by the
wrapper, so molecular workloads (N ≤ 256) run at full MXU tiling.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gconv_kernel(adj_ref, x_ref, w_ref, b_ref, out_ref, acc_ref):
    """One (graph, row-tile, out-tile) cell; loops channels in VMEM.

    adj_ref: [C, TN, N]    (row tile of graph b's adjacency, all channels)
    x_ref:   [N, Fin]      (graph b's features)
    w_ref:   [C, Fin, TF]  (out-tile of all channel weights)
    b_ref:   [C, TF]
    out_ref: [TN, TF]
    acc_ref: [TN, TF] f32 scratch accumulator
    """
    C = adj_ref.shape[0]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for c in range(C):  # static channel loop — C is small (1..7)
        hw = (
            jnp.dot(
                x_ref[:], w_ref[c], preferred_element_type=jnp.float32
            )
            + b_ref[c][None, :]
        )
        acc_ref[:] += jnp.dot(
            adj_ref[c], hw, preferred_element_type=jnp.float32
        )
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _gconv_call(adj, x, w, b, *, tile_n: int, tile_f: int):
    C, B, N, _ = adj.shape
    Fin = x.shape[-1]
    Fout = w.shape[-1]
    grid = (B, N // tile_n, Fout // tile_f)

    return pl.pallas_call(
        _gconv_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (C, None, tile_n, N), lambda b_, i, j: (0, b_, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, N, Fin), lambda b_, i, j: (b_, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (C, Fin, tile_f), lambda b_, i, j: (0, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (C, tile_f), lambda b_, i, j: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, tile_n, tile_f), lambda b_, i, j: (b_, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, Fout), x.dtype),
        scratch_shapes=[pltpu.VMEM((tile_n, tile_f), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * C * B * N * (Fin * Fout // (N // tile_n) + N * Fout),
            bytes_accessed=4 * (C * B * N * N + B * N * (Fin + Fout)),
            transcendentals=0,
        ),
    )(adj, x, w, b)


def _pad_last(arr, axis: int, to: int):
    pad = to - arr.shape[axis]
    if pad <= 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths)


@partial(jax.custom_vjp, nondiff_argnums=())
def gconv_fused(adj, x, w, b):
    """``Σ_c A_c (X W_c + b_c)`` fused; see module docstring."""
    return _gconv_forward(adj, x, w, b)


def _gconv_forward(adj, x, w, b):
    C, B, N, _ = adj.shape
    Fin, Fout = w.shape[1], w.shape[2]
    # lane-pad so MXU tiles are full; slices undone at the end
    N_p = _round_up(N, 128)
    Fi_p = _round_up(Fin, 128)
    Fo_p = _round_up(Fout, 128)
    adj_p = _pad_last(_pad_last(adj, 2, N_p), 3, N_p)
    x_p = _pad_last(_pad_last(x, 1, N_p), 2, Fi_p)
    w_p = _pad_last(_pad_last(w, 1, Fi_p), 2, Fo_p)
    b_p = _pad_last(b, 1, Fo_p)
    # tiles must DIVIDE the padded dims — the grid uses floor division, so a
    # 384-row buffer with tile 256 would silently never write rows 256..383
    tile_n = 256 if N_p % 256 == 0 else 128
    tile_f = 256 if Fo_p % 256 == 0 else 128
    tile_n = min(N_p, tile_n)
    tile_f = min(Fo_p, tile_f)
    out = _gconv_call(adj_p, x_p, w_p, b_p, tile_n=tile_n, tile_f=tile_f)
    return out[:, :N, :Fout]


def _fwd(adj, x, w, b):
    return _gconv_forward(adj, x, w, b), (adj, x, w, b)


def _bwd(res, g):
    """Backward in XLA einsums (each is a single fused batched matmul):
    dX = Σ_c A_cᵀ g W_cᵀ ; dW_c = Σ_b X_bᵀ (A_cᵀ g) ; db_c = Σ A_cᵀ g ;
    dA[c,b,n,m] = g[b,n,:] · (X_b W_c + b_c)[m,:] — the SDDMM shape that the
    reference's registered bspmm gradient computes sparsely
    (kgcn/bspmm_call.py:49-54)."""
    adj, x, w, b = res
    at_g = jnp.einsum("cbnm,bnf->cbmf", adj, g)
    dx = jnp.einsum("cbmf,cof->bmo", at_g, w)
    dw = jnp.einsum("bmi,cbmf->cif", x, at_g)
    db = jnp.sum(at_g, axis=(1, 2))
    hw = jnp.einsum("bmi,cif->cbmf", x, w) + b[:, None, None, :]
    dadj = jnp.einsum("bnf,cbmf->cbnm", g, hw)
    return dadj, dx, dw, db


gconv_fused.defvjp(_fwd, _bwd)
