"""Sparse×dense matmul primitives over packed COO edge lists.

These are the TPU-native equivalents of the reference's native ops
(``bspmm.so`` / ``bconv.so`` / ``batched.so``, reference: kgcn/bspmm_call.py,
kgcn/bconv_call.py, kgcn/batched_call.py).  Semantics:

* :func:`spmm`              — ``out[r] = Σ_e w_e · x[s_e]`` for one edge list
                              (Bspmm / Bspmdt block-diagonal semantics:
                              kgcn/batched_call.py:17-26).
* :func:`spmm_multichannel` — per-channel spmm summed over channels
                              (Bconv semantics: kgcn/bconv_call.py:6-21, the
                              channel `addn` inferred at :46).
* :func:`sddmm`             — sampled dense-dense matmul
                              ``out_e = Σ_f a[r_e, f] · b[s_e, f]`` — the
                              values-gradient pattern of the reference's
                              registered bspmm gradient
                              (kgcn/bspmm_call.py:49-54).

Two execution backends share this API:

* ``xla``    — gather → scale → ``segment_sum`` scatter.  XLA compiles this to
               sorted-scatter code; it is the portable baseline and the
               autodiff path (JAX differentiates gather/scatter natively and
               the resulting VJP *is* the transpose-spmm + sddmm pair).
* ``pallas`` — hand-written blocked kernel (kgcn_tpu/ops/pallas_spmm.py) with
               a custom VJP; used on TPU for large edge lists.

Backend selection mirrors the reference's ``--bspmm`` flag architecture
(kgcn/layers.py:19-29) but defaults to the fast path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_BACKEND = "xla"


def set_backend(name: str) -> None:
    global _BACKEND
    assert name in ("xla", "pallas", "tiled", "stream"), name
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


_PALLAS_FALLBACK_WARNED = [False]


def _warn_pallas_fallback() -> None:
    if not _PALLAS_FALLBACK_WARNED[0]:
        _PALLAS_FALLBACK_WARNED[0] = True
        print(
            "[spmm] pallas backend requested but no static max_degree is "
            "available on the COO path under jit — using the XLA scatter "
            "path (identical results); the Pallas kernel engages on the ELL "
            "path when the dataset's degree layout qualifies"
        )


def spmm(senders, receivers, weights, x, num_nodes: int, backend: str | None = None,
         max_degree: int | None = None, tiled=None, stream=None):
    """``out[r] = Σ_{e: receivers[e]=r} weights[e] * x[senders[e]]``.

    senders/receivers: [E] int32, weights: [E], x: [V, F] → [num_nodes, F].
    Padding edges must carry weight 0 (then their contribution vanishes).
    ``tiled``: optional prebuilt :class:`~kgcn_tpu.ops.tiled_spmm.TiledCOO`
    for the same edge list — used by the ``tiled`` backend (the Pallas
    one-hot MXU kernel; built host-side via ``build_tiled``).
    ``stream``: optional prebuilt
    :class:`~kgcn_tpu.ops.stream_spmm.StreamCOO` — the ``stream`` backend
    (scattered big-graph kernel; built host-side via ``build_stream``).
    When the structure carries baked static weights the call is weight-free;
    otherwise the given edge-order weights are realigned with row-takes.
    """
    backend = backend or _BACKEND
    if backend == "stream" and stream is not None:
        from kgcn_tpu.ops.stream_spmm import stream_spmm, stream_spmm_edges

        if stream.w_slots is not None and weights is None:
            # baked static-weight fast path: caller opted in by passing
            # weights=None (layers do this when the GraphBatch carries a
            # stream structure baked from its own edge weights)
            return stream_spmm(stream, x=x).astype(x.dtype)
        # runtime (possibly learned/per-step) weights: always honour them —
        # a baked structure must never shadow dynamic weights silently
        if weights is None:
            raise ValueError(
                "stream structure has no baked weights (w_slots is None) "
                "and no runtime weights were given — build the structure "
                "with weights=... or pass weights to spmm()"
            )
        return stream_spmm_edges(stream, weights, x).astype(x.dtype)
    if backend == "tiled" and tiled is not None:
        from kgcn_tpu.ops.tiled_spmm import tiled_spmm

        return tiled_spmm(tiled, weights, x).astype(x.dtype)
    if backend == "pallas":
        from kgcn_tpu.ops.pallas_spmm import spmm_pallas

        return spmm_pallas(senders, receivers, weights, x, num_nodes,
                           max_degree=max_degree)
    gathered = x[senders] * weights[:, None].astype(x.dtype)
    return jax.ops.segment_sum(gathered, receivers, num_segments=num_nodes)


def spmm_multichannel(
    senders, receivers, weights, x, num_nodes: int, backend: str | None = None,
    max_degree: int | None = None, tiled=None, stream=None,
):
    """Channel-summed spmm: ``out[r] = Σ_c Σ_e w[c,e] · x_c[s[c,e]]``.

    senders/receivers/weights: [C, E]; x: [C, V, F] (per-channel features, the
    Bconv layout where each channel has its own projected features) or [V, F]
    (shared features).  Returns [num_nodes, F].  ``tiled``: optional tuple of
    per-channel prebuilt TiledCOO structures (the ``tiled`` backend);
    ``stream``: tuple of per-channel StreamCOO (the ``stream`` backend).
    """
    backend = backend or _BACKEND
    C, E = senders.shape
    if backend == "stream" and stream is not None:
        out = None
        for c in range(C):  # C is small and static
            xc = x[c] if x.ndim == 3 else x
            wc = None if weights is None else weights[c]
            o = spmm(senders[c], receivers[c], wc, xc, num_nodes,
                     backend="stream", stream=stream[c])
            out = o if out is None else out + o
        return out.astype(x.dtype)
    if backend == "tiled" and tiled is not None:
        from kgcn_tpu.ops.tiled_spmm import tiled_spmm

        out = None
        for c in range(C):  # C is small and static
            xc = x[c] if x.ndim == 3 else x
            o = tiled_spmm(tiled[c], weights[c], xc)
            out = o if out is None else out + o
        return out.astype(x.dtype)
    if x.ndim == 2:
        x = jnp.broadcast_to(x[None], (C, *x.shape))
    # Flatten channels into one edge list; segment ids stay node indices so a
    # single scatter accumulates the channel sum — one fused XLA scatter
    # instead of C sequential ones.
    flat_x = x.reshape(C * x.shape[1], x.shape[2])
    offs = (jnp.arange(C, dtype=senders.dtype) * x.shape[1])[:, None]
    flat_senders = (senders + offs).reshape(-1)
    flat_receivers = receivers.reshape(-1)
    flat_weights = weights.reshape(-1)
    if backend == "pallas":
        if max_degree is None and isinstance(receivers, jax.core.Tracer):
            # no host-visible degrees under jit and no explicit bound: the
            # correct XLA path (identical math) beats a guessed cap that
            # would silently drop edges
            _warn_pallas_fallback()
        else:
            # per-channel kernel calls — the flattened [C·V, F] features
            # would violate spmm_ell_pallas's x.rows == num_nodes invariant
            # (channel ≥ 1 sender ids would gather past the VMEM block)
            out = None
            for c in range(C):
                o = spmm(senders[c], receivers[c], weights[c], x[c],
                         num_nodes, backend="pallas", max_degree=max_degree)
                out = o if out is None else out + o
            return out
    gathered = flat_x[flat_senders] * flat_weights[:, None].astype(flat_x.dtype)
    return jax.ops.segment_sum(gathered, flat_receivers, num_segments=num_nodes)


def ell_aggregate(ell_senders, ell_weights, x, backend: str | None = None):
    """Channel-summed ELL aggregation ``out[v] = Σ_c Σ_k w[c,v,k]·x_c[i[c,v,k]]``.

    ell_senders/ell_weights: [C, V, K]; x: [C, V, F] or [V, F] (shared).
    Dispatches to the Pallas VMEM-resident kernel (with its custom VJP) when
    the ``pallas`` backend is selected and lowers on this platform; otherwise
    the XLA gather+einsum path (identical math).
    """
    backend = backend or _BACKEND
    C = ell_senders.shape[0]
    if backend == "pallas":
        from kgcn_tpu.ops.pallas_spmm import (
            VMEM_X_BUDGET_BYTES, _kernel_supported, spmm_ell_ad,
        )

        V = ell_senders.shape[1]
        F = x.shape[-1]
        fits = V * (((F + 127) // 128) * 128) * 4 <= VMEM_X_BUDGET_BYTES
        if fits and _kernel_supported():
            out = None
            for c in range(C):  # C is small and static
                xc = x[c] if x.ndim == 3 else x
                o = spmm_ell_ad(ell_senders[c], ell_weights[c], xc)
                out = o if out is None else out + o
            return out
    if x.ndim == 3:
        gathered = jax.vmap(lambda h, i: h[i])(x, ell_senders)  # [C, V, K, F]
    else:
        gathered = x[ell_senders]
    return jnp.einsum("cvk,cvkf->vf", ell_weights.astype(x.dtype), gathered)


def sddmm(senders, receivers, a, b):
    """Per-edge inner products: ``out[e] = Σ_f a[receivers[e], f] * b[senders[e], f]``.

    The values-gradient of spmm (reference gradient: kgcn/bspmm_call.py:49-54)
    and the edge-logit kernel for GAT-style attention.
    """
    return jnp.einsum("ef,ef->e", a[receivers], b[senders])


def spmm_dense(adj, x):
    """Dense-adjacency aggregation for small padded graphs.

    ``adj``: [C, B, N, N], ``x``: [C, B, N, F] (or [B, N, F] shared) →
    [B, N, F] summed over channels.  One batched matmul — lands on the MXU,
    which for molecular graph sizes (N ≤ ~256) beats any scatter path.
    """
    if x.ndim == 3:
        return jnp.einsum("cbnm,bmf->bnf", adj, x)
    return jnp.einsum("cbnm,cbmf->bnf", adj, x)


def gconv_dense(adj, x, w, b):
    """Fused dense multi-channel GraphConv ``Σ_c A_c (X W_c + b_c)``.

    One three-operand einsum (XLA contracts it without materialising the
    [C,B,N,F] intermediate — measured at HBM roofline on TPU) plus the bias
    term folded analytically: ``Σ_c A_c 1 b_cᵀ = (Σ_m A_c[:,m]) ⊗ b_c``.
    adj [C,B,N,N], x [B,N,Fi], w [C,Fi,Fo], b [C,Fo] → [B,N,Fo].
    """
    main = jnp.einsum("cbnm,bmi,cif->bnf", adj, x, w)
    bias = jnp.einsum("cbn,cf->bnf", jnp.sum(adj, axis=-1), b)
    return main + bias
