"""Helpers shared by the Pallas kernel families (tiled_spmm, stream_spmm).

Kept in one place so platform detection and the Mosaic precision workaround
cannot drift between the kernels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def interpret_mode() -> bool:
    """Pallas interpret mode everywhere but on a real TPU backend."""
    return jax.default_backend() != "tpu"


def kernel_precision(cdt):
    """Explicit kernel matmul precision: HIGHEST for the f32 escape hatch
    (DEFAULT would silently run single-pass bf16 on the MXU), DEFAULT for
    bf16 payloads.  Always explicit — inheriting the global
    jax_default_matmul_precision inside Mosaic can fail to lower
    ("Bad lhs type" observed under the test suite's "highest")."""
    return (jax.lax.Precision.HIGHEST if jnp.dtype(cdt) == jnp.float32
            else jax.lax.Precision.DEFAULT)
