"""Pallas ELL spmm kernel (interpret mode on CPU)."""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl


def test_pallas_ell_spmm_matches_coo():
    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        from kgcn_tpu.ops.pallas_spmm import spmm_pallas
        from kgcn_tpu.ops.spmm import spmm

        rng = np.random.RandomState(0)
        V, E, F = 64, 300, 16
        s = jnp.asarray(rng.randint(0, V, E).astype(np.int32))
        r = jnp.asarray(rng.randint(0, V, E).astype(np.int32))
        w = jnp.asarray((rng.random_sample(E) + 0.1).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32))
        want = spmm(s, r, w, x, V)
        got = spmm_pallas(s, r, w, x, V)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
    finally:
        pl.pallas_call = orig


def test_coo_to_ell_device_roundtrip():
    from kgcn_tpu.ops.ell import spmm_ell
    from kgcn_tpu.ops.pallas_spmm import coo_to_ell_device
    from kgcn_tpu.ops.spmm import spmm

    rng = np.random.RandomState(1)
    V, E, F = 32, 120, 8
    s = jnp.asarray(rng.randint(0, V, E).astype(np.int32))
    r = jnp.asarray(rng.randint(0, V, E).astype(np.int32))
    w = jnp.asarray((rng.random_sample(E) + 0.1).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32))
    deg = np.zeros(V, np.int64)
    np.add.at(deg, np.asarray(r), 1)
    idx, wv = coo_to_ell_device(s, r, w, x.shape[0], int(deg.max()))
    out = spmm_ell(idx, wv, x)
    want = spmm(s, r, w, x, V)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_vmem_fallback_path():
    from kgcn_tpu.ops import pallas_spmm
    from kgcn_tpu.ops.spmm import spmm

    rng = np.random.RandomState(2)
    V, E, F = 64, 200, 8
    s = jnp.asarray(rng.randint(0, V, E).astype(np.int32))
    r = jnp.asarray(rng.randint(0, V, E).astype(np.int32))
    w = jnp.asarray((rng.random_sample(E) + 0.1).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((V, F)).astype(np.float32))
    old = pallas_spmm.VMEM_X_BUDGET_BYTES
    pallas_spmm.VMEM_X_BUDGET_BYTES = 1  # force fallback
    try:
        got = pallas_spmm.spmm_pallas(s, r, w, x, V)
    finally:
        pallas_spmm.VMEM_X_BUDGET_BYTES = old
    want = spmm(s, r, w, x, V)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
