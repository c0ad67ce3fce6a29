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
        # the compile probe ran under the interpret patch — clear its cache
        # so later tests re-probe against the real backend
        from kgcn_tpu.ops import pallas_spmm

        pallas_spmm._KERNEL_OK.clear()


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


def test_spmm_ell_ad_gradients_match_xla():
    """The Pallas ELL op's custom VJP must equal the XLA path's autodiff."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kgcn_tpu.ops.ell import spmm_ell
    from kgcn_tpu.ops.pallas_spmm import _kernel_supported, spmm_ell_ad

    rng = np.random.RandomState(0)
    V, K, F = 32, 4, 16
    idx = jnp.asarray(rng.randint(0, V, (V, K)).astype(np.int32))
    w = jnp.asarray(rng.rand(V, K).astype(np.float32))
    x = jnp.asarray(rng.randn(V, F).astype(np.float32))

    def loss_ref(w_, x_):
        return jnp.sum(jnp.sin(spmm_ell(idx, w_, x_)))

    impl = spmm_ell_ad if _kernel_supported() else spmm_ell

    def loss_pl(w_, x_):
        return jnp.sum(jnp.sin(impl(idx, w_, x_)))

    gref = jax.grad(loss_ref, argnums=(0, 1))(w, x)
    gpl = jax.grad(loss_pl, argnums=(0, 1))(w, x)
    np.testing.assert_allclose(gpl[0], gref[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gpl[1], gref[1], rtol=1e-5, atol=1e-5)


def test_spmm_pallas_traced_without_max_degree_raises():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from kgcn_tpu.ops.spmm import spmm

    s = np.zeros(8, np.int32)
    r = np.arange(8, dtype=np.int32) % 4
    w = jnp.ones(8, jnp.float32)
    x = jnp.ones((8, 8), jnp.float32)

    # fully-traced topology: must error, not silently cap the degree
    f = jax.jit(lambda s_, r_, w_: spmm(s_, r_, w_, x, 8, backend="pallas"))
    with pytest.raises(ValueError, match="max_degree"):
        f(jnp.asarray(s), jnp.asarray(r), w)

    # concrete topology captured OUTSIDE the trace + traced weights:
    # safe overestimated degree, runs
    sj, rj = jnp.asarray(s), jnp.asarray(r)
    g = jax.grad(lambda w_: spmm(sj, rj, w_, x, 8,
                                 backend="pallas").sum())
    gx = jax.grad(lambda w_: spmm(sj, rj, w_, x, 8, backend="xla").sum())
    np.testing.assert_allclose(g(w), gx(w), rtol=1e-5, atol=1e-5)


def test_ell_aggregate_backend_parity():
    import jax.numpy as jnp
    import numpy as np

    from kgcn_tpu.ops.spmm import ell_aggregate

    rng = np.random.RandomState(1)
    C, V, K, F = 2, 24, 3, 8
    idx = jnp.asarray(rng.randint(0, V, (C, V, K)).astype(np.int32))
    w = jnp.asarray(rng.rand(C, V, K).astype(np.float32))
    x = jnp.asarray(rng.randn(V, F).astype(np.float32))
    a_xla = ell_aggregate(idx, w, x, backend="xla")
    a_pl = ell_aggregate(idx, w, x, backend="pallas")
    np.testing.assert_allclose(a_pl, a_xla, rtol=1e-5, atol=1e-5)
    x3 = jnp.asarray(rng.randn(C, V, F).astype(np.float32))
    np.testing.assert_allclose(
        ell_aggregate(idx, w, x3, backend="pallas"),
        ell_aggregate(idx, w, x3, backend="xla"), rtol=1e-5, atol=1e-5)
