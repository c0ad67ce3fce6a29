"""Edge-partitioned distributed SpMM tests (8 virtual CPU devices)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgcn_tpu.ops.spmm import spmm
from kgcn_tpu.parallel.edge_partition import partition_edges, spmm_edge_partitioned
from kgcn_tpu.parallel.mesh import make_mesh


def _random_graph(V=64, E=500, F=16, seed=0):
    rng = np.random.RandomState(seed)
    s = rng.randint(0, V, E).astype(np.int32)
    r = rng.randint(0, V, E).astype(np.int32)
    w = rng.random_sample(E).astype(np.float32) + 0.1
    x = rng.standard_normal((V, F)).astype(np.float32)
    return s, r, w, x


@pytest.mark.parametrize("strategy", ["allgather", "ring"])
@pytest.mark.parametrize("D", [2, 4, 8])
def test_partitioned_matches_single_device(strategy, D):
    V, E, F = 64, 500, 16
    s, r, w, x = _random_graph(V, E, F)
    want = np.asarray(spmm(jnp.asarray(s), jnp.asarray(r), jnp.asarray(w),
                           jnp.asarray(x), V))
    mesh = make_mesh({"data": D})
    part = partition_edges(s, r, w, V, D)
    got = np.asarray(
        spmm_edge_partitioned(part, jnp.asarray(x), mesh, strategy=strategy)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_partition_edges_grouping():
    V, D = 16, 4
    s = np.array([0, 5, 9, 15], np.int32)
    r = np.array([0, 0, 8, 12], np.int32)
    w = np.ones(4, np.float32)
    part = partition_edges(s, r, w, V, D)
    assert part.v_local == 4
    # edge (5→0): receiver block 0, sender block 1, offset (0-1)%4 = 3
    assert part.weights[0, 3].sum() == 1
    # edge (0→0): offset 0
    assert part.weights[0, 0].sum() == 1
    # edge (9→8): both block 2 → offset 0 at device 2
    assert part.weights[2, 0].sum() == 1
    # edge (15→12): both block 3
    assert part.weights[3, 0].sum() == 1


def test_partitioned_spmm_differentiable():
    """Gradients flow through the ring schedule (needed to train
    edge-partitioned GNNs)."""
    V, E, F, D = 32, 200, 8, 4
    s, r, w, x = _random_graph(V, E, F, seed=1)
    mesh = make_mesh({"data": D})
    part = partition_edges(s, r, w, V, D)

    def loss_dist(x):
        out = spmm_edge_partitioned(part, x, mesh, strategy="ring")
        return jnp.sum(out**2)

    def loss_ref(x):
        out = spmm(jnp.asarray(s), jnp.asarray(r), jnp.asarray(w), x, V)
        return jnp.sum(out**2)

    g1 = jax.grad(loss_dist)(jnp.asarray(x))
    g2 = jax.grad(loss_ref)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4,
                               atol=1e-4)
