import numpy as np
import jax.numpy as jnp
import pytest

from kgcn_tpu.graph.batch import GraphBatch, batch_graphs, pad_edge_budget
from kgcn_tpu.graph import transforms
from kgcn_tpu.ops import spmm, spmm_multichannel, sddmm
from kgcn_tpu.ops.spmm import spmm_dense


def _toy_batch(seed=0, B=3, N=4, F=5, C=2):
    rng = np.random.RandomState(seed)
    adjs, feats, dense = [], [], np.zeros((C, B, N, N), np.float32)
    for g in range(B):
        chans = []
        for c in range(C):
            a = (rng.random_sample((N, N)) < 0.5).astype(np.float32)
            a *= rng.random_sample((N, N)).astype(np.float32)
            dense[c, g] = a
            row, col = np.nonzero(a)
            chans.append(
                (np.stack([row, col], 1).astype(np.int32), a[row, col], (N, N))
            )
        adjs.append(chans)
    feats = rng.standard_normal((B, N, F)).astype(np.float32)
    gb = batch_graphs(adjs, feats, N)
    return gb, dense, feats


def test_shapes_and_masks():
    gb, dense, feats = _toy_batch()
    assert gb.total_nodes == 12
    assert gb.senders.shape == gb.receivers.shape == gb.edge_weights.shape
    assert gb.edge_budget % 128 == 0
    np.testing.assert_array_equal(np.asarray(gb.n_node), [4, 4, 4])
    assert np.asarray(gb.node_mask).sum() == 12
    # edge mask counts valid edges
    em = np.asarray(gb.edge_mask())
    np.testing.assert_array_equal(em.sum(axis=1), np.asarray(gb.n_edge))


def test_dense_adjacency_roundtrip():
    gb, dense, _ = _toy_batch()
    got = np.asarray(gb.dense_adjacency())
    np.testing.assert_allclose(got, dense, rtol=1e-6)


def test_spmm_matches_dense():
    gb, dense, feats = _toy_batch()
    B, N, F = feats.shape
    x = jnp.asarray(feats.reshape(B * N, F))
    for c in range(dense.shape[0]):
        out = spmm(gb.senders[c], gb.receivers[c], gb.edge_weights[c], x, B * N)
        want = np.einsum("bnm,bmf->bnf", dense[c], feats).reshape(B * N, F)
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)


def test_spmm_multichannel_matches_dense_sum():
    gb, dense, feats = _toy_batch()
    B, N, F = feats.shape
    x = jnp.asarray(feats.reshape(B * N, F))
    out = spmm_multichannel(
        gb.senders, gb.receivers, gb.edge_weights, x, B * N
    )
    want = np.einsum("cbnm,bmf->bnf", dense, feats).reshape(B * N, F)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)
    # and the dense MXU path agrees
    out_d = spmm_dense(gb.dense_adjacency(), jnp.asarray(feats))
    np.testing.assert_allclose(
        np.asarray(out_d).reshape(B * N, F), want, rtol=1e-5, atol=1e-5
    )


def test_sddmm_is_spmm_value_grad():
    gb, dense, feats = _toy_batch()
    B, N, F = feats.shape
    x = jnp.asarray(feats.reshape(B * N, F))
    import jax

    c = 0
    g = np.random.RandomState(1).standard_normal((B * N, F)).astype(np.float32)

    def f(w):
        out = spmm(gb.senders[c], gb.receivers[c], w, x, B * N)
        return jnp.sum(out * g)

    got = jax.grad(f)(gb.edge_weights[c])
    want = sddmm(gb.senders[c], gb.receivers[c], jnp.asarray(g), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_partial_batch_padding():
    gb, dense, feats = _toy_batch()
    # re-batch 2 graphs into a batch of 4
    rng = np.random.RandomState(0)
    adjs = [
        [
            (
                np.array([[0, 1], [1, 0]], np.int32),
                np.ones(2, np.float32),
                (4, 4),
            )
        ]
        for _ in range(2)
    ]
    feats2 = rng.standard_normal((2, 4, 3)).astype(np.float32)
    gb2 = batch_graphs(adjs, feats2, 4, n_graph=4)
    assert gb2.n_graph == 4 and gb2.total_nodes == 16
    assert np.asarray(gb2.n_node)[2:].sum() == 0
    assert np.asarray(gb2.mask_batched())[2:].sum() == 0


def test_normalize_adj_kipf():
    # path graph 0-1-2 with self loops
    row = np.array([0, 0, 1, 1, 1, 2, 2], np.int32)
    col = np.array([0, 1, 0, 1, 2, 1, 2], np.int32)
    val = np.ones(7, np.float32)
    r, c, v = transforms.normalize_adj(row, col, val, 3)
    A = np.zeros((3, 3))
    A[r, c] = v
    deg = np.array([2.0, 3.0, 2.0])
    want = np.zeros((3, 3))
    dense = np.zeros((3, 3))
    dense[row, col] = 1.0
    want = dense / np.sqrt(deg)[:, None] / np.sqrt(deg)[None, :]
    np.testing.assert_allclose(A, want, rtol=1e-6)


def test_high_order_adj():
    # path 0-1-2: A^2 reaches two hops
    row = np.array([0, 1, 1, 2], np.int32)
    col = np.array([1, 0, 2, 1], np.int32)
    val = np.ones(4, np.float32)
    r, c, v = transforms.high_order_adj(row, col, val, 3, 2)
    A2 = np.zeros((3, 3))
    A2[r, c] = v
    want = np.array([[1, 0, 1], [0, 1, 0], [1, 0, 1]], np.float32)
    np.testing.assert_array_equal(A2, want)


def test_split_adj_channels():
    row = np.array([0, 0, 0, 1, 1, 2], np.int32)
    col = np.array([0, 1, 2, 0, 1, 2], np.int32)
    val = np.ones(6, np.float32)
    chans = transforms.split_adj(row, col, val, 3, min_deg=1, max_deg=2)
    assert len(chans) == 3  # 2 degree bins + self channel
    total = sum(len(r) for (r, c2, v2) in chans)
    assert total == 6
    # self-loop channel holds exactly the diagonal entries
    r_self, c_self, _ = chans[-1]
    assert np.all(r_self == c_self) and len(r_self) == 3


def test_pad_edge_budget():
    assert pad_edge_budget(1) == 128
    assert pad_edge_budget(128) == 128
    assert pad_edge_budget(129) == 256


def test_batch_graphs_rejects_out_of_range_indices():
    """An oversized molecule must raise, not bleed edges into the next
    graph's block (serving pins max_nodes to the first request's contract)."""
    import numpy as np
    import pytest

    from kgcn_tpu.graph.batch import batch_graphs

    indices = np.array([[0, 5], [5, 0]], np.int32)  # node 5 >= max_nodes 4
    val = np.ones(2, np.float32)
    feats = np.zeros((1, 4, 3), np.float32)
    feats[0, :2] = 1.0
    with pytest.raises(ValueError, match="max_nodes"):
        batch_graphs([[(indices, val, (6, 6))]], feats, max_nodes=4)
