"""Neighbour-sampled subgraph batching tests."""
import jax
import numpy as np
import pytest

from kgcn_tpu.data.sampling import NeighborSampler


def _chain_graph(V=30):
    """Path graph with self loops: i <-> i+1."""
    rows, cols = [], []
    for i in range(V):
        rows.append(i); cols.append(i)
        if i + 1 < V:
            rows += [i, i + 1]; cols += [i + 1, i]
    r = np.asarray(rows, np.int32); c = np.asarray(cols, np.int32)
    return [(r, c, np.ones(len(r), np.float32))], V


def test_sample_nodes_within_hops():
    adjs, V = _chain_graph()
    s = NeighborSampler(adjs, V, fanout=5, hops=2, seed=0)
    nodes = s.sample_nodes(10)
    assert 10 in nodes
    assert all(abs(int(n) - 10) <= 2 for n in nodes)  # 2-hop radius on a path
    assert set(nodes) == {8, 9, 10, 11, 12}


def test_sample_batch_static_shapes_and_seed_position():
    adjs, V = _chain_graph()
    s = NeighborSampler(adjs, V, fanout=3, hops=2, seed=0)
    feats = np.arange(V, dtype=np.float32)[:, None].repeat(4, 1)
    batch, gids = s.sample_batch([5, 20, 29], features=feats, node_budget=8)
    assert batch.n_graph == 3 and batch.max_nodes == 8
    # the seed is local node 0 of each subgraph
    assert list(gids[:, 0]) == [5, 20, 29]
    nb = np.asarray(batch.nodes_batched())
    np.testing.assert_allclose(nb[0, 0], feats[5])
    np.testing.assert_allclose(nb[2, 0], feats[29])
    # second call with same budgets has identical shapes (compile once)
    b2, _ = s.sample_batch([1, 2, 3], features=feats, node_budget=8,
                           edge_budget=batch.edge_budget)
    assert b2.senders.shape == batch.senders.shape


def test_sampled_subgraph_aggregation_correct():
    """Aggregation over a sampled subgraph == full-graph aggregation when the
    fanout covers all neighbours (path graph degree ≤ 3 < fanout)."""
    import jax.numpy as jnp

    from kgcn_tpu.ops.spmm import spmm

    adjs, V = _chain_graph()
    feats = np.random.RandomState(0).standard_normal((V, 4)).astype(np.float32)
    s = NeighborSampler(adjs, V, fanout=5, hops=1, seed=0)
    batch, gids = s.sample_batch([10], features=feats)
    out = spmm(batch.senders[0], batch.receivers[0], batch.edge_weights[0],
               batch.nodes, batch.total_nodes)
    # full-graph aggregation at node 10
    r, c, v = adjs[0]
    full = np.zeros((V, 4), np.float32)
    np.add.at(full, r, v[:, None] * feats[c])
    np.testing.assert_allclose(np.asarray(out)[0], full[10], rtol=1e-5)


def test_embedding_mode_sampling():
    adjs, V = _chain_graph()
    s = NeighborSampler(adjs, V, fanout=3, hops=1, seed=0)
    batch, gids = s.sample_batch([0, 15])
    assert batch.nodes is None and batch.node_ids is not None
    ids = np.asarray(batch.node_ids).reshape(2, -1)
    assert ids[0, 0] == 0 and ids[1, 0] == 15


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from kgcn_tpu.runtime import checkpoint as ckpt

    tree = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
            "step": jnp.asarray(7)}
    try:
        path = ckpt.save_checkpoint(str(tmp_path / "orbax_ckpt"), tree,
                                    fmt="orbax")
    except Exception as e:
        import pytest

        pytest.skip(f"orbax unavailable/incompatible: {e}")
    back = ckpt.load_checkpoint(path, jax.device_get(tree))
    np.testing.assert_allclose(np.asarray(back["params"]["w"]),
                               np.arange(6.0).reshape(2, 3))
    assert int(back["step"]) == 7


def test_shard_for_host():
    from kgcn_tpu.data import build_dataset
    from kgcn_tpu.data.dataset import shard_for_host
    from kgcn_tpu.data.synthetic import make_ring_dataset

    ds, info = build_dataset(make_ring_dataset(num_pairs=10, seed=0), {})
    shards = [shard_for_host(ds, h, 4) for h in range(4)]
    assert sum(s.num for s in shards) == 20
    assert shards[0].num == 5 and shards[3].num == 5
