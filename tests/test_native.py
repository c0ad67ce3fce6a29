"""Native C++ batch assembler tests (built on demand with g++)."""
import numpy as np
import pytest

from kgcn_tpu import native


@pytest.fixture(scope="module", autouse=True)
def _built():
    if not native.available(build=True):
        pytest.skip("native library could not be built")


def test_crc32c_matches_python():
    from kgcn_tpu.data.tfrecord import crc32c as py_crc

    for data in (b"", b"123456789", b"\x00" * 32, bytes(range(256))):
        assert native.crc32c(data) == py_crc(data)


def test_pack_edges_matches_python_batcher():
    from kgcn_tpu.data import Batcher, build_dataset
    from kgcn_tpu.data.synthetic import make_random_graphs

    data = make_random_graphs(12, 7, 5, num_channels=2, seed=3)
    ds, info = build_dataset(data, {})
    b = Batcher(ds, info, batch_size=8, seed=0)
    assert b._native is not None, "native path not active"
    idx = np.array([3, 1, 7, 9, 11])
    nat = b.make_batch(idx)
    # force the python path
    b._native = None
    ref = b.make_batch(idx)
    for field in ("senders", "receivers", "edge_weights", "n_edge",
                  "n_node", "node_mask"):
        np.testing.assert_array_equal(
            np.asarray(getattr(nat.graph, field)),
            np.asarray(getattr(ref.graph, field)),
            err_msg=field,
        )
    np.testing.assert_allclose(
        np.asarray(nat.graph.nodes), np.asarray(ref.graph.nodes)
    )
    np.testing.assert_array_equal(
        np.asarray(nat.labels), np.asarray(ref.labels)
    )


def test_native_batcher_trains():
    from kgcn_tpu.data import Batcher, build_dataset
    from kgcn_tpu.data.synthetic import make_ring_dataset
    from kgcn_tpu.models.registry import build_model
    from kgcn_tpu.runtime.config import default_config
    from kgcn_tpu.runtime.train import Trainer

    cfg = default_config()
    cfg.update({"task": "classification", "save_interval": 0,
                "normalize_adj_flag": True})
    ds, info = build_dataset(make_ring_dataset(num_pairs=10, seed=0), cfg)
    b = Batcher(ds, info, 10, seed=0)
    assert b._native is not None
    model = build_model("gcn", info, cfg)
    t = Trainer(model, cfg, info)
    state = t.init_state(b.make_batch(np.arange(10)), seed=0)
    state, cost, _, _ = t.run_epoch(state, b)
    assert np.isfinite(cost)


def test_gather_pad_features():
    feats = np.random.RandomState(0).standard_normal((5, 4, 3)).astype(np.float32)
    out = native.gather_pad_features(feats, np.array([4, 0, 2]), 6)
    assert out.shape == (6, 4, 3)
    np.testing.assert_array_equal(out[0], feats[4])
    np.testing.assert_array_equal(out[1], feats[0])
    np.testing.assert_array_equal(out[2], feats[2])
    assert (out[3:] == 0).all()
