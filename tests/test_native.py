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


def _make_tfrecord(tmp_path, n_rec=20, seed=0):
    from kgcn_tpu.data import tfrecord as tfr

    rng = np.random.RandomState(seed)
    recs = []
    for _ in range(n_rec):
        n = rng.randint(3, 20)
        adj = (rng.rand(n, n) < 0.3).astype(np.float32)
        adj[0, 1] = adj[1, 0] = 1.0  # at least one edge
        feat = rng.standard_normal((n, 5)).astype(np.float32)
        label = np.zeros(3, np.float32)
        label[rng.randint(3)] = 1
        recs.append(tfr.example_from_graph(adj, feat, label=label))
    path = str(tmp_path / "t.tfrecords")
    tfr.write_tfrecord(path, recs)
    return path


def test_native_tfrecord_parse_matches_python_codec(tmp_path):
    """C++ parser (native/tfrecord.cpp) is bit-exact vs the Python codec,
    including CRC32C verification and packed varint/float decoding."""
    from kgcn_tpu.data import tfrecord as tfr

    if not native.available():
        pytest.skip("native library not built")
    path = _make_tfrecord(tmp_path)
    res = native.parse_tfrecord_arrays(path, tfr._SCHEMA_KEYS)
    if res is None:
        pytest.skip("tfrecord symbols missing from built library")
    i = 0
    for payload in tfr.read_tfrecord(path, verify_crc=True):
        ex = tfr.parse_example(payload)
        for k in tfr._SCHEMA_KEYS:
            if k not in ex:
                continue
            vals, off = res[k]
            got = vals[off[i]:off[i + 1]]
            assert got.dtype == ex[k].dtype
            np.testing.assert_array_equal(got, ex[k], err_msg=f"{k}[{i}]")
        i += 1
    assert i == 20


def test_native_tfrecord_negative_int64(tmp_path):
    """Negative int64 values round-trip through the 10-byte varint path."""
    from kgcn_tpu.data import tfrecord as tfr

    if not native.available():
        pytest.skip("native library not built")
    rec = tfr.build_example({
        "vals": np.asarray([-1, -(2**40), 0, 7, 2**50], np.int64),
        "f": np.asarray([1.5, -2.25], np.float32),
    })
    path = str(tmp_path / "neg.tfrecords")
    tfr.write_tfrecord(path, [rec])
    res = native.parse_tfrecord_arrays(path, ["vals", "f"])
    if res is None:
        pytest.skip("tfrecord symbols missing from built library")
    np.testing.assert_array_equal(
        res["vals"][0], np.asarray([-1, -(2**40), 0, 7, 2**50], np.int64)
    )
    np.testing.assert_array_equal(
        res["f"][0], np.asarray([1.5, -2.25], np.float32)
    )


def test_native_tfrecord_detects_corruption(tmp_path):
    from kgcn_tpu.data import tfrecord as tfr

    if not native.available():
        pytest.skip("native library not built")
    path = _make_tfrecord(tmp_path, n_rec=3)
    raw = bytearray(open(path, "rb").read())
    raw[30] ^= 0xFF  # flip a payload byte
    bad = str(tmp_path / "bad.tfrecords")
    open(bad, "wb").write(bytes(raw))
    if native.parse_tfrecord_arrays(path, ["size"]) is None:
        pytest.skip("tfrecord symbols missing from built library")
    with pytest.raises(ValueError):
        native.parse_tfrecord_arrays(bad, ["size"])


def test_load_tfrecord_dataset_native_equals_python(tmp_path):
    from kgcn_tpu import native as nat
    from kgcn_tpu.data import tfrecord as tfr

    path = _make_tfrecord(tmp_path)
    ds_n, info_n = tfr.load_tfrecord_dataset(path)
    orig = nat.parse_tfrecord_arrays
    nat.parse_tfrecord_arrays = lambda *a, **k: None  # force Python codec
    try:
        ds_p, info_p = tfr.load_tfrecord_dataset(path)
    finally:
        nat.parse_tfrecord_arrays = orig
    np.testing.assert_array_equal(ds_n.features, ds_p.features)
    np.testing.assert_array_equal(np.asarray(ds_n.labels),
                                  np.asarray(ds_p.labels))
    np.testing.assert_array_equal(ds_n.enabled_node_nums,
                                  ds_p.enabled_node_nums)
    assert info_n.feature_dim == info_p.feature_dim
    for a, b in zip(ds_n.adjs, ds_p.adjs):
        for c1, c2 in zip(a, b):
            np.testing.assert_array_equal(np.asarray(c1[0]), np.asarray(c2[0]))
            np.testing.assert_allclose(np.asarray(c1[1]), np.asarray(c2[1]))


def test_native_rejects_adversarial_varint_lengths(tmp_path, _built):
    """A length-delimited field whose varint length is near 2^64 (valid
    framing CRC — CRC protects bytes, not proto well-formedness) must return
    a parse error, not read out of bounds."""
    from kgcn_tpu.data.tfrecord import _masked_crc
    import struct

    # proto payload: field 1, wire 2, length = 2^63 (huge varint), no data
    huge = (1 << 63)
    varint = b""
    v = huge
    while True:
        b7 = v & 0x7F
        v >>= 7
        varint += bytes([b7 | (0x80 if v else 0)])
        if not v:
            break
    payload = bytes([0x0A]) + varint  # tag(1,2) + huge length
    rec = struct.pack("<Q", len(payload))
    rec += struct.pack("<I", _masked_crc(rec[:8]))
    rec += payload
    rec += struct.pack("<I", _masked_crc(payload))
    p = tmp_path / "evil.tfrecords"
    p.write_bytes(rec)

    with pytest.raises(ValueError, match="malformed"):
        native.parse_tfrecord_arrays(str(p), ["feature"])

    # adversarial framing: 8-byte length near 2^63 must be "truncated", not
    # an overflowing pointer walk
    p2 = tmp_path / "evil_frame.tfrecords"
    frame = struct.pack("<Q", (1 << 62))
    frame += struct.pack("<I", _masked_crc(frame[:8]))
    frame += b"xx"
    p2.write_bytes(frame)
    with pytest.raises(ValueError, match="malformed"):
        native.parse_tfrecord_arrays(str(p2), ["feature"])


def test_native_pack_edges_rejects_out_of_range(_built):
    """Out-of-range node indices must error like the Python path, not bleed
    into the next graph's block."""
    rows = np.array([0, 5], np.int32)  # 5 >= max_nodes 4
    cols = np.array([1, 0], np.int32)
    vals = np.ones(2, np.float32)
    off = np.array([0], np.int64)
    ln = np.array([2], np.int64)
    with pytest.raises(RuntimeError, match="out of range"):
        native.pack_edges(rows, cols, vals, off, ln, 1, 1, 4, 128)
