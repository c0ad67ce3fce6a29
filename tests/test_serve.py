"""Serving runtime + HTTP server (runtime/serve.py, cli/serve.py)."""
import json
import urllib.request

import joblib
import numpy as np
import pytest

from kgcn_tpu.data import Batcher, build_dataset
from kgcn_tpu.data.synthetic import make_ring_dataset
from kgcn_tpu.runtime.config import default_config
from kgcn_tpu.runtime.serve import Predictor, payload_to_data


def _train_tiny(tmp_path, epochs=5):
    """Train a small GCN and return (config, data dict, reference preds)."""
    from kgcn_tpu.models.registry import build_model
    from kgcn_tpu.runtime.train import Trainer

    cfg = default_config()
    cfg.update({
        "model.py": "gcn", "task": "classification", "epoch": epochs,
        "batch_size": 10, "normalize_adj_flag": True,
        "save_model_path": str(tmp_path / "model"), "save_interval": 0,
        "label_dim": 2,
    })
    data = make_ring_dataset(num_pairs=20, num_nodes=10, seed=0)
    ds, info = build_dataset(data, cfg)
    model = build_model("gcn", info, cfg)
    trainer = Trainer(model, cfg, info)
    b = Batcher(ds, info, 10, seed=0)
    state = trainer.init_state(b.make_batch(np.arange(10)), seed=0)
    state, _ = trainer.fit(state, b, None)
    ev = trainer.evaluate(state, Batcher(ds, info, 10))
    return cfg, data, np.asarray(ev["prediction"])


def _payload_from(data):
    """jbl dict → JSON-safe payload (labels stripped: serving requests)."""
    return {
        "feature": np.asarray(data["feature"]).tolist(),
        "dense_adj": np.asarray(data["dense_adj"]).tolist(),
        "max_node_num": int(data["max_node_num"]),
    }


def test_payload_roundtrip():
    data = make_ring_dataset(num_pairs=4, num_nodes=8, seed=0)
    back = payload_to_data(_payload_from(data))
    np.testing.assert_allclose(back["feature"], np.asarray(data["feature"]))
    np.testing.assert_allclose(back["dense_adj"], np.asarray(data["dense_adj"]))
    # COO adjacency variant round-trips too
    coo = {
        "adj": [[[np.array([[0, 1], [1, 0]]), np.array([1.0, 1.0]),
                  (8, 8)]]],
    }
    payload = {
        "adj": [
            [[t[0].tolist(), t[1].tolist(), list(t[2])] for t in g]
            for g in coo["adj"]
        ]
    }
    back = payload_to_data(payload)
    assert back["adj"][0][0][2] == (8, 8)
    np.testing.assert_allclose(back["adj"][0][0][1], [1.0, 1.0])


def test_predictor_matches_trainer(tmp_path):
    cfg, data, ref_pred = _train_tiny(tmp_path)
    pred = Predictor(cfg)
    resp = pred.predict(_payload_from(data))
    assert resp["num"] == 40
    got = np.asarray(resp["prediction"])
    np.testing.assert_allclose(got, ref_pred, rtol=1e-5, atol=1e-6)
    # second request reuses the compiled executable (no rebuild)
    resp2 = pred.predict(_payload_from(data))
    np.testing.assert_allclose(np.asarray(resp2["prediction"]), got)
    assert pred.requests == 2 and pred.graphs_served == 80


def test_http_server_end_to_end(tmp_path):
    from kgcn_tpu.cli.serve import build_server

    cfg, data, ref_pred = _train_tiny(tmp_path)
    server, predictor = build_server(cfg, host="127.0.0.1", port=0)
    port = server.server_address[1]
    import threading

    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["ready"] is False

        body = json.dumps(_payload_from(data)).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            resp = json.loads(r.read())
        np.testing.assert_allclose(
            np.asarray(resp["prediction"]), ref_pred, rtol=1e-5, atol=1e-6
        )
        assert resp["latency_ms"] > 0

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["ready"] is True and health["requests"] == 1

        # malformed request → 400, server stays alive
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b'{"feature": "x"}',
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
    finally:
        server.shutdown()


def test_missing_checkpoint_is_503(tmp_path):
    from kgcn_tpu.cli.serve import build_server

    cfg = default_config()
    cfg.update({"model.py": "gcn", "task": "classification",
                "save_model_path": str(tmp_path / "nothing"),
                "label_dim": 2})
    server, _ = build_server(cfg, host="127.0.0.1", port=0)
    port = server.server_address[1]
    import threading

    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        data = make_ring_dataset(num_pairs=2, num_nodes=8, seed=0)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps(_payload_from(data)).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 503
    finally:
        server.shutdown()


def test_export_predictor(tmp_path):
    """Serving a jax.export StableHLO artifact (params baked in)."""
    from kgcn_tpu.models.registry import build_model
    from kgcn_tpu.runtime.export import export_model
    from kgcn_tpu.runtime.serve import ExportPredictor
    from kgcn_tpu.runtime.train import Trainer

    cfg, data, ref_pred = _train_tiny(tmp_path, epochs=2)
    ds, info = build_dataset(data, cfg)
    model = build_model("gcn", info, cfg)
    trainer = Trainer(model, cfg, info)
    b = Batcher(ds, info, 10)
    state = trainer.init_state(b.make_batch(np.arange(10)), seed=0)
    state = trainer.restore(state, str(tmp_path / "model/model.last.ckpt"))
    export_model(
        model, {"params": state.params, "batch_stats": state.batch_stats},
        b.make_batch(np.arange(10)), str(tmp_path / "exported.hlo"),
    )
    ep = ExportPredictor(str(tmp_path / "exported.hlo"), cfg)
    resp = ep.predict(_payload_from(data))
    assert resp["num"] == 40
    got = np.asarray(resp["prediction"])
    assert got.shape == (40, 2)
    np.testing.assert_allclose(got.sum(axis=1), 1.0, rtol=1e-5)


def test_export_predictor_infers_traced_batch(tmp_path):
    """The exported artifact's traced batch/node shape wins over config and
    request size (regression: requests smaller than the traced batch)."""
    from kgcn_tpu.models.registry import build_model
    from kgcn_tpu.runtime.export import export_model
    from kgcn_tpu.runtime.serve import ExportPredictor
    from kgcn_tpu.runtime.train import Trainer

    cfg, data, _ = _train_tiny(tmp_path, epochs=1)
    ds, info = build_dataset(data, cfg)
    model = build_model("gcn", info, cfg)
    trainer = Trainer(model, cfg, info)
    b = Batcher(ds, info, 10)
    state = trainer.init_state(b.make_batch(np.arange(10)), seed=0)
    export_model(
        model, {"params": state.params, "batch_stats": state.batch_stats},
        b.make_batch(np.arange(10)), str(tmp_path / "exported.hlo"),
    )
    serve_cfg = {k: v for k, v in cfg.items() if k != "batch_size"}
    ep = ExportPredictor(str(tmp_path / "exported.hlo"), serve_cfg)
    assert ep.batch_size == 10 and ep.max_nodes == 10
    small = make_ring_dataset(num_pairs=2, num_nodes=10, seed=1)  # 4 graphs
    resp = ep.predict(_payload_from(small))
    assert resp["num"] == 4
    assert np.asarray(resp["prediction"]).shape == (4, 2)


def test_dynamic_batching_coalesces(tmp_path):
    """Concurrent requests merge into fewer device calls with identical
    per-request predictions."""
    import threading

    from kgcn_tpu.runtime.serve import DynamicBatcher

    cfg, data, ref_pred = _train_tiny(tmp_path)
    base = Predictor(cfg)
    base.predict(_payload_from(data))  # warm: build + compile
    n_warm = base.requests
    db = DynamicBatcher(base, window_ms=100.0)
    single = make_ring_dataset(num_pairs=1, num_nodes=10, seed=7)
    results = [None] * 6
    def worker(i):
        results[i] = db.predict(_payload_from(single))
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert all(r is not None for r in results)
    for r in results:
        assert r["num"] == 2
        np.testing.assert_allclose(r["prediction"], results[0]["prediction"])
    # 6 client calls → far fewer device calls
    assert base.requests - n_warm < 6
    assert db.coalesced_calls >= 1
    assert db.health()["dynamic_batching"]["coalesced_calls"] >= 1
    db.close()


def test_dynamic_batching_isolates_bad_request(tmp_path):
    """A malformed request inside a merged batch fails alone; good requests
    in other schema groups still succeed."""
    from kgcn_tpu.runtime.serve import DynamicBatcher

    cfg, data, _ = _train_tiny(tmp_path, epochs=1)
    base = Predictor(cfg)
    base.predict(_payload_from(data))  # pin shapes
    db = DynamicBatcher(base, window_ms=20.0)
    good = _payload_from(make_ring_dataset(num_pairs=1, num_nodes=10, seed=9))
    with pytest.raises(Exception):
        # wrong feature width (5 vs the trained 3) → fails at execution
        db.predict({"feature": [[[1.0] * 5] * 10],
                    "dense_adj": [np.eye(10).tolist()],
                    "max_node_num": 10})
    resp = db.predict(good)
    assert resp["num"] == 2
    db.close()


def test_merge_concatenates_sequence_lengths():
    """Sequence requests must merge 'sequence_length' per graph — the jbl
    schema key (dataset.py) — or coalesced CPI requests keep only the first
    request's lengths."""
    from kgcn_tpu.runtime.serve import DynamicBatcher

    d1 = payload_to_data({
        "feature": np.zeros((2, 4, 3)).tolist(),
        "dense_adj": np.eye(4)[None].repeat(2, 0).tolist(),
        "max_node_num": 4,
        "sequence": np.ones((2, 6), np.int32).tolist(),
        "sequence_length": [5, 6],
    })
    d2 = payload_to_data({
        "feature": np.zeros((1, 4, 3)).tolist(),
        "dense_adj": np.eye(4)[None].tolist(),
        "max_node_num": 4,
        "sequence": np.ones((1, 6), np.int32).tolist(),
        "sequence_length": [3],
    })
    assert d1["sequence_length"].dtype == np.int32
    db = object.__new__(DynamicBatcher)  # _merge uses only the class attr
    merged = db._merge([d1, d2])
    assert merged["sequence"].shape == (3, 6)
    np.testing.assert_array_equal(merged["sequence_length"], [5, 6, 3])


def test_unmergeable_requests_run_solo():
    """Requests carrying per-graph keys without merge semantics (node lists
    merge; graph_index_list does not) must not coalesce."""
    from kgcn_tpu.runtime.serve import DynamicBatcher

    db = object.__new__(DynamicBatcher)
    ok = payload_to_data({
        "feature": np.zeros((1, 4, 3)).tolist(),
        "dense_adj": np.eye(4)[None].tolist(),
        "max_node_num": 4,
    })
    assert db._coalescable(ok)
    with_pairs = dict(ok)
    with_pairs["graph_index_list"] = [(0, 0)]
    assert not db._coalescable(with_pairs)
    # node-embedding-mode requests merge (list concat)
    node_mode = {"adj": ok["dense_adj"], "node": [np.arange(4, dtype=np.int32)],
                 "max_node_num": 4}
    d = payload_to_data({"max_node_num": 4})
    node_data = {**d, "adj": [[(np.array([[0, 1], [1, 0]]), np.ones(2),
                                (4, 4))]],
                 "node": [np.arange(4, dtype=np.int32)]}
    assert db._coalescable(node_data)
    merged = db._merge([node_data, node_data])
    assert len(merged["node"]) == 2 and len(merged["adj"]) == 2
