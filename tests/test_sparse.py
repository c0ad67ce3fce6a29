"""TFRecord codec + sparse-GCN engine tests."""
import json
import os

import numpy as np
import pytest

from kgcn_tpu.data.synthetic import make_ring_dataset
from kgcn_tpu.data.tfrecord import (
    build_example,
    example_from_graph,
    load_tfrecord_dataset,
    parse_example,
    read_tfrecord,
    write_tfrecord,
    crc32c,
)


def test_crc32c_known_vector():
    # RFC 3720 test vector: 32 bytes of zeros → 0x8A9136AA
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"123456789") == 0xE3069283


def test_example_roundtrip():
    feats = {
        "ints": np.array([1, -2, 300000], np.int64),
        "floats": np.array([1.5, -2.25], np.float32),
    }
    ex = build_example(feats)
    back = parse_example(ex)
    np.testing.assert_array_equal(back["ints"], feats["ints"])
    np.testing.assert_array_equal(back["floats"], feats["floats"])


def test_tfrecord_roundtrip(tmp_path):
    path = str(tmp_path / "x.tfrecords")
    recs = [b"hello", b"world", bytes(range(256))]
    write_tfrecord(path, recs)
    assert list(read_tfrecord(path, verify_crc=True)) == recs


def test_graph_example_schema_and_dataset(tmp_path):
    data = make_ring_dataset(num_pairs=10, seed=0)
    path = str(tmp_path / "graphs.tfrecords")
    y = np.argmax(data["label"], axis=1)
    recs = [
        example_from_graph(
            data["dense_adj"][i], data["feature"][i],
            label=[int(y[i])], mask_label=[1],
        )
        for i in range(20)
    ]
    write_tfrecord(path, recs)
    ex = parse_example(next(iter(read_tfrecord(path))))
    for key in ("adj_row", "adj_column", "adj_values", "adj_elem_len",
                "adj_degrees", "feature_row", "feature_column",
                "feature_values", "feature_elem_len", "size", "label"):
        assert key in ex, key
    ds, info = load_tfrecord_dataset(path, {})
    assert ds.num == 20
    assert info.feature_dim == 3
    # adjacency round-trips exactly
    r, c, v = ds.adjs[0][0]
    dense = np.zeros((10, 10))
    dense[r, c] = v
    np.testing.assert_array_equal(dense, data["dense_adj"][0])


def test_sparse_gcn_trains(tmp_path):
    from kgcn_tpu.cli.sparse import cmd_train
    from kgcn_tpu.runtime.config import load_config

    data = make_ring_dataset(num_pairs=30, seed=0)
    y = np.argmax(data["label"], axis=1)
    path = str(tmp_path / "train.tfrecords")
    write_tfrecord(
        path,
        [
            example_from_graph(
                data["dense_adj"][i], data["feature"][i],
                label=[int(y[i])], mask_label=[1],
            )
            for i in range(60)
        ],
    )
    cfg_path = tmp_path / "cfg.json"
    cfg = {
        "dataset": path,
        "num_classes": 2,
        "batch_size": 20,
        "epoch": 15,
        "learning_rate": 0.001,
        "out_dims": [64, 64],
        "dense_dim": 64,
        "num_folds": 5,
        "task": "classification",
        "save_model_path": str(tmp_path / "model"),
        "save_interval": 0,
        "shuffle_data": True,
        "save_info_valid": str(tmp_path / "valid.json"),
        "seed": 0,
    }
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    config = load_config(str(cfg_path))
    state, trainer, info, ev = cmd_train(config, fold=0)
    acc = float(np.asarray(ev["metrics"]["valid_accuracy"]))
    assert acc >= 0.75, f"sparse gcn acc={acc}"
    assert os.path.exists(tmp_path / "valid.json")


def test_fold_split_deterministic():
    from kgcn_tpu.cli.sparse import split_fold

    tr, va = split_fold(10, 0, 5)
    assert list(va) == [0, 5]
    assert len(tr) == 8
    all_va = np.concatenate([split_fold(10, f, 5)[1] for f in range(5)])
    assert sorted(all_va) == list(range(10))


def test_sparse_gcn_trains_data_parallel(tmp_path):
    """mesh config: the reaction engine trains DP over the device mesh."""
    from kgcn_tpu.cli.sparse import cmd_train
    from kgcn_tpu.runtime.config import load_config

    data = make_ring_dataset(num_pairs=30, seed=0)
    y = np.argmax(data["label"], axis=1)
    path = str(tmp_path / "train.tfrecords")
    write_tfrecord(
        path,
        [
            example_from_graph(
                data["dense_adj"][i], data["feature"][i],
                label=[int(y[i])], mask_label=[1],
            )
            for i in range(60)
        ],
    )
    cfg_path = tmp_path / "cfg.json"
    cfg = {
        "dataset": path,
        "num_classes": 2,
        "batch_size": 4,          # PER DEVICE → global 32
        "mesh": {"data": 8},
        "epoch": 15,
        "learning_rate": 0.001,
        "out_dims": [64, 64],
        "dense_dim": 64,
        "num_folds": 5,
        "task": "classification",
        "save_model_path": str(tmp_path / "model"),
        "save_interval": 0,
        "shuffle_data": True,
        "save_info_valid": str(tmp_path / "valid.json"),
        "seed": 0,
    }
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    config = load_config(str(cfg_path))
    state, trainer, info, ev = cmd_train(config, fold=0)
    acc = float(np.asarray(ev["metrics"]["valid_accuracy"]))
    assert acc >= 0.75, f"sparse gcn DP acc={acc}"


def test_sparse_train_cv_fold_parallel(tmp_path, capsys):
    """kgcn-tpu-sparse train_cv takes the fold-parallel path on the mesh
    (the reference's shell-parallel reaction CV protocol,
    script_cv/02run_fold.sh, as one SPMD program) and reports every fold."""
    from kgcn_tpu.cli.sparse import main as sparse_main

    data = make_ring_dataset(num_pairs=30, seed=0)
    y = np.argmax(data["label"], axis=1)
    path = str(tmp_path / "train.tfrecords")
    write_tfrecord(
        path,
        [
            example_from_graph(
                data["dense_adj"][i], data["feature"][i],
                label=[int(y[i])], mask_label=[1],
            )
            for i in range(60)
        ],
    )
    cfg_path = tmp_path / "cfg.json"
    cfg = {
        "dataset": path,
        "num_classes": 2,
        "batch_size": 16,
        "epoch": 6,
        "learning_rate": 0.001,
        "out_dims": [32, 32],
        "dense_dim": 32,
        "num_folds": 4,
        "task": "classification",
        "save_model_path": str(tmp_path / "model"),
        "save_interval": 0,
        "save_info_valid": str(tmp_path / "valid.json"),
        "seed": 0,
    }
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    sparse_main(["train_cv", "--config", str(cfg_path)])
    out = capsys.readouterr().out
    assert "[fold_parallel] 4 folds" in out
    assert out.count("=== fold") == 4
    assert os.path.exists(tmp_path / "valid.json")
    # per-fold last checkpoints written like the sequential protocol
    cks = [p for p in os.listdir(tmp_path / "model") if "last" in p]
    assert len(cks) == 4, cks
