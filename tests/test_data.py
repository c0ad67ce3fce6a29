import numpy as np
import pytest

from kgcn_tpu.data import build_dataset, split_dataset, kfold_indices, Batcher
from kgcn_tpu.data.synthetic import make_ring_dataset, make_random_graphs

REF_JBL = "/root/reference/example_jbl"


def test_build_dataset_dense_adj():
    data = make_ring_dataset(num_pairs=10, seed=0)
    ds, info = build_dataset(data, {})
    assert ds.num == 20
    assert info.feature_dim == 3
    assert info.label_dim == 2
    assert info.adj_channel_num == 1
    assert ds.max_node_num == 10


def test_build_dataset_coo_adj():
    data = make_random_graphs(8, 6, 4, num_channels=2, seed=1)
    ds, info = build_dataset(data, {})
    assert ds.num == 8
    assert info.adj_channel_num == 2


def test_reference_jbl_schemas():
    """Load every shipped reference jbl with our loader."""
    import joblib, os

    cases = {
        "synthetic.jbl": dict(num=200, feature_dim=3, label_dim=2),
        "sample.jbl": dict(num=5, feature_dim=4, label_dim=2),
        "sample_multitask.jbl": dict(num=4, feature_dim=4, label_dim=3),
        "sample_node_label.jbl": dict(num=4, feature_dim=4, label_dim=2),
        "sample_multiadj.jbl": dict(num=4, feature_dim=4, label_dim=2),
    }
    for name, want in cases.items():
        path = os.path.join(REF_JBL, name)
        if not os.path.exists(path):
            pytest.skip(f"{path} missing")
        ds, info = build_dataset(joblib.load(path), {})
        assert ds.num == want["num"], name
        assert info.feature_dim == want["feature_dim"], name
        assert info.label_dim == want["label_dim"], name


def test_reference_sparse_jbl_node_embedding():
    import joblib, os

    path = f"{REF_JBL}/synthetic_sparse.jbl"
    if not os.path.exists(path):
        pytest.skip("missing")
    ds, info = build_dataset(
        joblib.load(path), {"with_feature": False, "with_node_embedding": False}
    )
    assert ds.num == 200
    assert info.adj_channel_num == 1


def test_split_and_kfold():
    data = make_ring_dataset(num_pairs=20, seed=0)
    ds, info = build_dataset(data, {})
    tr, va, ti, vi = split_dataset(ds, 0.25, seed=1)
    assert tr.num == 30 and va.num == 10
    assert set(ti) | set(vi) == set(range(40))
    folds = kfold_indices(40, 4, seed=0)
    assert len(folds) == 4
    y = np.argmax(ds.labels, axis=1)
    sfolds = kfold_indices(40, 4, seed=0, stratify=y)
    for tr_i, te_i in sfolds:
        # stratified folds keep class balance
        assert abs(np.mean(y[te_i]) - 0.5) < 0.21


def test_batcher_fixed_shapes():
    data = make_ring_dataset(num_pairs=13, seed=0)  # 26 graphs, batch 8 → last=2
    ds, info = build_dataset(data, {"normalize_adj_flag": True})
    b = Batcher(ds, info, batch_size=8, seed=0)
    shapes = set()
    total_valid = 0
    for batch in b.batches(shuffle=True):
        shapes.add(
            (
                batch.graph.senders.shape,
                batch.graph.nodes.shape,
                batch.labels.shape,
            )
        )
        total_valid += int(np.asarray(batch.pad_mask).sum())
    assert len(shapes) == 1  # every batch identically shaped → one jit compile
    assert total_valid == 26


def test_normalize_flag_changes_weights():
    data = make_ring_dataset(num_pairs=4, seed=0)
    ds_raw, _ = build_dataset(data, {})
    ds_norm, _ = build_dataset(data, {"normalize_adj_flag": True})
    w_raw = ds_raw.adjs[0][0][2]
    w_norm = ds_norm.adjs[0][0][2]
    assert np.all(w_raw == 1.0)
    assert np.all(w_norm <= 1.0) and np.any(w_norm < 1.0)
