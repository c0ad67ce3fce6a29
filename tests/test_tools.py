"""Meta-tool tests: HPO, NAS, active learning, graph kernels."""
import numpy as np
import pytest

from kgcn_tpu.data import build_dataset, split_dataset
from kgcn_tpu.data.synthetic import make_ring_dataset


def test_gp_optimizer_finds_minimum():
    from kgcn_tpu.tools.hpo import Domain, optimize

    domain = Domain(
        [
            {"name": "x", "type": "continuous", "domain": (0.0, 1.0)},
            {"name": "k", "type": "discrete", "domain": (1, 2, 3),
             "data_type": "int"},
        ]
    )
    # minimum at x=0.3, k=2
    obj = lambda p: (p["x"] - 0.3) ** 2 + 0.1 * (p["k"] - 2) ** 2
    best, val, hist = optimize(obj, domain, max_iter=25, seed=0,
                               log=lambda s: None)
    assert val < 0.02
    assert abs(best["x"] - 0.3) < 0.15
    assert len(hist) == 25


def test_domain_decode_reference_format():
    from kgcn_tpu.tools.hpo import Domain

    d = Domain(
        [{"name": "num_gcn_layer", "type": "discrete", "domain": [0, 1, 2],
          "data_type": "int"}]
    )
    out = d.decode(np.array([0.99]))
    assert out == {"num_gcn_layer": 2}
    out = d.decode(np.array([0.0]))
    assert out == {"num_gcn_layer": 0}


def test_nas_search_runs(tmp_path):
    from kgcn_tpu.tools.nas import search

    cfg = {"batch_size": 10, "epoch": 3, "task": "classification",
           "normalize_adj_flag": True, "save_model_path": str(tmp_path)}
    data = make_ring_dataset(num_pairs=15, seed=0)
    ds, info = build_dataset(data, cfg)
    tr, va, _, _ = split_dataset(ds, 0.3, seed=0)
    best, val, hist = search(tr, va, info, cfg, max_iter=3, seed=0,
                             log=lambda s: None)
    assert np.isfinite(val)
    assert "num_gcn_layer" in best
    assert len(hist) == 3


def test_active_learning_beats_random_start():
    from kgcn_tpu.tools.active_learning import run_loop

    rng = np.random.RandomState(0)
    # two separable gaussians
    X = np.concatenate([rng.randn(100, 5) + 1.5, rng.randn(100, 5) - 1.5])
    y = np.array([0] * 100 + [1] * 100)
    order = rng.permutation(200)
    X, y = X[order], y[order]
    accs, learner = run_loop(
        X[:150], y[:150], X[150:], y[150:],
        estimator_name="svc", strategy="entropy",
        initial=5, batch=5, iterations=5, seed=0,
    )
    assert accs[-1] >= accs[0] - 0.05
    assert accs[-1] > 0.9
    assert len(learner.labeled_idx) == 30


def test_wl_kernel_separates_rings():
    from kgcn_tpu.tools.graph_kernels import (
        dataset_to_kernel_graphs,
        kernel_svm_cv,
        wl_kernel,
    )

    data = make_ring_dataset(num_pairs=25, noise_p=0.0, seed=0)
    ds, info = build_dataset(data, {})
    graphs = dataset_to_kernel_graphs(ds)
    K = wl_kernel(graphs, iterations=3)
    assert K.shape == (50, 50)
    np.testing.assert_allclose(np.diag(K), 1.0, atol=1e-9)
    y = np.argmax(data["label"], axis=1)
    acc, std = kernel_svm_cv(K, y, folds=5)
    assert acc > 0.9, f"WL-SVM acc={acc}"


def test_shortest_path_kernel():
    from kgcn_tpu.tools.graph_kernels import (
        dataset_to_kernel_graphs,
        kernel_svm_cv,
        shortest_path_kernel,
    )

    data = make_ring_dataset(num_pairs=15, noise_p=0.0, seed=0)
    ds, info = build_dataset(data, {})
    K = shortest_path_kernel(dataset_to_kernel_graphs(ds))
    y = np.argmax(data["label"], axis=1)
    acc, _ = kernel_svm_cv(K, y, folds=3)
    assert acc > 0.8, f"SP-SVM acc={acc}"


def test_hash_graph_kernel_separates_rings():
    from kgcn_tpu.tools.graph_kernels import (
        dataset_to_attributed_graphs,
        hash_graph_kernel,
        kernel_svm_cv,
    )

    data = make_ring_dataset(num_pairs=20, noise_p=0.0, seed=0)
    ds, info = build_dataset(data, {})
    graphs = dataset_to_attributed_graphs(ds)
    K = hash_graph_kernel(graphs, iterations=8, wl_iterations=2, seed=0)
    assert K.shape == (40, 40)
    np.testing.assert_allclose(np.diag(K), 1.0, atol=1e-9)
    np.testing.assert_allclose(K, K.T, atol=1e-12)
    # deterministic under seed
    K2 = hash_graph_kernel(graphs, iterations=8, wl_iterations=2, seed=0)
    np.testing.assert_allclose(K, K2)
    y = np.argmax(data["label"], axis=1)
    acc, _ = kernel_svm_cv(K, y, folds=4)
    assert acc > 0.8, f"hash-kernel SVM acc={acc}"


def test_kernel_ridge_regression_cv():
    from kgcn_tpu.tools.graph_kernels import (
        dataset_to_kernel_graphs,
        kernel_ridge_cv,
        wl_kernel,
    )

    # regression target = ring size (5 vs 6), perfectly encoded by WL features
    data = make_ring_dataset(num_pairs=20, noise_p=0.0, seed=1)
    ds, info = build_dataset(data, {})
    K = wl_kernel(dataset_to_kernel_graphs(ds), iterations=2)
    y = np.argmax(data["label"], axis=1).astype(np.float64) + 5.0
    mse, std, r2 = kernel_ridge_cv(K, y, folds=4, alpha=1e-3)
    assert mse < 0.05, f"kernel-ridge mse={mse}"
    assert r2 > 0.8, f"kernel-ridge r2={r2}"
