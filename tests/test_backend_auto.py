"""``spmm_backend: "auto"`` resolution (runtime/backend.py).

The reference's native-op flags default ON (kgcn/layers.py:19-29): a user
gets the fast kernels without writing anything.  These tests pin our
equivalent — the dataset-shape heuristic — so configs with no backend key
hit the dense/tiled/stream paths and explicit names still win.
"""
import numpy as np
import pytest

from kgcn_tpu.data.dataset import DatasetInfo
from kgcn_tpu.runtime.backend import (
    DENSE_MAX_NODES, apply_backend, choose_backend, resolve_and_apply,
)


@pytest.fixture(autouse=True)
def _restore_globals():
    yield
    apply_backend("dense", log=False)  # the process default


def _info(**kw):
    return DatasetInfo(**kw)


def test_choose_explicit_passthrough():
    for name in ("dense", "xla", "pallas", "tiled", "stream"):
        assert choose_backend({"spmm_backend": name}, _info()) == name


def test_choose_molecular_dense():
    # molecular graphs at or under the dense threshold → batched MXU matmul
    cfg = {"batch_size": 32}
    assert choose_backend(cfg, _info(graph_node_num=50)) == "dense"
    assert choose_backend(cfg, _info(graph_node_num=DENSE_MAX_NODES)) == "dense"


def test_choose_blockdiag_tiled():
    # beyond the dense threshold with a real batch → tiled MXU kernel
    cfg = {"batch_size": 32}
    assert choose_backend(cfg, _info(graph_node_num=512)) == "tiled"


def test_choose_kg_stream():
    # whole-graph link prediction beyond the threshold → stream kernel
    cfg = {"task": "link_prediction", "batch_size": 1}
    assert choose_backend(cfg, _info(graph_node_num=3, all_node_num=50_000)) == "stream"
    # tiny KG stays dense
    assert choose_backend(cfg, _info(graph_node_num=3, all_node_num=64)) == "dense"
    # node-embedding whole-graph tasks route the same way
    cfg2 = {"with_node_embedding": True, "batch_size": 1}
    assert choose_backend(cfg2, _info(graph_node_num=100_000)) == "stream"


def test_choose_single_big_graph_stream_and_fallback():
    cfg = {"batch_size": 1}
    assert choose_backend(cfg, _info(graph_node_num=10_000)) == "stream"
    # nothing known about the shape → xla fallback
    assert choose_backend(cfg, _info()) == "xla"


def test_resolve_pins_choice_and_flips_globals():
    from kgcn_tpu.graph.batch import _DENSE_PATH_ENABLED
    from kgcn_tpu.ops.spmm import get_backend

    cfg = {"task": "link_prediction", "batch_size": 1}
    name = resolve_and_apply(cfg, _info(all_node_num=100_000))
    assert name == "stream"
    assert cfg["_spmm_resolved"] == "stream"
    assert get_backend() == "stream"
    assert not _DENSE_PATH_ENABLED[0]
    # a second load (validation set / CV fold) keeps the pinned choice even
    # if its own shape would resolve differently
    assert resolve_and_apply(cfg, _info(graph_node_num=10)) == "stream"


def test_auto_attaches_stream_structures():
    """End to end: a whole-graph dataset with NO backend key gets StreamCOO
    structures attached by the Batcher after auto resolution."""
    from kgcn_tpu.data import Batcher
    from kgcn_tpu.data.dataset import Dataset

    V, E = 600, 2400
    rng = np.random.RandomState(0)
    s, r = rng.randint(0, V, E), rng.randint(0, V, E)
    ds = Dataset(
        adjs=[[(r.astype(np.int32), s.astype(np.int32),
                np.ones(E, np.float32))]],
        nodes=np.arange(V, dtype=np.int32)[None],
    )
    ds.num = 1
    info = _info(graph_node_num=V, all_node_num=V, adj_channel_num=1,
                 feature_dim=0, graph_num=1)
    cfg = {"with_node_embedding": True, "batch_size": 1}
    assert resolve_and_apply(cfg, info) == "stream"
    b = Batcher(ds, info, 1)
    batch = b.make_batch(np.arange(1))
    assert batch.graph.stream_adj is not None
    assert batch.graph.dense_adj is None
