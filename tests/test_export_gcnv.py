"""Model export + gcnv renderer tests."""
import os

import joblib
import numpy as np
import pytest

from kgcn_tpu.data import Batcher, build_dataset
from kgcn_tpu.data.synthetic import make_ring_dataset
from kgcn_tpu.models.registry import build_model
from kgcn_tpu.runtime.config import default_config
from kgcn_tpu.runtime.train import Trainer


def test_export_roundtrip(tmp_path):
    from kgcn_tpu.runtime.export import export_model, load_exported

    cfg = default_config()
    cfg.update({"task": "classification"})
    ds, info = build_dataset(make_ring_dataset(num_pairs=5, seed=0), cfg)
    model = build_model("gcn", info, cfg)
    trainer = Trainer(model, cfg, info)
    b = Batcher(ds, info, 5, seed=0)
    batch = b.make_batch(np.arange(5))
    state = trainer.init_state(batch, seed=0)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    path = str(tmp_path / "model.stablehlo")
    export_model(model, variables, batch, path)
    assert os.path.exists(path) and os.path.exists(path + ".params")

    fn = load_exported(path)
    pred = fn(batch)
    want = model.apply(variables, batch, train=False).prediction
    np.testing.assert_allclose(np.asarray(pred), np.asarray(want), rtol=1e-5)


def test_gcnv_renders_ig_dump(tmp_path):
    from kgcn_tpu.cli.gcnv import main as gcnv_main

    dump = {
        "features": np.random.rand(10, 3),
        "features_IG": np.random.randn(10, 3),
        "adjs": np.random.rand(10, 10),
        "adjs_IG": np.random.randn(10, 10),
        "check_score": 0.5,
        "sum_of_IG": 0.48,
    }
    path = str(tmp_path / "mol_0.jbl")
    joblib.dump(dump, path)
    gcnv_main([path, "--outdir", str(tmp_path)])
    made = os.listdir(tmp_path)
    for suffix in ("adjs.png", "adjs_IG.png", "features.png", "features_IG.png"):
        assert any(f.endswith(suffix) for f in made), suffix


@pytest.mark.slow_e2e
def test_export_savedmodel_roundtrip(tmp_path):
    """jax2tf SavedModel bridge (reference-compat artifact: frozen GraphDef
    gcn.py:335-341 / BestExporter SavedModel task_sparse_gcn.py:218-226):
    external TF tooling loads the artifact and reproduces our predictions.

    Runs in a SUBPROCESS: TF-in-the-test-process is flaky under the
    suite's parallel workers (thread/XLA-runtime contention).  Marked
    slow_e2e (the TF import alone costs ~25 s on a 2-core host): excluded
    from the default suite, run explicitly with ``-m slow_e2e``."""
    import importlib.util
    import subprocess
    import sys

    # find_spec, NOT importorskip: importing TF into this (possibly xdist
    # worker) process is the exact contention the subprocess avoids
    if importlib.util.find_spec("tensorflow") is None:
        pytest.skip("tensorflow unavailable")
    code = f"""
import json, os
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from kgcn_tpu.data import Batcher, build_dataset
from kgcn_tpu.data.synthetic import make_ring_dataset
from kgcn_tpu.models.registry import build_model
from kgcn_tpu.runtime.config import default_config
from kgcn_tpu.runtime.train import Trainer
from kgcn_tpu.runtime.export import export_savedmodel

cfg = default_config(); cfg.update({{"task": "classification"}})
ds, info = build_dataset(make_ring_dataset(num_pairs=5, seed=0), cfg)
model = build_model("gcn", info, cfg)
trainer = Trainer(model, cfg, info)
batch = Batcher(ds, info, 5, seed=0).make_batch(np.arange(5))
state = trainer.init_state(batch, seed=0)
variables = {{"params": state.params, "batch_stats": state.batch_stats}}
path = {str(tmp_path / "savedmodel")!r}
export_savedmodel(model, variables, batch, path)
sig = json.load(open(os.path.join(path, "kgcn_signature.json")))
leaves = jax.tree_util.tree_leaves(batch)
assert len(sig) == len(leaves)
import tensorflow as tf
loaded = tf.saved_model.load(path)
got = loaded.f(*[tf.constant(np.asarray(l)) for l in leaves])
want = model.apply(variables, batch, train=False).prediction
np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                           rtol=1e-4, atol=1e-5)
print("SAVEDMODEL_OK")
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))), timeout=420)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "SAVEDMODEL_OK" in r.stdout
