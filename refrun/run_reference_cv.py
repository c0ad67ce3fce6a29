"""Regenerate the REFERENCE framework's solubility CV numbers (MEASURED.md
"Real-chemistry accuracy parity" table).

Runs the mounted reference (/root/reference/gcn.py train_cv) on the SAME
`.jbl` files our framework trains on (examples/solubility/*.jbl — built by
our RDKit-free featurizer in the reference's own joblib schema), under
TF2's v1-compat mode, with minimal shims for the reference's bit-rot on
this image (it targets TF1.x + old numpy/scipy/Keras):

* ``scipy.interp`` was removed from scipy — alias to ``numpy.interp``
  (used by kgcn/make_plots.py).
* ragged ``np.array([...])`` object-array creation now raises — the
  reference builds ragged per-graph lists; wrap with dtype=object fallback.
* ``tf.keras`` is Keras 3 here, whose Dense/Dropout no longer accept TF1
  graph tensors — substitute graph-mode equivalents (matmul+bias / nn
  dropout) into kgcn.layers.

Usage (CPU, ~minutes per task):
    python refrun/run_reference_cv.py cls  > refrun/cv_ref_cls.log 2>&1
    python refrun/run_reference_cv.py reg  > refrun/cv_ref_reg.log 2>&1
    python refrun/run_reference_cv.py mt   > refrun/cv_ref_mt.log 2>&1

The final "cv" lines of each log are the numbers quoted in MEASURED.md.
Reference protocol files: /root/reference/gcn.py:355-524 (train_cv),
/root/reference/example_model/model.py (cls), model_multitask.py (mt).
"""
from __future__ import annotations

import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def install_shims():
    import numpy as np
    import scipy

    if not hasattr(scipy, "interp"):
        scipy.interp = np.interp

    # ragged np.array(...) → dtype=object (NumPy >= 1.24 raises)
    _orig_array = np.array

    def array_compat(obj, *args, **kwargs):
        try:
            return _orig_array(obj, *args, **kwargs)
        except ValueError as e:
            if "inhomogeneous" in str(e) and not kwargs.get("dtype"):
                return _orig_array(obj, dtype=object)
            raise

    np.array = array_compat

    # modern sklearn raises when random_state is set with shuffle=False;
    # the reference passes both unconditionally (gcn.py train_cv)
    from sklearn import model_selection as _ms

    for _name in ("KFold", "StratifiedKFold"):
        _cls = getattr(_ms, _name)
        _orig = _cls.__init__

        def _init(self, n_splits=5, *, shuffle=False, random_state=None,
                  __orig=_orig):
            if not shuffle:
                random_state = None
            __orig(self, n_splits=n_splits, shuffle=shuffle,
                   random_state=random_state)

        _cls.__init__ = _init

    import tensorflow as _tf2

    tf1 = _tf2.compat.v1
    tf1.disable_eager_execution()
    tf1.disable_v2_behavior()

    # Keras-3 Dense/Dropout cannot consume TF1 graph tensors; kgcn.layers
    # uses them via tf.keras.layers — substitute graph-mode equivalents
    import kgcn.layers as L

    class GraphDense:
        def __init__(self, units, activation=None, name=None, **kw):
            self.units, self.activation = units, activation
            self.name = name or f"dense_{id(self) % 99999}"

        def __call__(self, x):
            dim = int(x.shape[-1])
            with tf1.variable_scope(self.name, reuse=tf1.AUTO_REUSE):
                w = tf1.get_variable(
                    "kernel", [dim, self.units],
                    initializer=tf1.glorot_uniform_initializer(),
                )
                b = tf1.get_variable(
                    "bias", [self.units],
                    initializer=tf1.zeros_initializer(),
                )
            shape = x.shape.as_list()
            if len(shape) == 3:
                y = tf1.einsum("bnf,fo->bno", x, w) + b
            else:
                y = tf1.matmul(x, w) + b
            if self.activation is not None:
                y = self.activation(y)
            return y

    class GraphDropout:
        def __init__(self, rate=0.5, **kw):
            self.rate = rate

        def __call__(self, x, training=False):
            if training is False or training is None:
                return x
            keep = 1.0 - self.rate
            return tf1.cond(
                tf1.cast(training, tf1.bool),
                lambda: tf1.nn.dropout(x, rate=self.rate),
                lambda: x,
            ) if not isinstance(training, bool) else (
                tf1.nn.dropout(x, rate=self.rate) if training else x
            )

    if hasattr(L, "tf"):
        L.tf.keras.layers.Dense = GraphDense
        L.tf.keras.layers.Dropout = GraphDropout


def make_config(task: str, tmpdir: str) -> str:
    jbl = {
        "cls": "solubility_cls.jbl",
        "reg": "solubility_reg.jbl",
        "mt": "solubility_mt.jbl",
    }[task]
    cfg = {
        "model.py": {
            "cls": "example_model.model:GCN",
            "reg": "ref_model_regression:GCNRegression",
            "mt": "example_model.model_multitask:GCN",
        }[task],
        "dataset": os.path.join(REPO, "examples", "solubility", jbl),
        "validation_data_rate": 0.2,
        "epoch": 100 if task == "reg" else 50,
        "batch_size": 32,
        "learning_rate": 0.003 if task == "reg" else
        (0.001 if task == "mt" else 0.01),
        "shuffle_data": False,
        "k-fold_num": 3,
        "task": "regression" if task == "reg" else "classification",
        "normalize_adj_flag": True,
        "with_feature": True,
        "save_model_path": os.path.join(tmpdir, "model"),
        "save_info_cv": os.path.join(tmpdir, f"ref_{task}_info_cv.json"),
        "save_result_cv": os.path.join(tmpdir, f"ref_{task}_result_cv.json"),
        "save_info_valid": os.path.join(tmpdir, "info_valid.json"),
        "save_result_valid": os.path.join(tmpdir, "result_valid.csv"),
        "save_info_train": os.path.join(tmpdir, "info_train.json"),
        "plot_info_flag": False,
        "make_plot": False,
        "retrain": None,
    }
    path = os.path.join(tmpdir, f"ref_{task}.json")
    with open(path, "w") as f:
        json.dump(cfg, f, indent=2)
    return path


def main():
    task = sys.argv[1] if len(sys.argv) > 1 else "cls"
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, REF)
    os.chdir(REF)  # example_model imports resolve relative to the reference
    install_shims()
    import gcn  # the reference driver

    tmpdir = tempfile.mkdtemp(prefix="refrun_")
    cfg = make_config(task, tmpdir)
    sys.argv = ["gcn.py", "train_cv", "--config", cfg, "--cpu"]
    gcn.main()
    print(f"[refrun] artifacts in {tmpdir}")


if __name__ == "__main__":
    main()
