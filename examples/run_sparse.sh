#!/bin/bash
# Build tfrecords from the synthetic set, train the streaming sparse GCN.
set -e
cd "$(dirname "$0")/.."
mkdir -p /tmp/sparse_example
python - <<'PY'
import numpy as np
from kgcn_tpu.data.synthetic import make_ring_dataset
from kgcn_tpu.data.tfrecord import example_from_graph, write_tfrecord
d = make_ring_dataset(num_pairs=60, seed=0)
y = np.argmax(d["label"], 1)
write_tfrecord("/tmp/sparse_example/train.tfrecords", [
    example_from_graph(d["dense_adj"][i], d["feature"][i], label=[int(y[i])], mask_label=[1])
    for i in range(120)
])
import json
json.dump({
    "dataset": "/tmp/sparse_example/train.tfrecords",
    "num_classes": 2, "batch_size": 30, "epoch": 15,
    "learning_rate": 0.001, "out_dims": [64, 64], "dense_dim": 64,
    "num_folds": 5, "task": "classification",
    "save_model_path": "/tmp/sparse_example/model",
    "save_interval": 0, "shuffle_data": True, "seed": 0,
}, open("/tmp/sparse_example/config.json", "w"))
PY
python -m kgcn_tpu.cli.sparse train --config /tmp/sparse_example/config.json "$@"
