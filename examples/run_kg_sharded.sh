#!/bin/bash
# Sharded whole-graph KG training: the embedding table + adjacency are
# edge-partitioned over a device mesh (parallel/big_graph.py).  On a machine
# without multiple accelerators, validate with virtual CPU devices:
#   XLA_FLAGS=--xla_force_host_platform_device_count=8 examples/run_kg_sharded.sh --cpu
set -e
cd "$(dirname "$0")/.."
mkdir -p /tmp/kg_sharded
python - <<'PY'
import json

import joblib

from kgcn_tpu.data.synthetic import make_kg_dataset

joblib.dump(make_kg_dataset(num_entities=512, num_relations=2, seed=0),
            "/tmp/kg_sharded/kg.jbl")
cfg = {
    "dataset": "/tmp/kg_sharded/kg.jbl",
    "task": "link_prediction",
    "with_feature": False,
    "with_node_embedding": True,
    "embedding_dim": 32,
    "kg_encoder": "gcn",
    "epoch": 30,
    "batch_size": 1,
    "label_batch_size": 256,
    "learning_rate": 0.05,
    "mesh": {"data": 8},
    "halo_strategy": "ring",
    "save_model_path": "/tmp/kg_sharded/model",
    "save_info_train": "/tmp/kg_sharded/info.json",
    "save_info_test": "/tmp/kg_sharded/test.json",
    "save_interval": 0,
    "seed": 0,
}
json.dump(cfg, open("/tmp/kg_sharded/config.json", "w"))
PY
python -m kgcn_tpu.cli.main train --config /tmp/kg_sharded/config.json "$@"
# infer restores the single-device-format checkpoint the sharded run wrote
python -m kgcn_tpu.cli.main infer --config /tmp/kg_sharded/config.json "$@"
echo "sharded checkpoint (orbax, resumable via 'retrain'):"
ls /tmp/kg_sharded/model/model.big_graph.ckpt
