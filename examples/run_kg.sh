#!/bin/bash
# Build a KG from triples, train link prediction, rank held-out triples.
set -e
cd "$(dirname "$0")/.."
mkdir -p /tmp/kg_example
python - <<'PY'
with open("/tmp/kg_example/triples.tsv", "w") as f:
    for i in range(60):
        f.write(f"e{i}\tinteracts\te{(i + 1) % 60}\n")
        f.write(f"e{i}\tregulates\te{(i + 7) % 60}\n")
PY
python -m kgcn_tpu.cli.kg --input /tmp/kg_example/triples.tsv --output /tmp/kg_example/kg.jbl
python - <<'PY'
import json
cfg = json.load(open("example_config/kg.json"))
cfg["dataset"] = "/tmp/kg_example/kg.jbl"
cfg["save_model_path"] = "/tmp/kg_example/model"
cfg["save_result_test"] = "/tmp/kg_example/edge_scores.csv"
json.dump(cfg, open("/tmp/kg_example/config.json", "w"))
PY
python -m kgcn_tpu.cli.main train --config /tmp/kg_example/config.json "$@"
python -m kgcn_tpu.cli.main infer --config /tmp/kg_example/config.json "$@"
