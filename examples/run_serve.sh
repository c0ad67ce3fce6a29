#!/bin/bash
# Train a model, start the HTTP inference server, and send requests.
set -e
cd "$(dirname "$0")/.."
python -m kgcn_tpu.cli.main train --config example_config/synth.json "$@"
python -m kgcn_tpu.cli.serve --config example_config/synth.json \
  --host 127.0.0.1 --port 8901 --dynamic-batching "$@" &
SERVER=$!
trap 'kill $SERVER' EXIT
sleep 5
python - <<'PY'
import json
import urllib.request

import numpy as np

from kgcn_tpu.data.synthetic import make_ring_dataset

d = make_ring_dataset(num_pairs=4, num_nodes=10, seed=1)
payload = json.dumps({
    "feature": np.asarray(d["feature"]).tolist(),
    "dense_adj": np.asarray(d["dense_adj"]).tolist(),
    "max_node_num": int(d["max_node_num"]),
}).encode()
req = urllib.request.Request(
    "http://127.0.0.1:8901/predict", data=payload,
    headers={"Content-Type": "application/json"},
)
for tag in ("first (restore+compile)", "steady-state"):
    with urllib.request.urlopen(req, timeout=300) as r:
        resp = json.loads(r.read())
    print(f"{tag}: {resp['num']} graphs in {resp['latency_ms']:.1f} ms")
print("class probabilities:", [round(p, 3) for p in resp["prediction"][0]])
with urllib.request.urlopen("http://127.0.0.1:8901/healthz") as r:
    print("health:", json.loads(r.read()))
PY
