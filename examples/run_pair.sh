#!/bin/bash
set -e
cd "$(dirname "$0")/.."
python -m kgcn_tpu.cli.pair train --config example_config/pair.json "$@"
python -m kgcn_tpu.cli.pair infer --config example_config/pair.json "$@"
