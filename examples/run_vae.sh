#!/bin/bash
set -e
cd "$(dirname "$0")/.."
python -m kgcn_tpu.cli.gen train --config example_config/vae.json "$@"
python -m kgcn_tpu.cli.gen reconstruct --config example_config/vae.json "$@"
python -m kgcn_tpu.cli.gen generate --config example_config/vae.json "$@"
