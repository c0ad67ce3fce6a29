#!/bin/bash
# Synthetic ring classification: train → infer → IG visualize → render.
set -e
cd "$(dirname "$0")/.."
python -m kgcn_tpu.cli.main train --config example_config/synth.json "$@"
python -m kgcn_tpu.cli.main infer --config example_config/synth.json "$@"
python -m kgcn_tpu.cli.main visualize --config example_config/synth.json "$@"
python -m kgcn_tpu.cli.gcnv visualization/mol_00000_max.jbl
