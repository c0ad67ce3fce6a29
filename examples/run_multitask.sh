#!/bin/bash
set -e
cd "$(dirname "$0")/.."
python -m kgcn_tpu.cli.main train --config example_config/multitask.json "$@"
