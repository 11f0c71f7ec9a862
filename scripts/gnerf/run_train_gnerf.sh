#!/usr/bin/env bash
source "$(dirname "$0")/../common.sh"
ROOT=$(repo_root)
CONFIG=${1:-$ROOT/configs/gnerf/gnerf_synthetic.py}; shift || true
PYTHONPATH="$ROOT:$PYTHONPATH" python "$ROOT/tools/train.py" "$CONFIG" --no-validate "$@"
