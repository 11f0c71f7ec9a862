#!/usr/bin/env bash
# Parity: /root/reference/tools/ns/train.py CLI (nerfstudio stack replaced)
source "$(dirname "$0")/../common.sh"
ROOT=$(repo_root)
CONFIG=${1:-$ROOT/configs/lerf/lerf_synthetic.py}; shift || true
PYTHONPATH="$ROOT:$PYTHONPATH" python "$ROOT/tools/train.py" "$CONFIG" --no-validate "$@"
