#!/usr/bin/env bash
# Parity: /root/reference/scripts/gan2shape/run_celeba.sh
source "$(dirname "$0")/../common.sh"
ROOT=$(repo_root)
CONFIG=${1:-$ROOT/configs/gan2shape/celeba_synthetic.py}; shift || true
PYTHONPATH="$ROOT:$PYTHONPATH" python "$ROOT/tools/train.py" "$CONFIG" --no-validate "$@"
