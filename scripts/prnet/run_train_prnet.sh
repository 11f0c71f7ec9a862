#!/usr/bin/env bash
# Parity: /root/reference/scripts/prnet/run_train_prnet.sh
source "$(dirname "$0")/../common.sh"
ROOT=$(repo_root)
CONFIG=${1:-$ROOT/configs/prnet/prnet_synthetic.py}; shift || true
PYTHONPATH="$ROOT:$PYTHONPATH" python "$ROOT/tools/train.py" "$CONFIG" "$@"
