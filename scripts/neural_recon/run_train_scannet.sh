#!/usr/bin/env bash
# Usage: run_train_scannet.sh [CONFIG] [extra tools/train.py args...]
# Parity: /root/reference/scripts/neural_recon/run_train_scannet.sh
source "$(dirname "$0")/../common.sh"
ROOT=$(repo_root)
CONFIG=${1:-$ROOT/configs/neural_recon/scannet.py}; shift || true
PYTHONPATH="$ROOT:$PYTHONPATH" python "$ROOT/tools/train.py" "$CONFIG" --no-validate "$@"
