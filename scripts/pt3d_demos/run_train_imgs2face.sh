#!/usr/bin/env bash
# Parity: /root/reference/scripts/pt3d_demos/run_train_imgs2face.sh
source "$(dirname "$0")/../common.sh"
ROOT=$(repo_root)
CONFIG=${1:-$ROOT/configs/pt3d_demos/imgs2face_synthetic.py}; shift || true
PYTHONPATH="$ROOT:$PYTHONPATH" python "$ROOT/tools/train.py" "$CONFIG" --no-validate "$@"
