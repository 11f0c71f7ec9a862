#!/usr/bin/env bash
# Parity: /root/reference/scripts/neural_recon/gen_tsdf.sh
source "$(dirname "$0")/../common.sh"
ROOT=$(repo_root)
PYTHONPATH="$ROOT:$PYTHONPATH" python "$ROOT/tools/data_gen/scannet.py" "$@"
