#!/usr/bin/env bash
# Parity: /root/reference/scripts/neural_recon/run_test_scannet.sh
# (PYOPENGL_PLATFORM=osmesa is obsolete: eval rendering uses the native
# z-buffer rasterizer, no GL context.)
source "$(dirname "$0")/../common.sh"
ROOT=$(repo_root)
CONFIG=${1:-$ROOT/configs/neural_recon/scannet.py}; CKPT=${2:?checkpoint}; shift 2 || true
PYTHONPATH="$ROOT:$PYTHONPATH" python "$ROOT/tools/test.py" "$CONFIG" "$CKPT" "$@"
