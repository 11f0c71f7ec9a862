#!/usr/bin/env bash
# Shared launcher plumbing for workload scripts.
#
# Parity: /root/reference/scripts/*/run_*.sh wrap
# `torch.distributed.launch --nproc_per_node=$GPUS`.  On TPU there is one
# process per HOST (jax.distributed), not one per chip, and in-process
# parallelism comes from the device mesh — so the launcher collapses to
# plain `python tools/train.py` with optional multi-host env:
#   D3M_COORDINATOR / D3M_NUM_PROCESSES / D3M_PROCESS_ID  -> jax.distributed
#   D3M_PLATFORM=cpu D3M_CPU_DEVICES=8                    -> virtual mesh
repo_root() { cd "$(dirname "${BASH_SOURCE[1]}")/../.." && pwd; }
