#!/usr/bin/env bash
# Multi-host training launcher (reference: tools/dist_train.sh wrapped
# torch.distributed.launch). On TPU pods each host runs the same program and
# jax.distributed.initialize() discovers peers from the TPU environment, so
# the per-host command is identical:
#   bash tools/dist_train.sh <config> [extra args...]
CONFIG=$1
shift
python "$(dirname "$0")/train.py" "$CONFIG" "$@"
