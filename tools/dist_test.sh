#!/usr/bin/env bash
# Multi-host eval launcher (reference: tools/dist_test.sh). Each TPU host
# evaluates its shard of the dataset (tiseg_tpu.apis.multi_process_test);
# results are gathered across processes.
CONFIG=$1
CHECKPOINT=$2
shift 2
python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" "$@"
