#!/usr/bin/env bash
# Multi-host evaluation over a TPU pod slice: one process per host, videos
# rank-sharded, results gathered and written by process 0 (replaces the
# reference's tools/dist_test.sh + multi_gpu_test).
#
#   COORDINATOR_ADDRESS=host0:8476 NUM_PROCESSES=4 PROCESS_ID=$i \
#       bash tools/dist_test.sh <config> <ckpt> [test args...]
CONFIG=$1
CKPT=$2
export JAX_COORDINATOR_ADDRESS=${COORDINATOR_ADDRESS:-$JAX_COORDINATOR_ADDRESS}
PYTHONPATH="$(dirname "$0")/..":$PYTHONPATH \
    python "$(dirname "$0")/test_gaze360_gaze.py" "$CONFIG" "$CKPT" "${@:3}"
