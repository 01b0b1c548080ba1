#!/usr/bin/env bash
# Multi-host training over a TPU pod slice. One process per host; JAX
# discovers peers through the coordinator (replaces the reference's
# torch.distributed.launch + NCCL env plumbing).
#
#   COORDINATOR_ADDRESS=host0:8476 NUM_PROCESSES=4 PROCESS_ID=$i \
#       bash tools/dist_train.sh <config> [train.py args...]
#
# On Cloud TPU pods, jax.distributed.initialize() autodetects all three
# variables and plain `python tools/train.py` per host suffices.
CONFIG=$1
export JAX_COORDINATOR_ADDRESS=${COORDINATOR_ADDRESS:-$JAX_COORDINATOR_ADDRESS}
PYTHONPATH="$(dirname "$0")/..":$PYTHONPATH \
    python "$(dirname "$0")/train.py" "$CONFIG" --seed 0 "${@:2}"
