#!/usr/bin/env bash
# Train the Gaze360 setting on the local TPU slice (single host: all chips
# via the data mesh; multi-host: see dist_train.sh).
python tools/train.py configs/multiclue_gaze/multiclue_gaze_r50_gaze360.py "$@"
