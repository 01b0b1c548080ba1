#!/usr/bin/env bash
# Evaluate the Gaze360 setting: per-video results JSON then MAE buckets.
CKPT=${1:-ckpts/multiclue_gaze_r50_gaze360}
python tools/test_gaze360_gaze.py configs/multiclue_gaze/multiclue_gaze_r50_gaze360.py "$CKPT" \
    --json data/gaze360/test.json --root data/gaze360/test_rawframes/
python tools/calculate_mae_gaze360.py \
    --evalfile results/results_multiclue_gaze_r50_gaze360_test.json \
    --anno data/gaze360/test.json
