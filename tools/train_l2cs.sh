#!/usr/bin/env bash
python tools/train.py configs/multiclue_gaze/multiclue_gaze_r50_l2cs.py "$@"
