#!/usr/bin/env python
"""Score a results JSON against Gaze360 GT (reference CLI surface:
tools/calculate_mae_gaze360.py --evalfile --anno). Prints the same three
buckets; "mean angular front 90" is the published MAE-Front180."""
import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from mcgaze_tpu.evaluation.mae import gaze_error


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--evalfile',
                   default='results/results_multiclue_gaze_r50_gaze360_'
                           'test.json')
    p.add_argument('--anno', default='data/gaze360/test.json')
    p.add_argument('--gaze-name', default='fusion_gazes')
    p.add_argument('--no-smooth', action='store_true')
    p.add_argument('--device', action='store_true',
                   help='score on the accelerator (one jitted program '
                        'over all videos, evaluation/mae_device.py); '
                        'f32 vs the default float64 numpy path — '
                        'agreement ~1e-4 deg')
    args = p.parse_args()

    eval_data = json.load(open(args.evalfile))
    anno_data = json.load(open(args.anno))
    if args.device:
        from mcgaze_tpu.evaluation.mae_device import gaze_error_device
        from mcgaze_tpu.utils.env import setup_jax_platform
        setup_jax_platform()
        res = gaze_error_device(eval_data, anno_data, args.gaze_name,
                                smooth=not args.no_smooth)
    else:
        res = gaze_error(eval_data, anno_data, args.gaze_name,
                         smooth=not args.no_smooth)
    print('%s mean angular error 360: %.2f' % (args.gaze_name,
                                               res['mae360']))
    print('%s mean angular front 90: %.2f' % (args.gaze_name,
                                              res['front90']))
    print('%s mean angular front 20: %.2f' % (args.gaze_name,
                                              res['front20']))


if __name__ == '__main__':
    main()
