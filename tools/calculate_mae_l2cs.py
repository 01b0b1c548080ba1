#!/usr/bin/env python
"""Score a results JSON in the l2cs setting (reference CLI surface:
tools/calculate_mae_l2cs.py): GT annotation row is anno_id*3 and the
front-20 bucket additionally requires |pitch| <= 20 deg. Note the
reference DOES apply the temporal smooth filter here too
(calculate_mae_l2cs.py:125), despite its own comment saying l2cs tracks
are non-contiguous — behaviour parity wins."""
import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from mcgaze_tpu.evaluation.mae import gaze_error


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--evalfile',
                   default='results/results_multiclue_gaze_r50_l2cs_'
                           'test.json')
    p.add_argument('--anno', default='data/l2cs/test.json')
    p.add_argument('--gaze-name', default='fusion_gazes')
    args = p.parse_args()

    eval_data = json.load(open(args.evalfile))
    anno_data = json.load(open(args.anno))
    res = gaze_error(eval_data, anno_data, args.gaze_name, smooth=True,
                     l2cs=True)
    print('%s mean angular error 360: %.2f' % (args.gaze_name,
                                               res['mae360']))
    print('%s mean angular front 90: %.2f' % (args.gaze_name,
                                              res['front90']))
    print('%s mean angular front 20: %.2f' % (args.gaze_name,
                                              res['front20']))


if __name__ == '__main__':
    main()
