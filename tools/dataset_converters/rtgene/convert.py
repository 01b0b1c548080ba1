#!/usr/bin/env python
"""Convert RT-GENE to the MCGaze COCO-VID 3-fold layout.

Same conversion math and output schema as the reference script
(tools/dataset_converters/rtgene/convert.py), with detection made
pluggable: pass ``--detections`` (precomputed boxes+landmarks JSON,
see mcgaze_tpu/data/rtgene_prepare.py::detections_from_json) or rely
on facenet_pytorch's MTCNN when it is installed (the reference's
detector; not TPU-resident either way — detection is a one-shot
CPU/GPU preprocessing step).
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)),
                            '..', '..', '..'))

from mcgaze_tpu.data import rtgene_prepare as R  # noqa: E402

ALL_FOLDS = ('train1', 'train2', 'train3', 'test1', 'test2', 'test3')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', required=True,
                    help='RT-GENE root holding sXXX_glasses/ dirs')
    ap.add_argument('--out', required=True, help='converted-dataset root')
    ap.add_argument('--detections', default=None,
                    help='precomputed detections JSON; omit to use '
                         'facenet_pytorch MTCNN (reference behavior)')
    ap.add_argument('--folds', nargs='+', default=list(ALL_FOLDS),
                    choices=ALL_FOLDS)
    args = ap.parse_args()

    if args.detections:
        detect = R.detections_from_json(args.detections)
    else:
        try:
            detect = R.mtcnn_detector()
        except ImportError:
            sys.exit('facenet_pytorch is not installed; provide '
                     '--detections with precomputed boxes+landmarks')
    stats = R.convert(args.root, args.out, detect, folds=args.folds)
    for fold, s in stats.items():
        print(f'{fold}: {s.videos} videos, {s.frames} frames kept, '
              f'{s.skipped} skipped')


if __name__ == '__main__':
    main()
