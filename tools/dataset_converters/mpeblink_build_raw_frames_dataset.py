#!/usr/bin/env python
"""Build MPEblink rawframes + COCO-VID JSONs from the video release.

Same surface as the reference script
(tools/dataset_converters/mpeblink_build_raw_frames_dataset.py):
`--root` points at the dataset root holding {validate,train,test}/<vid>/
{video.mp4, annote.json}; output goes to <root>/{split}_rawframes and
<root>/annotations/{split}.json (or --out). See
mcgaze_tpu/data/mpeblink_prepare.py for the behavioral spec.
"""
import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)),
                            '..', '..'))

from mcgaze_tpu.data.mpeblink_prepare import prepare  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', required=True, help='Path to dataset root')
    ap.add_argument('--out', default=None,
                    help='output root (default: --root, like the '
                         'reference)')
    ap.add_argument('--workers', type=int, default=4)
    args = ap.parse_args()

    t0 = time.time()
    stats = prepare(args.root, args.out, workers=args.workers)
    if not stats:
        sys.exit(f'no split dirs (validate/train/test) under {args.root}')
    for split, s in stats.items():
        print(f'{split}: {s.videos} videos, {s.frames} frames, '
              f'{s.annotations} tracks')
    print(f'Done in {time.time() - t0:.1f}s')


if __name__ == '__main__':
    main()
