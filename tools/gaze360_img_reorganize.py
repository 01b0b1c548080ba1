#!/usr/bin/env python
"""Reorganise the raw Gaze360 release into per-video rawframes + JSONs.

CLI rebuild of the reference `tools/gaze360_img_reorganize.py` (which
hard-codes its paths at :10-12): splits the sorted train/test frame lists
into continuous single-person videos, renumbers frames, unifies each video's
resolution to its first frame, and — for the l2cs setting — drops frames
whose metadata face box is [-1,-1,-1,-1] (reference :104-133). Also emits
the COCO-VID annotation JSON per split (the reference defers that to
`tools/dataset_converters/gaze360/generate_json_from_ori.py`).

Usage:
  python tools/gaze360_img_reorganize.py \
      --imgs /path/to/gaze360/imgs --metadata /path/to/metadata.mat \
      --splits-dir /path/to/gaze360  --out data/ \
      [--settings gaze360 l2cs] [--splits train test] [--workers 16]
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

from mcgaze_tpu.data.gaze360_prepare import prepare_split  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--imgs', required=True,
                    help='raw Gaze360 imgs/ directory')
    ap.add_argument('--metadata', default=None,
                    help='metadata.mat (required for the l2cs setting)')
    ap.add_argument('--splits-dir', required=True,
                    help='directory holding train.txt/test.txt')
    ap.add_argument('--out', default='data',
                    help='output root; creates <out>/<setting>/...')
    ap.add_argument('--settings', nargs='+', default=['gaze360', 'l2cs'],
                    choices=['gaze360', 'l2cs'])
    ap.add_argument('--splits', nargs='+', default=['train', 'test'])
    ap.add_argument('--workers', type=int, default=16)
    args = ap.parse_args()

    for setting in args.settings:
        for split in args.splits:
            txt = osp.join(args.splits_dir, f'{split}.txt')
            out_root = osp.join(args.out, setting)
            data = prepare_split(args.imgs, txt, out_root, split,
                                 setting=setting,
                                 metadata_mat=args.metadata,
                                 workers=args.workers)
            n_frames = sum(v['length'] for v in data['videos'])
            print(f'[{setting}/{split}] {len(data["videos"])} videos, '
                  f'{n_frames} frames -> {out_root}')


if __name__ == '__main__':
    main()
