#!/usr/bin/env python
"""Build COCO-VID annotation JSON from an already-reorganised Gaze360 split.

Rebuild of the reference `tools/dataset_converters/gaze360/
generate_json_from_ori.py` (schema at :27-58): videos carry
{height,width,length,file_names,id}; annotations carry one single-person
track per video with per-frame 3-vector `gaze`; category is `person_face`.

`tools/gaze360_img_reorganize.py` already writes these JSONs inline; this
entry point exists for parity and for regenerating JSON without re-writing
the images (it re-runs the same segmentation from the split txt).

Usage:
  python tools/dataset_converters/gaze360/generate_json_from_ori.py \
      --split-txt /path/to/test.txt --out annotations/test.json \
      --imgs /path/to/gaze360/imgs \
      [--setting l2cs --metadata /path/to/metadata.mat]
"""
import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..', '..'))

from mcgaze_tpu.data.gaze360_prepare import (  # noqa: E402
    build_coco_vid_json, load_face_bbox_index, parse_split_txt,
    resolve_records, segment_videos)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--split-txt', required=True)
    ap.add_argument('--imgs', required=True,
                    help='raw imgs/ root (for per-video resolution probe)')
    ap.add_argument('--out', required=True, help='output JSON path')
    ap.add_argument('--setting', default='gaze360',
                    choices=['gaze360', 'l2cs'])
    ap.add_argument('--metadata', default=None)
    args = ap.parse_args()

    import cv2
    bbox_index = (load_face_bbox_index(args.metadata)
                  if args.setting == 'l2cs' else None)
    records = resolve_records(parse_split_txt(args.split_txt), bbox_index)
    videos = segment_videos(records, drop_undetectable=args.setting == 'l2cs')

    entries = []
    for i, frames in enumerate(videos):
        vid = i + 1
        first = cv2.imread(osp.join(args.imgs, frames[0].rel_path))
        if first is None:
            raise FileNotFoundError(frames[0].rel_path)
        h, w = first.shape[:2]
        entries.append(dict(
            height=h, width=w, length=len(frames),
            file_names=[f'{vid}/{j:05d}.png' for j in range(len(frames))],
            id=vid, gazes=[list(f.gaze) for f in frames]))
    data = build_coco_vid_json(entries)
    os.makedirs(osp.dirname(osp.abspath(args.out)), exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(data, f)
    print(f'{len(data["videos"])} videos -> {args.out}')


if __name__ == '__main__':
    main()
