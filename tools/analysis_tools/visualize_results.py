#!/usr/bin/env python
"""Render a results JSON (tools/test_gaze360_gaze.py output) onto the
rawframes: per-frame face/eyes/head boxes + the fusion gaze arrow.

Cleaned-up rebuild of the reference's visual debug script
(tools/dataset_converters/gaze360/visual_gaze_under_resize.py, which
hard-codes the author's local paths): reads the same per-video result
schema {video_id, fusion_gazes, {clue}_bboxes (xywh|None), {clue}_score}
and writes annotated PNGs (and an optional mp4) per video.

Usage:
  python tools/analysis_tools/visualize_results.py \
      --results results/results_..._test.json --anno data/gaze360/test.json \
      --root data/gaze360/test_rawframes/ --out visual/ [--videos 5] [--mp4]
"""
import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

import numpy as np

CLUE_COLORS = {'face': (0, 200, 255), 'eyes': (0, 255, 0),
               'head': (255, 80, 80)}                       # BGR
SCORE_THRESHOLD = 0.5


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('--results', required=True)
    p.add_argument('--anno', required=True)
    p.add_argument('--root', required=True)
    p.add_argument('--out', required=True)
    p.add_argument('--videos', type=int, default=5,
                   help='first N videos (0 = all)')
    p.add_argument('--mp4', action='store_true',
                   help='also encode an .mp4 per video')
    return p.parse_args()


def draw_frame(img, res, t):
    import cv2
    for clue, color in CLUE_COLORS.items():
        box = res[f'{clue}_bboxes'][t]
        score = res[f'{clue}_score'][t]
        if box is None or score < SCORE_THRESHOLD:
            continue
        x, y, w, h = (int(round(v)) for v in box)
        cv2.rectangle(img, (x, y), (x + w, y + h), color, 1)
        cv2.putText(img, f'{clue} {score:.2f}', (x, max(y - 2, 10)),
                    cv2.FONT_HERSHEY_PLAIN, 0.9, color, 1)
    head = res['head_bboxes'][t]
    if head is not None:
        gx, gy, _gz = res['fusion_gazes'][t]
        cx = int(round(head[0] + head[2] / 2))
        cy = int(round(head[1] + head[3] / 2))
        ln = 0.6 * head[2]
        # rendering convention is (-gx, -gy) — same vector, same arrow
        # as the reference visual script (:82) and demo/gaze_demo.py
        cv2.arrowedLine(img, (cx, cy),
                        (int(round(cx - ln * gx)),
                         int(round(cy - ln * gy))),
                        (255, 255, 0), 2)
    return img


def main():
    args = parse_args()
    import cv2

    results = json.load(open(args.results))
    anno = json.load(open(args.anno))
    videos = {v['id']: v for v in anno['videos']}
    by_vid = {r['video_id']: r for r in results}
    todo = list(by_vid)[:args.videos] if args.videos else list(by_vid)
    for vid in todo:
        res, video = by_vid[vid], videos[vid]
        d = osp.join(args.out, str(vid))
        os.makedirs(d, exist_ok=True)
        writer = None
        for t, name in enumerate(video['file_names']):
            img = cv2.imread(osp.join(args.root, name))
            if img is None:
                raise FileNotFoundError(osp.join(args.root, name))
            img = draw_frame(img, res, t)
            cv2.imwrite(osp.join(d, f'{t:05d}.png'), img)
            if args.mp4:
                if writer is None:
                    writer = cv2.VideoWriter(
                        osp.join(args.out, f'{vid}.mp4'),
                        cv2.VideoWriter_fourcc(*'mp4v'), 24,
                        (img.shape[1], img.shape[0]))
                writer.write(img)
        if writer is not None:
            writer.release()
        print(f'wrote {d} ({len(video["file_names"])} frames)')


if __name__ == '__main__':
    main()
