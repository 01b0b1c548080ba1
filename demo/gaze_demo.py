#!/usr/bin/env python
"""Per-person video gaze demo: frames + head labels -> gaze-arrow mp4.

Script rebuild of the reference `MCGaze_demo/demo.ipynb` (cells 1-6):
  1. read per-frame head boxes (labels/%d.txt, `cls x1 y1 x2 y2`, cls 1 =
     head) and group consecutive frames with a CONSTANT person count into
     segments; within a segment person i is the i-th head sorted by x
     (notebook cell 1 — no tracker, same convention);
  2. per person: square head crop at 0.8 x the larger box side around the
     box center (cell 4), run the MCGaze model on the crop stream — here
     through the standard VideoGazeEvaluator (fixed 7-frame clips, stride
     4, overlap-averaged) instead of the notebook's variable-length <=100
     frame chunks, so every forward hits one compiled shape;
  3. draw the fused gaze as an arrow from the head center along
     (-gx, -gy) scaled by the box size (cell 5), re-encode mp4 (cell 6).

Usage:
  python demo/gaze_demo.py --work demo_work \
      --config configs/multiclue_gaze/multiclue_gaze_r50_l2cs.py \
      --checkpoint <ckpt> --out new_video.mp4
(run demo/head_det.py first to produce demo_work/{frames,labels})
"""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))

from mcgaze_tpu.utils.env import setup_jax_platform  # noqa: E402

import numpy as np

ARROW_COLOR = (230, 253, 11)     # BGR, notebook cell 5


def read_labels(path, head_class=1):
    """labels txt -> (M, 4) xyxy head boxes sorted by x1."""
    boxes = []
    if osp.exists(path):
        for line in open(path):
            parts = line.split()
            if parts and int(float(parts[0])) == head_class:
                boxes.append([float(v) for v in parts[1:5]])
    boxes.sort(key=lambda b: b[0])
    return boxes


def group_segments(frame_boxes):
    """Consecutive frames with constant person count -> segments
    [{'frame_id': [...], 'persons': [per-person list of boxes]}]."""
    segments = []
    cur = None
    for fid, boxes in enumerate(frame_boxes):
        n = len(boxes)
        if cur is None or n != len(cur['persons']):
            if cur is not None:
                segments.append(cur)
            cur = dict(frame_id=[], persons=[[] for _ in range(n)])
        cur['frame_id'].append(fid)
        for i in range(n):
            cur['persons'][i].append(boxes[i])
    if cur is not None:
        segments.append(cur)
    return segments


def square_crop(img, box, margin=0.8):
    """Square crop of side 2*l, l = margin * max(box h, box w), centered on
    the box center, clamped to the image (notebook cell 4)."""
    h, w = img.shape[:2]
    x1, y1, x2, y2 = box
    cy, cx = int(y1 + y2) // 2, int(x1 + x2) // 2
    l = int(max(y2 - y1, x2 - x1) * margin)
    l = max(l, 1)
    return img[max(0, cy - l):min(cy + l, h),
               max(0, cx - l):min(cx + l, w)]


def draw_gaze(img, box, gaze, scale=1.0):
    import cv2
    x1, y1, x2, y2 = box
    cy, cx = int(y1 + y2) // 2, int(x1 + x2) // 2
    l = int(max(y2 - y1, x2 - x1) * scale)
    thick = max(5, int(l * 0.01))
    cv2.arrowedLine(img, (cx, cy),
                    (int(cx - l * gaze[0]), int(cy - l * gaze[1])),
                    ARROW_COLOR, thickness=thick)


def main():
    setup_jax_platform()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--work', default='demo_work',
                    help='dir with frames/ and labels/ from head_det.py')
    ap.add_argument('--config',
                    default='configs/multiclue_gaze/'
                            'multiclue_gaze_r50_l2cs.py')
    ap.add_argument('--checkpoint', default=None)
    ap.add_argument('--out', default='new_video.mp4')
    ap.add_argument('--fps', type=float, default=25.0)
    ap.add_argument('--crop-margin', type=float, default=0.8)
    args = ap.parse_args()

    import cv2

    from mcgaze_tpu.evaluation.driver import VideoGazeEvaluator
    from mcgaze_tpu.utils.config import load_config
    from tools.test_gaze360_gaze import build_forward

    frames_dir = osp.join(args.work, 'frames')
    labels_dir = osp.join(args.work, 'labels')
    n_frames = len([f for f in os.listdir(frames_dir)
                    if f.endswith('.jpg')])
    frames = [cv2.imread(osp.join(frames_dir, f'{i}.jpg'))
              for i in range(n_frames)]
    frame_boxes = [read_labels(osp.join(labels_dir, f'{i}.txt'))
                   for i in range(n_frames)]
    segments = group_segments(frame_boxes)
    print(f'{n_frames} frames, {len(segments)} constant-person segments')

    cfg = load_config(args.config)
    forward = build_forward(cfg, args.checkpoint)
    evaluator = VideoGazeEvaluator(forward, cfg.eval_cfg)

    # per segment x person: crop stream -> fused gaze track
    for seg in segments:
        seg['gazes'] = []
        for boxes in seg['persons']:
            crops = [
                cv2.cvtColor(
                    square_crop(frames[fid], box, args.crop_margin),
                    cv2.COLOR_BGR2RGB)
                for fid, box in zip(seg['frame_id'], boxes)]
            res = evaluator.run_video(crops, video_id=0)
            seg['gazes'].append(np.asarray(res['fusion_gazes']))

    for seg in segments:
        for j, fid in enumerate(seg['frame_id']):
            for boxes, gazes in zip(seg['persons'], seg['gazes']):
                draw_gaze(frames[fid], boxes[j], gazes[j])

    h, w = frames[0].shape[:2]
    writer = cv2.VideoWriter(args.out,
                             cv2.VideoWriter_fourcc(*'mp4v'),
                             args.fps, (w, h))
    for fr in frames:
        writer.write(fr)
    writer.release()
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
