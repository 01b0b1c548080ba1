#!/usr/bin/env python
"""Head detection stage of the demo: mp4 -> frames/%d.jpg + labels/%d.txt.

Rebuild of the reference `MCGaze_demo/head_det.py` + vendored YOLOv5
(`MCGaze_demo/yolo_head/detect.py:137-167`): extracts every frame of the
input video and writes per-frame label files with lines
`cls x1 y1 x2 y2 [conf]` in original-image pixels (class 1 = head,
crowdhuman convention) — the exact format `demo/gaze_demo.py` (and the
reference notebook cell 1) consumes.

The detector is the flax YOLOv5m from mcgaze_tpu.models.yolov5, jit-compiled
once and run over batches of frames (the reference runs frame-at-a-time).

Weights: pass the crowdhuman YOLOv5m checkpoint as either a torch state_dict
(.pt/.pth) or an .npz. Full pickled yolov5 checkpoints need their
state_dict extracted first (see --help epilog).
"""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))

from mcgaze_tpu.utils.env import setup_jax_platform  # noqa: E402

import numpy as np

EPILOG = """To extract a state_dict from an original crowdhuman_yolov5m.pt
(a fully pickled model object) run, in an env with the yolov5 repo:
    import torch
    ckpt = torch.load('crowdhuman_yolov5m.pt', map_location='cpu')
    sd = ckpt['model'].float().state_dict()
    torch.save(sd, 'crowdhuman_yolov5m_sd.pt')
"""


def load_yolo_variables(path, cfg):
    from mcgaze_tpu.models.yolov5 import convert_torch_yolo
    if path.endswith('.npz'):
        flat = dict(np.load(path))
        tree = {}
        for k, v in flat.items():
            parts = k.split('/')
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = v
        return tree
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(ckpt, dict) and 'model' in ckpt and not hasattr(
            ckpt['model'], 'keys'):
        ckpt = ckpt['model'].float().state_dict()
    elif isinstance(ckpt, dict) and all(
            hasattr(v, 'shape') for v in ckpt.values()):
        pass                                   # already a state_dict
    elif isinstance(ckpt, dict) and 'state_dict' in ckpt:
        ckpt = ckpt['state_dict']
    return convert_torch_yolo(ckpt, cfg)


def main():
    setup_jax_platform()
    ap = argparse.ArgumentParser(
        description=__doc__, epilog=EPILOG,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument('video', help='input mp4')
    ap.add_argument('weights', help='crowdhuman YOLOv5m state_dict (.pt/.npz)')
    ap.add_argument('--out-dir', default='demo_work',
                    help='writes <out>/frames and <out>/labels')
    ap.add_argument('--conf-thres', type=float, default=0.25)
    ap.add_argument('--iou-thres', type=float, default=0.45)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--img-size', type=int, default=640,
                    help='letterbox canvas (stride-32 multiple)')
    ap.add_argument('--save-conf', action='store_true')
    args = ap.parse_args()

    import cv2

    from mcgaze_tpu.models.yolov5 import HeadDetector, YoloConfig

    frames_dir = osp.join(args.out_dir, 'frames')
    labels_dir = osp.join(args.out_dir, 'labels')
    os.makedirs(frames_dir, exist_ok=True)
    os.makedirs(labels_dir, exist_ok=True)

    cfg = YoloConfig(img_size=args.img_size)
    detector = HeadDetector(load_yolo_variables(args.weights, cfg), cfg,
                            args.conf_thres, args.iou_thres)

    # stream the video one detector batch at a time — decoding the whole
    # mp4 into RAM first OOMs on long 1080p inputs (minutes of video are
    # tens of GB of BGR frames)
    cap = cv2.VideoCapture(args.video)
    n_heads = 0
    n_frames = 0
    start = 0
    while True:
        batch = []
        while len(batch) < args.batch:
            ret, frame = cap.read()
            if not ret:
                break
            batch.append(frame)
        if not batch:
            break
        # pad tail to the compiled batch shape
        pad = args.batch - len(batch)
        dets = detector(batch + [batch[-1]] * pad)[:len(batch)]
        for j, det in enumerate(dets):
            fid = start + j
            cv2.imwrite(osp.join(frames_dir, f'{fid}.jpg'), batch[j])
            with open(osp.join(labels_dir, f'{fid}.txt'), 'w') as f:
                for x1, y1, x2, y2, conf in det:
                    line = f'1 {x1:g} {y1:g} {x2:g} {y2:g}'
                    if args.save_conf:
                        line += f' {conf:g}'
                    f.write(line + '\n')
            n_heads += len(det)
        start += len(batch)
        n_frames += len(batch)
    cap.release()
    print(f'{n_frames} frames from {args.video}')
    print(f'{n_heads} head boxes -> {labels_dir}')


if __name__ == '__main__':
    main()
