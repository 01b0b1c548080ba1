#!/usr/bin/env python
"""InstBlink end-to-end learning proof on a fabricated learnable task.

The query-family analogue of crop_sensitivity.py's gaze burn-in: build a
synthetic MPEblink-layout dataset where the task is unambiguous —
each video shows one bright textured rectangle drifting over a dark
noisy background (the "face" track), and on blink frames a dark
horizontal band is drawn across the rectangle — then drive the REAL
CLIs end-to-end:

  tools/train_instblink.py <cfg>          (N iters on the chip)
  tools/test_instblink.py <cfg> <ckpt> --eval

and report track mAP + blink action AP per checkpoint. A model that
learns must localise the rectangle (track AP -> ~1) and classify the
band (blink AP well above the ~0 chance level of random logits).

The reference cannot run this proof at all: its MPEblink/TeViT path has
no video-level inference (mpeblink.py:334 raises NotImplementedError)
and its eval needs the (unshipped) datasets.

Usage:
  python tools/analysis_tools/instblink_burnin.py --root /tmp/ib_burnin
      [--iters 600] [--train-videos 20] [--test-videos 6]
"""
import argparse
import json
import os
import os.path as osp
import re
import subprocess
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

import cv2
import numpy as np

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))

H, W = 96, 128
FRAMES = 24
BOX_H, BOX_W = 28, 36

CFG = """
from mcgaze_tpu.data.instblink_dataset import InstBlinkDataConfig
from mcgaze_tpu.evaluation.instblink_driver import InstBlinkEvalConfig
from mcgaze_tpu.models.query_detector import QueryDetectorConfig
from mcgaze_tpu.train.loop import OptimConfig

model = QueryDetectorConfig(
    num_stages=3, clip_length=5, num_queries=20, num_classes=1,
    channels=64, ffn_channels=256, num_heads=4, dyn_feat_channels=32,
    with_blink=True, max_per_img=4, max_instances=2)
optim = OptimConfig(lr=5e-4, max_iters={iters}, warmup_iters=100,
                    lr_steps=({step},), grad_clip_norm=0.5)
data_train = InstBlinkDataConfig(
    ann_file='{root}/train.json', img_prefix='{root}/rawframes/',
    clip_length=5, scale=(128, 96), canvas=(96, 128), batch_size=4,
    max_instances=2)
data_test = InstBlinkDataConfig(
    ann_file='{root}/test.json', img_prefix='{root}/rawframes/',
    clip_length=5, scale=(128, 96), canvas=(96, 128), max_instances=2,
    flip_ratio=0.0, keep_ratio=False)
eval_cfg = InstBlinkEvalConfig(clip_length=5, overlap=2, max_per_img=4,
                               score_threshold=0.05)
work_dir = '{root}/work'
checkpoint_interval = {ckpt_every}
log_interval = 50
"""


def fabricate(root, n_videos, rng, split):
    videos, annotations = [], []
    for i in range(n_videos):
        vid = i + 1
        d = osp.join(root, 'rawframes', f'{split}{vid:03d}')
        os.makedirs(d, exist_ok=True)
        # linear drift, kept in-bounds
        x0 = rng.uniform(4, W - BOX_W - 4)
        y0 = rng.uniform(4, H - BOX_H - 4)
        vx = rng.uniform(-1.5, 1.5)
        vy = rng.uniform(-1.0, 1.0)
        # two blink events of 2-3 frames, apart from each other
        starts = rng.choice(np.arange(2, FRAMES - 5, 3), 2, replace=False)
        events = sorted((int(s), int(s) + int(rng.randint(1, 3)))
                        for s in starts)
        blink_binary = np.zeros(FRAMES, np.int64)
        for s, e in events:
            blink_binary[s:e + 1] = 1

        names, bboxes = [], []
        tex = rng.randint(170, 255, (BOX_H, BOX_W, 3), np.uint8)
        for f in range(FRAMES):
            x = float(np.clip(x0 + vx * f, 2, W - BOX_W - 2))
            y = float(np.clip(y0 + vy * f, 2, H - BOX_H - 2))
            img = rng.randint(0, 60, (H, W, 3), np.uint8)
            xi, yi = int(round(x)), int(round(y))
            img[yi:yi + BOX_H, xi:xi + BOX_W] = tex
            if blink_binary[f]:
                band = BOX_H // 3
                img[yi + band:yi + 2 * band, xi:xi + BOX_W] = 20
            name = f'{split}{vid:03d}/{f:05d}.png'
            cv2.imwrite(osp.join(root, 'rawframes', name), img)
            names.append(name)
            bboxes.append([x, y, float(BOX_W), float(BOX_H)])
        videos.append(dict(id=vid, height=H, width=W, length=FRAMES,
                           file_names=names))
        annotations.append(dict(
            id=vid, video_id=vid, category_id=1, bboxes=bboxes,
            blinks_binary=blink_binary.tolist(),
            blinks=[list(e) for e in events]))
    with open(osp.join(root, f'{split}.json'), 'w') as f:
        json.dump(dict(videos=videos, annotations=annotations,
                       categories=[dict(id=1, name='person_face')]), f)


def run(args):
    # cwd=REPO: the axon TPU plugin only registers from the repo dir
    # (crop_sensitivity.py does the same); all dataset paths are absolute
    env = dict(os.environ,
               PYTHONPATH=REPO + os.pathsep + os.environ.get(
                   'PYTHONPATH', ''))
    env.pop('XLA_FLAGS', None)
    r = subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                       capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-3000:])
        raise SystemExit(f'command failed: {args}')
    return r.stdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', default='/tmp/ib_burnin')
    ap.add_argument('--iters', type=int, default=600)
    ap.add_argument('--train-videos', type=int, default=20)
    ap.add_argument('--test-videos', type=int, default=6)
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    root = osp.abspath(args.root)
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    fabricate(root, args.train_videos, rng, 'train')
    rng2 = np.random.RandomState(args.seed + 1000)
    fabricate(root, args.test_videos, rng2, 'test')

    ckpt_every = max(args.iters // 4, 1)
    cfg_path = osp.join(root, 'burnin_cfg.py')
    with open(cfg_path, 'w') as f:
        f.write(CFG.format(root=root, iters=args.iters,
                           step=int(args.iters * 0.75),
                           ckpt_every=ckpt_every))

    print(f'[burnin] training {args.iters} iters '
          f'({args.train_videos} videos)...', flush=True)
    out = run([f"{REPO}/tools/train_instblink.py", cfg_path])
    print(out.strip().splitlines()[-1])

    for step in (ckpt_every, args.iters):
        ckpt = osp.join(root, 'work', f'ckpt_{step}')
        if not osp.isdir(ckpt):
            continue
        out = run([f'{REPO}/tools/test_instblink.py', cfg_path, ckpt,
                   '--out', osp.join(root, f'results_{step}.json'),
                   '--eval'])
        lines = [ln for ln in out.splitlines()
                 if re.match(r'track mAP|blink action', ln)]
        print(f'[burnin] iter {step}: ' + ' | '.join(lines), flush=True)


if __name__ == '__main__':
    main()
