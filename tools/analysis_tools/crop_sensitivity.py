"""Measure the eval-time crop-mode MAE sensitivity on a learnable
synthetic dataset (VERDICT round-1 item 5).

The reference test pipeline center-crops every frame with an UNSEEDED
per-frame random ratio ~ U[0.68, 1) (/root/reference/configs/_base_/
datasets/gaze360.py:29, transforms.py:1128-1144, threaded per frame in
tools/test_gaze360_gaze.py:87-94); this repo defaults to a deterministic
mid-range 0.84 crop (EvalConfig.crop_mode='fixed') with a seeded
'reference' mode replicating the reference distribution. This script
quantifies the MAE delta between the two modes:

  1. fabricate a gaze-learnable COCO-VID dataset (constant gaze per
     video, a line cue drawn inside the head box pointing along the
     gaze's (x, y) projection);
  2. burn in a small model through tools/train.py (the real CLI);
  3. score the SAME checkpoint through tools/test.py --eval mae with
     crop_mode=fixed and crop_mode=reference (two seeds);
  4. print one JSON line with the MAEs and the delta.

Usage: JAX_PLATFORMS=cpu python tools/analysis_tools/crop_sensitivity.py
           --work /tmp/cropsens [--iters 300]
"""
import argparse
import json
import os
import os.path as osp
import re
import subprocess
import sys
import textwrap

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

import numpy as np

REPO = osp.join(osp.dirname(osp.abspath(__file__)), '..', '..')

W = H = 64
HEAD = [14, 10, 40, 44]          # xywh, generous so crops keep the cue
FACE = [22, 18, 24, 20]
EYES = [24, 22, 20, 8]


def paint_frame(rng, gaze):
    """Noise background + a thick line from the head-box centre along the
    gaze's (x, -y) image projection. The cue is fully inside the head box
    so every legal crop (>= 0.68 of the frame, centre-anchored) keeps it."""
    import cv2
    img = rng.randint(0, 40, (H, W, 3), np.uint8)
    cx = HEAD[0] + HEAD[2] // 2
    cy = HEAD[1] + HEAD[3] // 2
    gx, gy, gz = (float(v) for v in gaze)
    n = max((gx * gx + gy * gy) ** 0.5, 1e-6)
    # direction cue: thick line along the (x, -y) projection; length and
    # endpoint colour encode the z component so all 3 DoF are visible
    ln = 6 + int(10 * min(1.0, n / max(abs(gz), 1e-6)))
    ex = int(round(cx + ln * gx / n))
    ey = int(round(cy - ln * gy / n))
    cv2.line(img, (cx, cy), (ex, ey), (255, 255, 255), 5)
    cv2.circle(img, (ex, ey), 3, (0, 255, 0), -1)
    cv2.circle(img, (cx, cy), 2, (255, 0, 0), -1)
    return img


def make_dataset(root, num_videos, length, seed):
    import cv2
    rng = np.random.RandomState(seed)
    videos, annotations = [], []
    ann_id = 1
    for vid in range(1, num_videos + 1):
        # constant per-video gaze, facing the camera (z < 0) so every
        # frame lands in the front-90 scorer bucket
        yaw = rng.uniform(-np.pi / 3, np.pi / 3)
        pitch = rng.uniform(-np.pi / 4, np.pi / 4)
        gaze = np.array([np.cos(pitch) * np.sin(yaw), np.sin(pitch),
                         -np.cos(pitch) * np.cos(yaw)])
        names = []
        for f in range(length):
            name = f'{vid:03d}/{f:05d}.png'
            path = osp.join(root, 'frames', name)
            os.makedirs(osp.dirname(path), exist_ok=True)
            cv2.imwrite(path, paint_frame(rng, gaze))
            names.append(name)
        videos.append(dict(id=vid, width=W, height=H, length=length,
                           file_names=names))
        for clue, box in (('face', FACE), ('eyes', EYES), ('head', HEAD)):
            annotations.append(dict(
                id=ann_id, video_id=vid, category_id=1,
                bboxes=[list(box)] * length,
                gaze=[gaze.tolist()] * length))
            ann_id += 1
    data = dict(videos=videos, annotations=annotations,
                categories=[dict(id=1, name='person_face')])
    ann = osp.join(root, 'anno.json')
    json.dump(data, open(ann, 'w'))
    return ann, osp.join(root, 'frames/')


CFG = textwrap.dedent("""
    from mcgaze_tpu.data.dataset import DataConfig
    from mcgaze_tpu.evaluation.driver import EvalConfig
    from mcgaze_tpu.models.mcgaze import ModelConfig
    from mcgaze_tpu.train.loop import OptimConfig

    model = ModelConfig(clip_length=7, backbone_depth=26, num_stages=2,
                        stage_loss_weights=(1.0, 1.0), ffn_channels=512)
    optim = OptimConfig(max_iters={iters}, warmup_iters=100,
                        lr_steps=({step},))
    data_train = DataConfig(ann_file={ann!r}, img_prefix={prefix!r},
                            scale=(64, 64), canvas=(64, 64),
                            crop_size=0.68, batch_size=8)
    data_test = data_train
    eval_cfg = EvalConfig(scale=(64, 64), canvas=(64, 64), clip_batch=4)
    checkpoint_interval = {iters}
    work_dir = {work_dir!r}
""")


def run(args, env_extra=None):
    env = dict(os.environ, JAX_PLATFORMS=os.environ.get(
        'JAX_PLATFORMS', 'cpu'))
    env.pop('XLA_FLAGS', None)
    if env_extra:
        env.update(env_extra)
    r = subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                       capture_output=True, text=True)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + r.stderr[-4000:])
        raise SystemExit(f'{args[0]} failed rc={r.returncode}')
    return r.stdout


def mae_from(stdout):
    m = re.search(r'MAE-Front180: ([0-9.]+)', stdout)
    return float(m.group(1)) if m else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--work', default='/tmp/cropsens')
    ap.add_argument('--iters', type=int, default=300)
    ap.add_argument('--videos', type=int, default=12)
    ap.add_argument('--frames', type=int, default=24)
    ap.add_argument('--train-dtype', default=None,
                    help='override model.dtype for the TRAINING run only '
                         '(e.g. bfloat16); params stay float32 '
                         '(flax param_dtype), so the checkpoint scores '
                         'through the identical f32 eval path — '
                         'apples-to-apples vs the f32 burn-in MAE')
    args = ap.parse_args()

    os.makedirs(args.work, exist_ok=True)
    ann, prefix = make_dataset(args.work, args.videos, args.frames, seed=7)
    cfg_path = osp.join(args.work, 'cfg.py')
    work_dir = osp.join(args.work, 'train')
    with open(cfg_path, 'w') as f:
        f.write(CFG.format(iters=args.iters, step=int(args.iters * 0.8),
                           ann=ann, prefix=prefix, work_dir=work_dir))

    print(f'training {args.iters} iters '
          f'(dtype {args.train_dtype or "config default (float32)"}) ...',
          flush=True)
    train_args = ['tools/train.py', cfg_path]
    if args.train_dtype:
        train_args += ['--cfg-options', f'model.dtype={args.train_dtype}']
    run(train_args)
    ckpt = osp.join(work_dir, f'ckpt_{args.iters}')

    out = {}
    for label, opts in (
            ('fixed', ['eval_cfg.crop_mode=fixed']),
            ('reference_s0', ['eval_cfg.crop_mode=reference',
                              'eval_cfg.crop_seed=0']),
            ('reference_s1', ['eval_cfg.crop_mode=reference',
                              'eval_cfg.crop_seed=1'])):
        # --l2cs: this synthetic json carries 3 annotation tracks per
        # video (face/eyes/head, the l2cs layout -> GT row anno_id*3);
        # the gaze360 scorer's 1-track-per-video indexing would pair
        # videos with the wrong GT
        stdout = run(['tools/test.py', cfg_path, ckpt, '--json', ann,
                      '--root', prefix, '--eval', 'mae', '--l2cs',
                      '--cfg-options'] + opts)
        out[label] = mae_from(stdout)
        print(f'{label}: MAE-Front180 {out[label]}', flush=True)

    ref = (out['reference_s0'] + out['reference_s1']) / 2
    print(json.dumps(dict(
        fixed_mae=out['fixed'], reference_mae_mean=ref,
        reference_seeds=[out['reference_s0'], out['reference_s1']],
        delta_deg=round(ref - out['fixed'], 4))))
    return 0


if __name__ == '__main__':
    sys.exit(main())
