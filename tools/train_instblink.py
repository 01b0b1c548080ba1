#!/usr/bin/env python
"""Train InstBlink / TeViT (the query-detector family).

  python tools/train_instblink.py configs/instblink/instblink_r50_mpeblink.py
  python tools/train_instblink.py <cfg> --synthetic --max-iters 20  # smoke

Counterpart of the reference's tools/train.py driving
detectors/instblink.py (the reference trains these families through the
same generic mmcv runner; this CLI drives the jitted query train step,
train/query_loop.py).
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('config')
    p.add_argument('--work-dir')
    p.add_argument('--max-iters', type=int)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--resume-from')
    p.add_argument('--synthetic', action='store_true',
                   help='random in-memory batches (no dataset needed)')
    p.add_argument('--log-interval', type=int)
    return p.parse_args()


def synthetic_batches(cfg, seed=0):
    """Random (B, ...) batches with plausible multi-instance GT."""
    mc, dc = cfg.model, cfg.data_train
    rng = np.random.RandomState(seed)
    b, t, m = dc.batch_size, mc.clip_length, mc.max_instances
    h, w = dc.canvas
    while True:
        boxes = rng.rand(b, m, t, 4).astype(np.float32)
        boxes[..., 0] *= w * 0.7
        boxes[..., 1] *= h * 0.7
        boxes[..., 2] = boxes[..., 0] + 20 + boxes[..., 2] * 60
        boxes[..., 3] = boxes[..., 1] + 20 + boxes[..., 3] * 60
        batch = dict(
            imgs=rng.randn(b * t, h, w, 3).astype(np.float32) * 0.2,
            whwh=np.tile(np.asarray([[w, h, w, h]], np.float32),
                         (b * t, 1)),
            gt_boxes=boxes,
            gt_labels=rng.randint(0, mc.num_classes,
                                  size=(b, m)).astype(np.int32),
            gt_present=rng.rand(b, m, t) > 0.2,
            inst_valid=np.concatenate(
                [np.ones((b, max(m - 1, 1)), bool),
                 np.zeros((b, m - max(m - 1, 1)), bool)], axis=1),
        )
        if mc.with_blink:
            batch['gt_blinks'] = rng.randint(
                0, 2, size=(b, m, t)).astype(np.float32)
        yield batch


def main():
    args = parse_args()
    from mcgaze_tpu.utils.env import setup_jax_platform
    setup_jax_platform()
    import jax

    from mcgaze_tpu.train.hooks import CheckInvalidLoss, TextLogger
    from mcgaze_tpu.train.query_loop import (create_query_train_state,
                                             make_query_train_step)
    from mcgaze_tpu.utils.checkpoint import (restore_checkpoint,
                                             save_checkpoint)
    from mcgaze_tpu.utils.query_config import load_query_config

    cfg = load_query_config(args.config)
    if args.work_dir:
        cfg.work_dir = args.work_dir
    import os
    os.makedirs(cfg.work_dir, exist_ok=True)
    max_iters = args.max_iters or cfg.optim.max_iters
    log_interval = args.log_interval or cfg.log_interval

    state = create_query_train_state(
        cfg.model, cfg.optim, jax.random.PRNGKey(cfg.seed + args.seed),
        image_size=cfg.data_train.canvas)
    start_step = 0
    if args.resume_from:
        ckpt = restore_checkpoint(args.resume_from,
                                  target=dict(params=state.params))
        train_ckpt = restore_checkpoint(
            args.resume_from + '_train',
            target=dict(opt_state=state.opt_state,
                        step=np.zeros((), np.int32)))
        state = state.replace(params=ckpt['params'],
                              opt_state=train_ckpt['opt_state'])
        start_step = int(train_ckpt['step'])

    if args.synthetic:
        batches = synthetic_batches(cfg, args.seed)
    else:
        from mcgaze_tpu.data.instblink_dataset import InstBlinkClipDataset
        ds = InstBlinkClipDataset(cfg.data_train, seed=cfg.seed + args.seed)
        batches = ds.batches(seed=cfg.seed + args.seed)

    train_step = make_query_train_step(cfg.model, cfg.optim)
    logger = TextLogger(cfg.work_dir, max_iters, interval=log_interval)
    nan_guard = CheckInvalidLoss(interval=log_interval)
    for step in range(start_step, max_iters):
        batch = next(batches)
        state, logs = train_step(state, batch)
        if (step + 1) % log_interval == 0 or step + 1 == max_iters:
            logs = {k: float(v) for k, v in logs.items()}
            nan_guard.after_iter(step + 1, logs)
            lr = float(cfg.optim.lr)
            logger.after_iter(step + 1, logs, lr)
        if (step + 1) % cfg.checkpoint_interval == 0 or \
                step + 1 == max_iters:
            save_checkpoint(
                cfg.work_dir, step + 1, dict(params=state.params),
                train_tree=dict(opt_state=state.opt_state,
                                step=np.asarray(step + 1, np.int32)))
    print(f'done: {max_iters} iters, work_dir={cfg.work_dir}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
