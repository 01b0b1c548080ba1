#!/usr/bin/env python
"""FLOPs / memory-traffic analysis of the compiled MCGaze forward.

Rebuild of the reference `tools/analysis_tools/get_flops.py` (mmcv
module-hook counter): here the numbers come from XLA's cost model on the
ACTUAL compiled program (post-fusion), which is exact rather than the
per-module estimate the reference prints.

Usage:
  python tools/analysis_tools/get_flops.py <config> [--shape 224 224]
      [--clip-length 7] [--train]
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

from mcgaze_tpu.utils.env import setup_jax_platform  # noqa: E402


def human(n, unit=''):
    for div, suf in ((1e12, 'T'), (1e9, 'G'), (1e6, 'M'), (1e3, 'K')):
        if n >= div:
            return f'{n / div:.3f} {suf}{unit}'
    return f'{n:.1f} {unit}'


def main():
    setup_jax_platform()
    ap = argparse.ArgumentParser()
    ap.add_argument('config')
    ap.add_argument('--shape', type=int, nargs=2, default=None,
                    help='input H W (default: config canvas)')
    ap.add_argument('--clip-length', type=int, default=None)
    ap.add_argument('--train', action='store_true',
                    help='analyse the full train step (fwd+bwd+optimizer) '
                         'instead of eval forward')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mcgaze_tpu.utils.config import load_config
    from mcgaze_tpu.utils.profiling import cost_analysis

    cfg = load_config(args.config)
    h, w = args.shape or cfg.eval_cfg.canvas
    t = args.clip_length or cfg.model.clip_length

    if args.train:
        from mcgaze_tpu.train.loop import (create_train_state,
                                           make_train_step)
        state = create_train_state(cfg.model, cfg.optim,
                                   jax.random.PRNGKey(0), image_size=(h, w))
        step = make_train_step(cfg.model, cfg.optim)
        b = 1
        batch = dict(
            imgs=jnp.zeros((b, t, h, w, 3), jnp.float32),
            img_whwh=jnp.tile(jnp.asarray([w, h, w, h], jnp.float32),
                              (b, t, 1)),
            gt_boxes=jnp.zeros((b, t, 3, 4), jnp.float32),
            gt_valid=jnp.ones((b, t, 3), jnp.float32),
            gt_gazes=jnp.tile(jnp.asarray([0., 0., -1.]), (b, t, 3, 1)))
        ca = cost_analysis(step, state, batch)
        label = f'train step (1 clip x {t} frames, {h}x{w})'
    else:
        from mcgaze_tpu.models.mcgaze import init_model
        model, variables = init_model(cfg.model, jax.random.PRNGKey(0),
                                      image_size=(h, w))

        def fwd(variables, imgs, whwh):
            out = model.apply(variables, imgs, whwh, clip_length=t)
            last = out['stages'][-1]
            return last['boxes'], last['cls_logits'], last['gaze']['fusion']

        imgs = jnp.zeros((t, h, w, 3), jnp.float32)
        whwh = jnp.tile(jnp.asarray([[w, h, w, h]], jnp.float32), (t, 1))
        ca = cost_analysis(fwd, variables, imgs, whwh)
        label = f'eval forward (1 clip x {t} frames, {h}x{w})'

    tree = state.params if args.train else variables['params']
    n_params = sum(np.prod(x.shape) for x in jax.tree.leaves(tree))

    print('=' * 60)
    print(label)
    print(f'Params:         {human(float(n_params))}')
    if 'flops' in ca:
        print(f'FLOPs:          {human(ca["flops"], "FLOPs")}')
    if 'bytes accessed' in ca:
        print(f'HBM traffic:    {human(ca["bytes accessed"], "B")}')
        if ca.get('flops'):
            print(f'Arithmetic int: '
                  f'{ca["flops"] / ca["bytes accessed"]:.1f} FLOPs/B')
    if 'transcendentals' in ca:
        print(f'Transcendentals: {human(float(ca["transcendentals"]))}')
    print('=' * 60)


if __name__ == '__main__':
    main()
