"""Eval-forward time breakdown on the real chip: backbone / +FPN / full
model at increasing stage counts. Differences isolate where the
non-backbone time goes (stage heads + RoIAlign vs neck). Serial-chain
timing, one readback (bench.py discipline — the axon tunnel breaks
per-step readbacks).

Usage:
  python tools/analysis_tools/step_breakdown.py              # gaze path
  python tools/analysis_tools/step_breakdown.py --family query
      [--batch 4] [--height 384 --width 640]    # InstBlink 100-query
"""
import argparse
import json
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))


def _time(fn, iters, warmup):
    from mcgaze_tpu.utils.benchmarking import serial_chain_time
    return serial_chain_time(fn, iters, warmup)


def bench_query(args):
    """InstBlink breakdown: backbone / +FPN / full model at 2, 4, 6
    stages on the MPEblink clip shape (T=11, 640x360 -> 384x640 canvas,
    Q=100). full_Nstage - backbone_fpn isolates the 100-query head path
    (RoIAlign + dual-layout attention + DynamicConv + towers) that the
    gaze path runs at only Q=3."""
    import jax
    import jax.numpy as jnp

    from mcgaze_tpu.models.fpn import FPN
    from mcgaze_tpu.models.query_detector import (QueryDetectorConfig,
                                                  init_query_model)
    from mcgaze_tpu.models.resnet import ResNet

    dt = jnp.dtype(args.dtype)
    t = QueryDetectorConfig().clip_length
    n = args.batch * t
    h, w = args.height, args.width
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(n, h, w, 3).astype(np.float32))
    whwh = jnp.tile(jnp.asarray([[640., 360., 640., 360.]], jnp.float32),
                    (n, 1))
    x = imgs.astype(dt)
    results = {}

    backbone = ResNet(50, dtype=dt)
    bvars = backbone.init(jax.random.PRNGKey(0), x[:1])

    @jax.jit
    def bb(v, xx, eps):
        outs = backbone.apply(v, xx + eps)
        return (sum(jnp.sum(o) for o in outs) * 1e-12).astype(jnp.float32)

    results['backbone'] = _time(lambda e: bb(bvars, x, e),
                                args.iters, args.warmup)

    from flax import linen as nn

    class _BF(nn.Module):
        dtype: jnp.dtype = dt

        @nn.compact
        def __call__(self, xx):
            return FPN(256, 4, dtype=self.dtype, name='neck')(
                ResNet(50, dtype=self.dtype, name='backbone')(xx))

    bf = _BF()
    bfvars = bf.init(jax.random.PRNGKey(0), x[:1])

    @jax.jit
    def bbf(v, xx, eps):
        outs = bf.apply(v, xx + eps)
        return (sum(jnp.sum(o) for o in outs) * 1e-12).astype(jnp.float32)

    results['backbone_fpn'] = _time(lambda e: bbf(bfvars, x, e),
                                    args.iters, args.warmup)

    for stages in (2, 4, 6):
        cfg = QueryDetectorConfig(dtype=args.dtype, num_stages=stages)
        model, variables = init_query_model(cfg, jax.random.PRNGKey(0),
                                            image_size=(h, w))

        @jax.jit
        def full(v, ii, ww, eps, model=model):
            out = model.apply(v, ii + eps, ww, clip_length=t)
            last = out['stages'][-1]
            dep = jnp.sum(last['boxes']) + jnp.sum(last['cls_logits'])
            if 'blink_logits' in last:
                dep = dep + jnp.sum(last['blink_logits'])
            return (dep * 1e-12).astype(jnp.float32)

        results[f'full_{stages}stage'] = _time(
            lambda e, f=full, v=variables: f(v, imgs, whwh, e),
            args.iters, args.warmup)

    ms = {k: round(v * 1e3, 3) for k, v in results.items()}
    ms['fpn'] = round(ms['backbone_fpn'] - ms['backbone'], 3)
    ms['per_stage'] = round((ms['full_6stage'] - ms['full_2stage']) / 4, 3)
    ms['head_path_6stage'] = round(
        ms['full_6stage'] - ms['backbone_fpn'], 3)
    ms['clips_per_sec_6stage'] = round(
        args.batch / (ms['full_6stage'] / 1e3), 2)
    print(json.dumps(ms))
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=32, help='clips per step')
    ap.add_argument('--image', type=int, default=224)
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--warmup', type=int, default=3)
    ap.add_argument('--dtype', default='bfloat16')
    ap.add_argument('--family', choices=('gaze', 'query'), default='gaze')
    ap.add_argument('--height', type=int, default=384,
                    help='--family query canvas height')
    ap.add_argument('--width', type=int, default=640,
                    help='--family query canvas width')
    args = ap.parse_args()

    from mcgaze_tpu.utils.env import setup_jax_platform
    setup_jax_platform()      # platform + persistent compile cache
    if args.family == 'query':
        args.batch = min(args.batch, 4) if args.batch == 32 else args.batch
        return bench_query(args)

    import jax
    import jax.numpy as jnp

    from mcgaze_tpu.models.fpn import FPN
    from mcgaze_tpu.models.mcgaze import MCGazeModel, ModelConfig, init_model
    from mcgaze_tpu.models.resnet import ResNet

    dt = jnp.dtype(args.dtype)
    n = args.batch * 7
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(n, args.image, args.image, 3)
                       .astype(np.float32))
    whwh = jnp.tile(jnp.asarray([[args.image] * 4], jnp.float32), (n, 1))
    x = imgs.astype(dt)

    results = {}

    backbone = ResNet(50, dtype=dt)
    bvars = backbone.init(jax.random.PRNGKey(0), x[:1])

    @jax.jit
    def bb(v, xx, eps):
        outs = backbone.apply(v, xx + eps)
        return (sum(jnp.sum(o) for o in outs) * 1e-12).astype(jnp.float32)

    results['backbone'] = _time(lambda e: bb(bvars, x, e),
                                args.iters, args.warmup)

    from flax import linen as nn

    class _BF(nn.Module):
        dtype: jnp.dtype = dt

        @nn.compact
        def __call__(self, xx):
            return FPN(256, 4, dtype=self.dtype, name='neck')(
                ResNet(50, dtype=self.dtype, name='backbone')(xx))

    bf = _BF()
    bfvars = bf.init(jax.random.PRNGKey(0), x[:1])

    @jax.jit
    def bbf(v, xx, eps):
        outs = bf.apply(v, xx + eps)
        return (sum(jnp.sum(o) for o in outs) * 1e-12).astype(jnp.float32)

    results['backbone_fpn'] = _time(lambda e: bbf(bfvars, x, e),
                                    args.iters, args.warmup)

    for stages in (2, 4):
        cfg = ModelConfig(dtype=args.dtype, num_stages=stages,
                          stage_loss_weights=(1.0,) * stages)
        model, variables = init_model(cfg, jax.random.PRNGKey(0),
                                      image_size=(args.image, args.image))

        @jax.jit
        def full(v, ii, ww, eps, model=model):
            out = model.apply(v, ii + eps, ww, clip_length=7)
            last = out['stages'][-1]
            dep = (jnp.sum(last['boxes']) + jnp.sum(last['gaze']['fusion'])
                   ) * 1e-12
            return dep.astype(jnp.float32)

        results[f'full_{stages}stage'] = _time(
            lambda e, f=full, v=variables: f(v, imgs, whwh, e),
            args.iters, args.warmup)

    ms = {k: round(v * 1e3, 3) for k, v in results.items()}
    ms['fpn'] = round(ms['backbone_fpn'] - ms['backbone'], 3)
    ms['per_stage'] = round(
        (ms['full_4stage'] - ms['full_2stage']) / 2, 3)
    ms['head_path_4stage'] = round(
        ms['full_4stage'] - ms['backbone_fpn'], 3)
    print(json.dumps(ms))
    return 0


if __name__ == '__main__':
    sys.exit(main())
