#!/usr/bin/env python
"""Serving export: serialize the compiled eval forward to StableHLO.

TPU-native analogue of the reference's ONNX deployment tooling
(mmdet/core/export/, tools/deployment/pytorch2onnx.py): `jax.export`
captures the jitted clip-forward — params baked in or passed — as a
portable StableHLO artifact that any XLA runtime (TPU serving stacks,
IREE, PJRT plugins) can load without Python model code.

Usage:
  python tools/deployment/export_model.py <config> [checkpoint] \
      --out model.stablehlo [--batch-clips 8] [--dtype bfloat16]
  # verify a roundtrip:
  python tools/deployment/export_model.py <config> --out m.bin --selftest
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

from mcgaze_tpu.utils.env import setup_jax_platform  # noqa: E402

import numpy as np


def main():
    setup_jax_platform()
    ap = argparse.ArgumentParser()
    ap.add_argument('config')
    ap.add_argument('checkpoint', nargs='?', default=None)
    ap.add_argument('--out', required=True)
    ap.add_argument('--batch-clips', type=int, default=1,
                    help='clips per forward in the exported signature')
    ap.add_argument('--dtype', default=None)
    ap.add_argument('--selftest', action='store_true',
                    help='deserialize and re-execute to verify')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from mcgaze_tpu.utils.config import load_config

    cfg = load_config(args.config)
    t = cfg.model.clip_length
    h, w = cfg.eval_cfg.canvas
    n = args.batch_clips * t

    # build_forward closes over restored variables; re-wrap as jit fn of
    # (imgs, whwh) only so the artifact is self-contained.
    import dataclasses

    from mcgaze_tpu.models.mcgaze import init_model
    model_cfg = cfg.model
    if args.dtype:
        model_cfg = dataclasses.replace(model_cfg, dtype=args.dtype)
    model, variables = init_model(model_cfg, jax.random.PRNGKey(0),
                                  image_size=(h, w))
    if args.checkpoint:
        if args.checkpoint.endswith(('.pth', '.pt')):
            from mcgaze_tpu.utils.torch_convert import \
                convert_torch_checkpoint
            variables = convert_torch_checkpoint(args.checkpoint, variables)
        else:
            from mcgaze_tpu.utils.checkpoint import restore_checkpoint
            restored = restore_checkpoint(args.checkpoint)
            variables = {'params': restored['params'],
                         'stats': restored['stats']}

    @jax.jit
    def serve(imgs, whwh):
        out = model.apply(variables, imgs, whwh, clip_length=t)
        last = out['stages'][-1]
        return (last['boxes'], jax.nn.sigmoid(last['cls_logits'])[..., 0],
                last['gaze']['fusion'], last['gaze']['face'],
                last['gaze']['eyes'], last['gaze']['head'])

    spec = (jax.ShapeDtypeStruct((n, h, w, 3), jnp.float32),
            jax.ShapeDtypeStruct((n, 4), jnp.float32))
    exported = jexport.export(serve)(*spec)
    blob = exported.serialize()
    with open(args.out, 'wb') as f:
        f.write(blob)
    print(f'wrote {args.out}: {len(blob) / 1e6:.1f} MB StableHLO, '
          f'signature imgs({n},{h},{w},3) -> boxes/scores/4x gaze, '
          f'platforms {exported.platforms}')

    if args.selftest:
        rehydrated = jexport.deserialize(blob)
        rng = np.random.RandomState(0)
        imgs = jnp.asarray(rng.randn(n, h, w, 3), jnp.float32)
        whwh = jnp.tile(jnp.asarray([[w, h, w, h]], jnp.float32), (n, 1))
        ref = serve(imgs, whwh)
        got = rehydrated.call(imgs, whwh)
        for a, b in zip(ref, got):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)
        print('selftest OK: deserialized artifact matches live forward')


if __name__ == '__main__':
    main()
