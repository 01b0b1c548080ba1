"""Train-step throughput: ms/step and clips/s for the compiled
train_step at the reference batch, per dtype.

The reference trains fp32 (no fp16 hook in its configs), so f32 is this
repo's parity default; this script measures what switching the compute
dtype (`--cfg-options model.dtype=bfloat16` on tools/train.py) buys on
TPU, plus the first-step loss in both dtypes as a sanity signal.

Serial-chain timing via the donated state: the returned state feeds the
next iteration, so steps chain naturally; one loss readback at the end.

Usage: python tools/analysis_tools/train_bench.py [--batch 32]
           [--dtypes float32 bfloat16]
"""
import argparse
import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--image', type=int, default=224)
    ap.add_argument('--iters', type=int, default=10)
    ap.add_argument('--warmup', type=int, default=2)
    ap.add_argument('--dtypes', nargs='+',
                    default=['float32', 'bfloat16'])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mcgaze_tpu.models.mcgaze import ModelConfig
    from mcgaze_tpu.train.loop import (OptimConfig, create_train_state,
                                       make_train_step)
    from mcgaze_tpu.train.targets import slot_layout_from_counts

    rng = np.random.RandomState(0)
    b, t, img = args.batch, 7, args.image
    imgs = rng.randn(b, t, img, img, 3).astype(np.float32)
    whwh = np.tile(np.array([img] * 4, np.float32), (b, t, 1))
    boxes = np.zeros((b, t, 3, 4), np.float32)
    valid = np.zeros((b, t, 3), np.float32)
    gazes = np.zeros((b, t, 3, 3), np.float32)
    bl = [[40, 40, 180, 200], [60, 80, 120, 110], [20, 30, 200, 210]]
    gl = [[0, 0, -1]] * 3
    sb, sv, sg = slot_layout_from_counts(bl, gl)
    boxes[:], valid[:], gazes[:] = sb, sv, sg
    batch = dict(imgs=jnp.asarray(imgs), img_whwh=jnp.asarray(whwh),
                 gt_boxes=jnp.asarray(boxes), gt_valid=jnp.asarray(valid),
                 gt_gazes=jnp.asarray(gazes))

    for dtype in args.dtypes:
        cfg = ModelConfig(dtype=dtype)
        oc = OptimConfig()
        state = create_train_state(cfg, oc, jax.random.PRNGKey(0),
                                   image_size=(img, img))
        step = make_train_step(cfg, oc)
        for _ in range(args.warmup):
            state, logs = step(state, batch)
        float(logs['loss'])
        start = time.perf_counter()
        for _ in range(args.iters):
            state, logs = step(state, batch)
        loss = float(logs['loss'])             # single completion barrier
        dt = (time.perf_counter() - start) / args.iters
        print(json.dumps(dict(
            dtype=dtype, ms_per_step=round(dt * 1e3, 2),
            clips_per_sec=round(b / dt, 1), loss=round(loss, 4))))
    return 0


if __name__ == '__main__':
    sys.exit(main())
