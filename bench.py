"""Throughput benchmark: 7-frame R50 gaze inference, clips/sec on one chip.

Prints ONE json line {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 1000 clips/sec on a v5e-8, i.e.
125 clips/sec/chip; vs_baseline is measured clips/sec/chip over 125.
"""
import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=32,
                    help='clips per device per step')
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--warmup', type=int, default=3)
    ap.add_argument('--image', type=int, default=224)
    ap.add_argument('--dtype', default='bfloat16')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mcgaze_tpu.models.mcgaze import ModelConfig, MCGazeModel, init_model

    cfg = ModelConfig(dtype=args.dtype)
    model, variables = init_model(cfg, jax.random.PRNGKey(0),
                                  image_size=(args.image, args.image))
    t = cfg.clip_length
    n = args.batch * t

    @jax.jit
    def forward(variables, imgs, whwh, eps):
        # eps threads a scalar dependency through consecutive iterations so
        # the timed loop is a strict serial chain of device executions with
        # ONE host readback at the end. On this dev image the TPU sits
        # behind a ~27 ms RTT tunnel and block_until_ready returns before
        # execution finishes, so per-step readbacks measure the tunnel, not
        # the chip; chaining measures true sustained device throughput (the
        # number that matters for pipelined serving).
        out = model.apply(variables, imgs + eps, whwh, clip_length=t)
        last = out['stages'][-1]
        boxes = last['boxes']
        scores = jax.nn.sigmoid(last['cls_logits'])
        gaze = last['gaze']['fusion']
        dep = (jnp.sum(boxes) + jnp.sum(scores) + jnp.sum(gaze)) * 1e-12
        return boxes, scores, gaze, dep.astype(jnp.float32)

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(
        rng.randn(n, args.image, args.image, 3).astype(np.float32))
    whwh = jnp.tile(jnp.asarray([[args.image] * 4], jnp.float32), (n, 1))

    eps = jnp.float32(0.0)
    for _ in range(args.warmup):
        out = forward(variables, imgs, whwh, eps)
        eps = out[-1]
    float(eps)                                   # sync warmup
    start = time.perf_counter()
    eps = jnp.float32(0.0)
    for _ in range(args.iters):
        out = forward(variables, imgs, whwh, eps)
        eps = out[-1]
    float(eps)                                   # single completion barrier
    dt = (time.perf_counter() - start) / args.iters
    clips_per_sec = args.batch / dt

    print(json.dumps({
        'metric': 'gaze_clips_per_sec_per_chip',
        'value': round(clips_per_sec, 2),
        'unit': 'clips/s',
        'vs_baseline': round(clips_per_sec / 125.0, 3),
    }))
    return 0


if __name__ == '__main__':
    sys.exit(main())
