"""Throughput benchmark: 7-frame R50 gaze video evaluation, clips/sec on
one chip.

Prints ONE json line {"metric", "value", "unit", "vs_baseline", ...}.
Baseline target (BASELINE.md): >= 1000 clips/sec on a v5e-8, i.e.
125 clips/sec/chip; vs_baseline is measured clips/sec/chip over 125.

The primary metric is the REAL eval workload — consecutive 7-frame clips
of a video at stride 4, exactly what the reference's
tools/test_gaze360_gaze.py processes per video — run through the
production forward (evaluation/forward.py::fwd_dedup: consecutive clips
share T-stride frames, so backbone+FPN run once per unique frame; the
reference recomputes them per clip). `independent_clips_per_sec` is the
secondary number for non-overlapping clips (no sharing to exploit).
"""
import argparse
import json
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=32,
                    help='clips per device per step')
    ap.add_argument('--stride', type=int, default=4)
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--warmup', type=int, default=3)
    ap.add_argument('--repeats', type=int, default=3,
                    help='timed chains per metric; fastest reported '
                         '(shared host shows ±5%% run-to-run variance)')
    ap.add_argument('--image', type=int, default=224)
    ap.add_argument('--dtype', default='bfloat16')
    args = ap.parse_args()

    from mcgaze_tpu.utils.env import setup_jax_platform
    setup_jax_platform()          # persistent compile cache + platform

    import jax
    import jax.numpy as jnp

    from mcgaze_tpu.evaluation.forward import make_eval_forward
    from mcgaze_tpu.models.mcgaze import ModelConfig

    cfg = ModelConfig(dtype=args.dtype)
    t = cfg.clip_length
    k = args.batch
    from mcgaze_tpu.utils.benchmarking import serial_chain_time

    _model, variables, fwd, fwd_dedup = make_eval_forward(
        cfg, canvas=(args.image, args.image))

    def chain(fn):
        return serial_chain_time(fn, args.iters, args.warmup,
                                 repeats=args.repeats)

    rng = np.random.RandomState(0)
    u = args.stride * (k - 1) + t                # unique frames per chunk
    frames = jnp.asarray(
        rng.randn(u, args.image, args.image, 3).astype(np.float32))
    whwh_u = jnp.tile(jnp.asarray([[args.image] * 4], jnp.float32), (u, 1))
    sel = jnp.asarray(np.concatenate(
        [np.arange(s, s + t) for s in np.arange(k) * args.stride]
    ).astype(np.int32))
    imgs = frames[sel]
    whwh = whwh_u[sel]

    def f_video(eps):
        boxes, scores, gaze = fwd_dedup(variables, frames + eps, sel,
                                        whwh_u, t)
        dep = (jnp.sum(boxes) + jnp.sum(scores)
               + jnp.sum(gaze['fusion'])) * 1e-12
        return dep.astype(jnp.float32)

    def f_indep(eps):
        boxes, scores, gaze = fwd(variables, imgs + eps, whwh, t)
        dep = (jnp.sum(boxes) + jnp.sum(scores)
               + jnp.sum(gaze['fusion'])) * 1e-12
        return dep.astype(jnp.float32)

    video_cps = k / chain(f_video)
    indep_cps = k / chain(f_indep)

    print(json.dumps({
        'metric': 'gaze_eval_clips_per_sec_per_chip',
        'value': round(video_cps, 2),
        'unit': 'clips/s',
        'vs_baseline': round(video_cps / 125.0, 3),
        'independent_clips_per_sec': round(indep_cps, 2),
    }))
    return 0


if __name__ == '__main__':
    sys.exit(main())
