"""Device-side A/B of the eval driver's frame dedup (EvalConfig.
dedup_frames): fwd on the duplicated clip layout (K*T frames) vs
fwd_dedup on the chunk's unique frame window (stride*(K-1)+T frames +
gather). Consecutive stride-4 clips share T-stride frames, so dedup
skips ~40% of backbone+FPN work — the dominant step cost — with
numerically exact results (tests/test_data_and_driver.py::
test_dedup_forward_matches_plain_driver_path).

Serial-chain timing with one readback (bench.py discipline).

Usage: python tools/analysis_tools/dedup_bench.py [--clips 8 32]
"""
import argparse
import json
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--clips', type=int, nargs='+', default=[8, 32])
    ap.add_argument('--image', type=int, default=224)
    ap.add_argument('--stride', type=int, default=4)
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--warmup', type=int, default=3)
    ap.add_argument('--dtype', default='bfloat16')
    args = ap.parse_args()

    from mcgaze_tpu.utils.env import setup_jax_platform
    setup_jax_platform()      # platform + persistent compile cache

    import jax
    import jax.numpy as jnp

    from mcgaze_tpu.evaluation.forward import make_eval_forward
    from mcgaze_tpu.models.mcgaze import ModelConfig

    cfg = ModelConfig(dtype=args.dtype)
    t = cfg.clip_length
    _m, variables, fwd, fwd_dedup = make_eval_forward(
        cfg, canvas=(args.image, args.image))

    from mcgaze_tpu.utils.benchmarking import serial_chain_time

    rng = np.random.RandomState(0)
    for k in args.clips:
        u = args.stride * (k - 1) + t
        frames = jnp.asarray(
            rng.randn(u, args.image, args.image, 3).astype(np.float32))
        whwh_u = jnp.tile(jnp.asarray([[args.image] * 4], jnp.float32),
                          (u, 1))
        sel = np.concatenate(
            [np.arange(s, s + t) for s in
             (np.arange(k) * args.stride)]).astype(np.int32)
        sel_j = jnp.asarray(sel)
        imgs = frames[sel_j]
        whwh = whwh_u[sel_j]

        def f_plain(eps):
            b, s, g = fwd(variables, imgs + eps, whwh, t)
            return ((jnp.sum(b) + jnp.sum(g['fusion'])) * 1e-12).astype(
                jnp.float32)

        def f_dedup(eps):
            b, s, g = fwd_dedup(variables, frames + eps, sel_j, whwh_u, t)
            return ((jnp.sum(b) + jnp.sum(g['fusion'])) * 1e-12).astype(
                jnp.float32)

        ms_plain = serial_chain_time(f_plain, args.iters,
                                     args.warmup) * 1e3
        ms_dedup = serial_chain_time(f_dedup, args.iters,
                                     args.warmup) * 1e3
        print(json.dumps(dict(
            clips=k, frames_plain=int(k * t), frames_unique=int(u),
            ms_plain=round(ms_plain, 3), ms_dedup=round(ms_dedup, 3),
            speedup=round(ms_plain / ms_dedup, 3),
            clips_per_sec_dedup=round(k / (ms_dedup / 1e3), 1))))
    return 0


if __name__ == '__main__':
    sys.exit(main())
