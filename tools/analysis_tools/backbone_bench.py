"""Backbone-only throughput A/B: plain XLA convs vs fused pallas
bottleneck chains (ops/fused_bottleneck.py), per fused-stage subset.

The backbone+FPN is ~75% of MCGaze eval step time and HBM-bound (NOTES),
so this is where clips/s is won. Serial-chain timing with one readback,
same discipline as bench.py (the axon tunnel makes per-step readbacks
measure RTT, not the chip).

Usage: python tools/analysis_tools/backbone_bench.py --batch 224
"""
import argparse
import json
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=224,
                    help='frames per step (32 clips x 7)')
    ap.add_argument('--image', type=int, default=224)
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--warmup', type=int, default=3)
    ap.add_argument('--dtype', default='bfloat16')
    args = ap.parse_args()

    from mcgaze_tpu.utils.env import setup_jax_platform
    setup_jax_platform()      # platform + persistent compile cache

    import jax
    import jax.numpy as jnp

    from mcgaze_tpu.models.resnet import ResNet

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(args.batch, args.image, args.image, 3)
                    .astype(np.float32)).astype(args.dtype)

    variants = {
        'plain': False,
        'fused_all': True,
        'fused_123': (1, 2, 3),
        'fused_23': (2, 3),
        'fused_3': (3,),
    }
    plain = ResNet(50, dtype=jnp.dtype(args.dtype), fused_blocks=False)
    variables = plain.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, args.image, args.image, 3),
                                     args.dtype))
    results = {}
    for name, spec in variants.items():
        model = ResNet(50, dtype=jnp.dtype(args.dtype), fused_blocks=spec)

        @jax.jit
        def fwd(v, xx, eps):
            outs = model.apply(v, xx + eps)
            dep = sum(jnp.sum(o) for o in outs) * 1e-12
            return dep.astype(jnp.float32)

        from mcgaze_tpu.utils.benchmarking import serial_chain_time
        dt = serial_chain_time(lambda e: fwd(variables, x, e),
                               args.iters, args.warmup)
        results[name] = round(dt * 1e3, 3)
        print(json.dumps({'variant': name, 'ms_per_step': results[name],
                          'frames_per_sec': round(args.batch / dt, 1)}))
    return 0


if __name__ == '__main__':
    sys.exit(main())
