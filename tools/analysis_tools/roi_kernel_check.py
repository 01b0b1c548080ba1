"""On-chip correctness certifier for the pallas FPN RoIAlign kernels.

Cross-checks the pallas forward (`roi_align_fpn_pallas`) and backward
(`roi_align_fpn_pallas_bwd`) against the XLA one-hot-matmul formulation
(`ops/roi_align.py::roi_align_fpn_mm`) ON THE REAL BACKEND, at both the
gaze shape (3 RoIs/frame, single chunk) and the InstBlink shape
(100 RoIs/frame, level-sorted chunks), under BOTH operand regimes:

  * traced   — operands are jit arguments (the train/eval path);
  * constant — operands are closed-over jit constants, so XLA
    constant-folds the wrapper's sort/take/reshape into literals.

The constant regime exists because of a real on-chip finding (round 5):
with literal-fed operands the lowered backward returned garbage
(maxdiff ~69 vs ref scale ~6) while the identical kernel with traced
operands was exact (4.8e-7); `roi_align_fpn_pallas_bwd` now pins its
operands with `lax.optimization_barrier`. The interpret-mode test suite
cannot see this class of bug — run this tool on hardware after touching
the kernels. Exit code 1 on any tolerance breach.

Reference semantics anchor: mmcv RoIAlign(aligned=True) + mmdet
single_level_roi_extractor.py:57-75 level routing.
"""
from __future__ import annotations

import argparse
import json
import sys


def make_case(rng, np, n, r, sizes, c):
    feats = tuple(rng.randn(n, h, w, c).astype(np.float32)
                  for h, w in sizes)
    rois = np.zeros((n, r, 4), np.float32)
    for i in range(n):
        for j in range(r):
            s = rng.choice([25, 90, 300])
            x1 = rng.uniform(-10, 300)
            y1 = rng.uniform(-10, 200)
            rois[i, j] = [x1, y1, x1 + s * rng.uniform(0.5, 1.5), y1 + s]
    g = rng.randn(n, r, 7, 7, c).astype(np.float32)
    return feats, rois, g


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('--tol', type=float, default=1e-4,
                    help='relative tolerance vs the mm formulation')
    args = ap.parse_args(argv)

    sys.path.insert(0, '.')
    from mcgaze_tpu.utils.env import setup_jax_platform
    setup_jax_platform()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mcgaze_tpu.ops.roi_align import roi_align_fpn_mm
    from mcgaze_tpu.ops.roi_align_pallas import (roi_align_fpn_pallas,
                                                 roi_align_fpn_pallas_bwd)

    print(f'backend: {jax.default_backend()}')
    rng = np.random.RandomState(0)
    shapes = [
        ('gaze', 8, 3, [(56, 56), (28, 28), (14, 14), (7, 7)], 256),
        ('instblink', 8, 100,
         [(96, 160), (48, 80), (24, 40), (12, 20)], 256),
    ]
    failures = 0
    for name, n, r, sizes, c in shapes:
        f_np, rois_np, g_np = make_case(rng, np, n, r, sizes, c)
        feats = tuple(jnp.asarray(x) for x in f_np)
        rois = jnp.asarray(rois_np)
        g = jnp.asarray(g_np)

        fwd_ref = roi_align_fpn_mm(feats, rois)
        bwd_ref = jax.vjp(lambda f: roi_align_fpn_mm(f, rois), feats)[1](
            g)[0]
        scale_f = float(jnp.max(jnp.abs(fwd_ref)))
        scale_b = max(float(jnp.max(jnp.abs(x))) for x in bwd_ref)

        runs = {
            'fwd_traced': lambda: jax.jit(
                lambda f, r_: roi_align_fpn_pallas(f, r_))(feats, rois),
            'fwd_const': lambda: jax.jit(
                lambda: roi_align_fpn_pallas(feats, rois))(),
            'bwd_traced': lambda: jax.jit(
                lambda f, r_, g_: roi_align_fpn_pallas_bwd(f, r_, g_))(
                    feats, rois, g),
            'bwd_const': lambda: jax.jit(
                lambda: roi_align_fpn_pallas_bwd(feats, rois, g))(),
        }
        for case, run in runs.items():
            got = run()
            if case.startswith('fwd'):
                md = float(jnp.max(jnp.abs(got - fwd_ref)))
                rel = md / scale_f
            else:
                md = max(float(jnp.max(jnp.abs(a - b)))
                         for a, b in zip(got, bwd_ref))
                rel = md / scale_b
            ok = rel <= args.tol
            failures += not ok
            print(json.dumps(dict(shape=name, case=case,
                                  maxdiff=round(md, 8),
                                  rel=round(rel, 8), ok=bool(ok))))
    if failures:
        print(f'FAILED: {failures} case(s) over tol={args.tol}')
        return 1
    print('all kernel/formulation cross-checks passed on '
          f'{jax.default_backend()}')
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
