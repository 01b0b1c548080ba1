"""RoIAlign golden test vs a literal torch port of the mmcv aligned
CUDA kernel semantics (reference consumes mmcv.ops.RoIAlign(aligned=True,
output_size=7, sampling_ratio=2) via single_level_roi_extractor.py)."""
import numpy as np
import pytest
import torch

from mcgaze_tpu.ops.roi_align import roi_align_fpn, roi_levels


def torch_roi_align_single(feat, rois, out=7, sampling=2, spatial_scale=1.0):
    """feat (H, W, C), rois (R, 4) xyxy in image coords; aligned=True."""
    H, W, C = feat.shape
    R = rois.shape[0]
    out_t = torch.zeros(R, out, out, C)

    def bilinear(y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return torch.zeros(C)
        y = max(y, 0.0)
        x = max(x, 0.0)
        y_low = int(y)
        x_low = int(x)
        if y_low >= H - 1:
            y_low = y_high = H - 1
            y = float(y_low)
        else:
            y_high = y_low + 1
        if x_low >= W - 1:
            x_low = x_high = W - 1
            x = float(x_low)
        else:
            x_high = x_low + 1
        ly, lx = y - y_low, x - x_low
        hy, hx = 1 - ly, 1 - lx
        return (feat[y_low, x_low] * hy * hx + feat[y_low, x_high] * hy * lx +
                feat[y_high, x_low] * ly * hx + feat[y_high, x_high] * ly * lx)

    for r in range(R):
        x1 = rois[r, 0] * spatial_scale - 0.5
        y1 = rois[r, 1] * spatial_scale - 0.5
        x2 = rois[r, 2] * spatial_scale - 0.5
        y2 = rois[r, 3] * spatial_scale - 0.5
        bw = (x2 - x1) / out
        bh = (y2 - y1) / out
        for i in range(out):
            for j in range(out):
                acc = torch.zeros(C)
                for sy in range(sampling):
                    for sx in range(sampling):
                        y = y1 + (i + (sy + 0.5) / sampling) * bh
                        x = x1 + (j + (sx + 0.5) / sampling) * bw
                        acc += bilinear(float(y), float(x))
                out_t[r, i, j] = acc / (sampling * sampling)
    return out_t


def make_pyramid(rng, n=2, c=8, base=32):
    feats = []
    for s in (4, 8, 16, 32):
        h = w = base * 4 // s
        feats.append(rng.randn(n, h, w, c).astype(np.float32))
    return tuple(feats)


def test_level_routing():
    rois = np.array([
        [0, 0, 50, 50],      # scale 50 < 112 -> lvl 0
        [0, 0, 150, 150],    # 112 <= 150 < 224 -> lvl 1
        [0, 0, 300, 300],    # -> lvl 2
        [0, 0, 900, 900],    # -> lvl 3 (clamped)
    ], np.float32)
    lvls = np.asarray(roi_levels(rois))
    np.testing.assert_array_equal(lvls, [0, 1, 2, 3])


@pytest.mark.parametrize('seed', [0, 1])
def test_roi_align_matches_reference(seed):
    rng = np.random.RandomState(seed)
    feats = make_pyramid(rng, n=2, c=8, base=32)  # image is 128x128
    # Rois spanning all levels (incl. partially out-of-bounds).
    rois = np.stack([
        rng.uniform(-10, 60, (2, 3)).astype(np.float32) for _ in range(1)
    ])
    rois = np.zeros((2, 5, 4), np.float32)
    sizes = np.array([30, 100, 250, 500, 40], np.float32)
    for n in range(2):
        for r, s in enumerate(sizes):
            x1 = rng.uniform(-5, 100)
            y1 = rng.uniform(-5, 100)
            rois[n, r] = [x1, y1, x1 + s, y1 + s]

    ours = np.asarray(roi_align_fpn(feats, rois))
    strides = (4, 8, 16, 32)
    for n in range(2):
        lvls = np.asarray(roi_levels(rois[n]))
        for r in range(rois.shape[1]):
            l = int(lvls[r])
            ref = torch_roi_align_single(
                torch.from_numpy(feats[l][n]),
                torch.from_numpy(rois[n, r:r + 1]),
                spatial_scale=1.0 / strides[l]).numpy()[0]
            np.testing.assert_allclose(ours[n, r], ref, rtol=1e-4, atol=1e-4)


def test_roi_align_grads_flow():
    import jax
    rng = np.random.RandomState(0)
    feats = make_pyramid(rng, n=1, c=4, base=32)
    rois = np.array([[[10., 10., 60., 60.]]], np.float32)

    def f(f0):
        return roi_align_fpn((f0,) + feats[1:], rois).sum()

    g = jax.grad(f)(feats[0])
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


@pytest.mark.parametrize('seed', [0, 1])
def test_mm_formulation_matches_gather(seed):
    from mcgaze_tpu.ops.roi_align import roi_align_fpn_mm
    rng = np.random.RandomState(seed)
    feats = make_pyramid(rng, n=3, c=16, base=32)
    rois = np.zeros((3, 4, 4), np.float32)
    sizes = np.array([25, 90, 300, 600], np.float32)
    for n in range(3):
        for r, s in enumerate(sizes):
            x1 = rng.uniform(-10, 100)
            y1 = rng.uniform(-10, 100)
            rois[n, r] = [x1, y1, x1 + s * rng.uniform(0.5, 1.5), y1 + s]
    a = np.asarray(roi_align_fpn(feats, rois))
    b = np.asarray(roi_align_fpn_mm(feats, rois))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_mm_grads_flow():
    import jax
    from mcgaze_tpu.ops.roi_align import roi_align_fpn_mm
    rng = np.random.RandomState(0)
    feats = make_pyramid(rng, n=1, c=4, base=32)
    rois = np.array([[[10., 10., 60., 60.]]], np.float32)

    def f(f0):
        return roi_align_fpn_mm((f0,) + feats[1:], rois).sum()

    g = jax.grad(f)(feats[0])
    assert np.abs(np.asarray(g)).sum() > 0


@pytest.mark.parametrize('seed', [0, 1])
def test_pallas_kernel_matches_mm(seed):
    """The fused pallas TPU kernel (interpret mode on CPU) against the
    one-hot-matmul formulation on mixed-level random RoIs. On a real
    chip the two were measured bit-identical (NOTES.md round 2)."""
    from mcgaze_tpu.ops.roi_align import roi_align_fpn_mm
    from mcgaze_tpu.ops.roi_align_pallas import roi_align_fpn_pallas
    rng = np.random.RandomState(seed)
    feats = make_pyramid(rng, n=2, c=8, base=32)
    rois = np.zeros((2, 3, 4), np.float32)
    sizes = np.array([25, 90, 300], np.float32)
    for n in range(2):
        for r, s in enumerate(sizes):
            x1 = rng.uniform(-10, 100)
            y1 = rng.uniform(-10, 100)
            rois[n, r] = [x1, y1, x1 + s * rng.uniform(0.5, 1.5), y1 + s]
    a = np.asarray(roi_align_fpn_mm(feats, rois))
    b = np.asarray(roi_align_fpn_pallas(feats, rois, interpret=True))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_pallas_diff_wrapper_grads_match_mm():
    """roi_align_fpn_pallas_diff: forward = pallas kernel, backward = the
    exact mm-formulation transpose. Gradients w.r.t. feats must match the
    mm path's (RoIAlign is linear in feats)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from mcgaze_tpu.ops.roi_align import roi_align_fpn_mm
    from mcgaze_tpu.ops.roi_align_pallas import (roi_align_fpn_pallas,
                                                 roi_align_fpn_pallas_diff)
    rng = np.random.RandomState(0)
    feats = make_pyramid(rng, n=1, c=8, base=32)
    rois = jnp.asarray([[[4., 4., 20., 22.], [2., 3., 28., 30.],
                         [0., 0., 31., 31.]]])

    # interpret-mode forward for the CPU test
    fwd_interp = partial(roi_align_fpn_pallas, interpret=True)
    import mcgaze_tpu.ops.roi_align_pallas as m
    orig = m.roi_align_fpn_pallas
    m.roi_align_fpn_pallas = fwd_interp
    try:
        def f(f0):
            return (roi_align_fpn_pallas_diff((f0,) + feats[1:],
                                              rois) ** 2).sum()

        g = jax.grad(f)(feats[0])
    finally:
        m.roi_align_fpn_pallas = orig

    def f_mm(f0):
        return (roi_align_fpn_mm((f0,) + feats[1:], rois) ** 2).sum()

    g_ref = jax.grad(f_mm)(feats[0])
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('nq,cc', [(3, None), (20, None), (5, 4)])
def test_pallas_bwd_kernel_matches_mm_vjp(nq, cc):
    """The pallas BACKWARD kernel (roi_align_fpn_pallas_bwd, interpret
    mode on CPU) against the mm-formulation vjp — RoIAlign is linear in
    feats so both transposes compute the same gradient. Covers the
    single-chunk body (nq=3, the gaze path), RoI chunking with
    level-sorted chunks (nq=20 > _MAX_ROIS_PER_STEP, the query family),
    and a forced channel-chunked grid (cc=4, the 448 px VMEM split)."""
    import jax
    import jax.numpy as jnp
    from mcgaze_tpu.ops.roi_align import roi_align_fpn_mm
    from mcgaze_tpu.ops.roi_align_pallas import roi_align_fpn_pallas_bwd
    rng = np.random.RandomState(7)
    feats = make_pyramid(rng, n=2, c=8, base=32)
    rois = np.zeros((2, nq, 4), np.float32)
    for n in range(2):
        for r in range(nq):
            s = rng.choice([25, 90, 300])
            x1 = rng.uniform(-10, 100)
            y1 = rng.uniform(-10, 100)
            rois[n, r] = [x1, y1, x1 + s * rng.uniform(0.5, 1.5), y1 + s]
    g = rng.randn(2, nq, 7, 7, 8).astype(np.float32)

    _, vjp = jax.vjp(lambda f: roi_align_fpn_mm(f, rois), feats)
    ref = vjp(jnp.asarray(g))[0]
    got = roi_align_fpn_pallas_bwd(feats, jnp.asarray(rois),
                                   jnp.asarray(g), interpret=True,
                                   channel_chunk=cc)
    for a_, b_ in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_pallas_diff_bwd_dispatch_uses_pallas_kernel(monkeypatch):
    """_diff_bwd routes through the pallas backward kernel when the
    backend reports TPU (interpret-forced here so it runs on CPU) and
    the custom_vjp chain end-to-end matches the mm gradient."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    import mcgaze_tpu.ops.roi_align_pallas as mod
    from mcgaze_tpu.ops.roi_align import roi_align_fpn_mm

    rng = np.random.RandomState(8)
    feats = make_pyramid(rng, n=1, c=8, base=32)
    rois = jnp.asarray([[[4., 4., 20., 22.], [2., 3., 28., 30.],
                         [0., 0., 31., 31.]]])
    calls = []
    orig_fwd = mod.roi_align_fpn_pallas
    orig_bwd = mod.roi_align_fpn_pallas_bwd

    def spy_bwd(*a, **kw):
        calls.append(1)
        return orig_bwd(*a, interpret=True,
                        **{k: v for k, v in kw.items() if k != 'interpret'})

    monkeypatch.setattr(mod, 'roi_align_fpn_pallas',
                        partial(orig_fwd, interpret=True))
    monkeypatch.setattr(mod, 'roi_align_fpn_pallas_bwd', spy_bwd)
    monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
    # c=8 is not 128-aligned; the spy forces interpret=True which skips
    # the lane check, so the kernel itself (not the mm fallback) runs
    g = jnp.asarray(rng.randn(1, 3, 7, 7, 8).astype(np.float32))
    grads, dr = mod._diff_bwd(7, 2, (4, 8, 16, 32), 56.0, (feats, rois), g)
    assert calls, 'pallas backward was not dispatched'
    assert not np.asarray(dr).any()
    _, vjp = jax.vjp(lambda f: roi_align_fpn_mm(f, rois), feats)
    ref = vjp(g)[0]
    for a_, b_ in zip(grads, ref):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_pallas_frame_idx_matches_gather():
    """Scalar-prefetch frame indexing (the dedup eval path): pallas over
    UNIQUE frames + frame_idx must equal pallas over the materialised
    gathered pyramid, and the gather-diff wrapper's feats-grads must
    match the mm transpose of gather-then-roi (scatter-add)."""
    import jax
    import jax.numpy as jnp
    from mcgaze_tpu.ops.roi_align import roi_align_fpn_mm
    from mcgaze_tpu.ops.roi_align_pallas import (
        roi_align_fpn_pallas, roi_align_fpn_pallas_gather_diff)
    rng = np.random.RandomState(2)
    feats = make_pyramid(rng, n=3, c=8, base=32)     # 3 unique frames
    # 5 roi slots mapping onto the 3 frames, with repeats (overlap)
    fidx = np.array([0, 1, 1, 2, 0], np.int32)
    rois = np.zeros((5, 3, 4), np.float32)
    sizes = np.array([25, 90, 300], np.float32)
    for n in range(5):
        for r, s in enumerate(sizes):
            x1 = rng.uniform(-10, 100)
            y1 = rng.uniform(-10, 100)
            rois[n, r] = [x1, y1, x1 + s * rng.uniform(0.5, 1.5), y1 + s]
    gathered = tuple(np.asarray(f)[fidx] for f in feats)
    a = np.asarray(roi_align_fpn_pallas(gathered, rois, interpret=True))
    b = np.asarray(roi_align_fpn_pallas(
        feats, rois, frame_idx=jnp.asarray(fidx), interpret=True))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    # grads: scatter-add back into unique frames
    import mcgaze_tpu.ops.roi_align_pallas as mod
    from functools import partial
    orig = mod.roi_align_fpn_pallas
    mod.roi_align_fpn_pallas = partial(orig, interpret=True)
    try:
        g = jax.grad(lambda f: roi_align_fpn_pallas_gather_diff(
            f, jnp.asarray(rois), jnp.asarray(fidx)).astype(
                jnp.float32).sum())(feats)
    finally:
        mod.roi_align_fpn_pallas = orig
    g_ref = jax.grad(lambda f: roi_align_fpn_mm(
        tuple(x[jnp.asarray(fidx)] for x in f),
        jnp.asarray(rois)).astype(jnp.float32).sum())(feats)
    for a_, b_ in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_pallas_channel_chunking_matches_mm():
    """Forced channel chunking (the 448 px VMEM split — at l2cs f32 the
    P2 pyramid block alone is 12.8 MB, over the 16 MiB scoped-vmem
    limit): a chunked grid must be exact vs the mm formulation, with and
    without the scalar-prefetch frame map."""
    import jax.numpy as jnp
    from mcgaze_tpu.ops.roi_align import roi_align_fpn_mm
    from mcgaze_tpu.ops.roi_align_pallas import (_channel_chunk,
                                                 roi_align_fpn_pallas)
    rng = np.random.RandomState(3)
    feats = make_pyramid(rng, n=3, c=8, base=32)
    fidx = np.array([0, 1, 1, 2, 0], np.int32)
    rois = np.zeros((5, 3, 4), np.float32)
    sizes = np.array([25, 90, 300], np.float32)
    for n in range(5):
        for r, s in enumerate(sizes):
            x1 = rng.uniform(-10, 100)
            y1 = rng.uniform(-10, 100)
            rois[n, r] = [x1, y1, x1 + s * rng.uniform(0.5, 1.5), y1 + s]
    gathered = tuple(np.asarray(f)[fidx] for f in feats)
    ref = np.asarray(roi_align_fpn_mm(gathered, rois))
    for cc in (2, 4):
        a = np.asarray(roi_align_fpn_pallas(
            gathered, rois, interpret=True, channel_chunk=cc))
        np.testing.assert_allclose(ref, a, rtol=1e-5, atol=1e-5)
        b = np.asarray(roi_align_fpn_pallas(
            feats, rois, frame_idx=jnp.asarray(fidx), interpret=True,
            channel_chunk=cc))
        np.testing.assert_allclose(ref, b, rtol=1e-5, atol=1e-5)

    # auto-selection: small pyramids stay single-chunk; the l2cs
    # 448 px pyramid (levels 112..14, C=256) must split to the 128-lane
    # Mosaic floor (the wrapper raises vmem_limit_bytes beyond that)
    assert _channel_chunk(((56, 56), (28, 28), (14, 14), (7, 7)),
                          256, 4) == 256
    l2cs = ((112, 112), (56, 56), (28, 28), (14, 14))
    assert _channel_chunk(l2cs, 256, 4) == 128
    assert _channel_chunk(l2cs, 256, 2) == 128


@pytest.mark.parametrize('nq', [20, 17])
def test_pallas_roi_chunking_matches_mm(nq):
    """RoI counts above _MAX_ROIS_PER_STEP (the TeViT/InstBlink 100-query
    family) split the RoI axis across grid steps — Mosaic cannot lower
    the fully-unrolled kernel beyond a few dozen RoIs (measured on-chip:
    R<=25 compiles, R=50 fails; chunked q=100/20/97 are bit-identical to
    the mm formulation). nq=17 is prime: chunk size degrades to 1."""
    from mcgaze_tpu.ops.roi_align import roi_align_fpn_mm
    from mcgaze_tpu.ops.roi_align_pallas import (_MAX_ROIS_PER_STEP,
                                                 roi_align_fpn_pallas)
    assert nq > _MAX_ROIS_PER_STEP
    rng = np.random.RandomState(3)
    feats = make_pyramid(rng, n=2, c=8, base=32)
    rois = np.zeros((2, nq, 4), np.float32)
    for n in range(2):
        for r in range(nq):
            x1 = rng.uniform(-10, 100)
            y1 = rng.uniform(-10, 100)
            s = rng.uniform(10, 300)
            rois[n, r] = [x1, y1, x1 + s * rng.uniform(0.5, 1.5), y1 + s]
    a = np.asarray(roi_align_fpn_mm(feats, rois))
    b = np.asarray(roi_align_fpn_pallas(feats, rois, interpret=True))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('cap,group', [(10, None), (20, None), (10, 1),
                                       (10, 2), (20, 4)])
def test_pallas_vectorized_body_matches_mm(cap, group):
    """The vectorized kernel body (_make_kernel_vec — all-RoI weight
    build, i-major first contraction, grouped block-diagonal second
    contraction) against the mm formulation and the unrolled body at the
    query-family RoI count. The block-diag rows add exact zeros only, so
    all three must agree to float tolerance at every (cap, group)."""
    from mcgaze_tpu.ops.roi_align import roi_align_fpn_mm
    from mcgaze_tpu.ops.roi_align_pallas import roi_align_fpn_pallas
    rng = np.random.RandomState(7)
    feats = make_pyramid(rng, n=2, c=8, base=32)
    nq = 100
    rois = np.zeros((2, nq, 4), np.float32)
    for n in range(2):
        for r in range(nq):
            x1 = rng.uniform(-10, 100)
            y1 = rng.uniform(-10, 100)
            s = rng.uniform(10, 300)
            rois[n, r] = [x1, y1, x1 + s * rng.uniform(0.5, 1.5), y1 + s]
    a = np.asarray(roi_align_fpn_mm(feats, rois))
    b = np.asarray(roi_align_fpn_pallas(feats, rois, interpret=True,
                                        vectorized=True, chunk_cap=cap,
                                        vec_group=group))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    if (cap, group) == (10, None):
        # unrolled body at the same chunking: same math, but
        # the block-diag contraction sums R*W terms per output (the
        # unrolled one sums W), so f32 rounding differs at ~7e-6
        u = np.asarray(roi_align_fpn_pallas(feats, rois, interpret=True,
                                            vectorized=False,
                                            chunk_cap=cap))
        np.testing.assert_allclose(u, b, rtol=1e-5, atol=1e-5)


def test_pallas_vectorized_frame_idx_matches_gather():
    """Vectorized body + scalar-prefetch frame dedup (the query family's
    eval path: overlapping stride windows share frames)."""
    import jax.numpy as jnp

    from mcgaze_tpu.ops.roi_align_pallas import roi_align_fpn_pallas
    rng = np.random.RandomState(11)
    feats = make_pyramid(rng, n=3, c=8, base=32)
    fidx = np.array([0, 1, 1, 2], np.int32)
    nq = 20
    rois = np.zeros((4, nq, 4), np.float32)
    for n in range(4):
        for r in range(nq):
            x1 = rng.uniform(-10, 100)
            y1 = rng.uniform(-10, 100)
            s = rng.uniform(10, 300)
            rois[n, r] = [x1, y1, x1 + s * rng.uniform(0.5, 1.5), y1 + s]
    gathered = tuple(np.asarray(f)[fidx] for f in feats)
    a = np.asarray(roi_align_fpn_pallas(gathered, rois, interpret=True,
                                        vectorized=True))
    b = np.asarray(roi_align_fpn_pallas(
        feats, rois, frame_idx=jnp.asarray(fidx), interpret=True,
        vectorized=True))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
