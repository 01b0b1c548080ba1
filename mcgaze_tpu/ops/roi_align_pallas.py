"""Fused FPN RoIAlign as a pallas TPU kernel.

Same semantics as ops/roi_align.py::roi_align_fpn_mm (mmcv
RoIAlign(aligned=True) + SingleRoIExtractor level routing, reference
mmdet/models/roi_heads/roi_extractors/single_level_roi_extractor.py), but
each frame's whole feature pyramid is DMA'd into VMEM ONCE and all three
RoIs are extracted on-chip.

Why: the XLA one-hot-matmul formulation materialises a (N, R*7, W, C)
intermediate in HBM between the two separable contractions and re-reads
the pyramid per einsum; at the MCGaze eval shape (N=224 frames per batch,
4 stages) that is ~2.2 ms/stage of mostly HBM traffic. Here the pyramid
crosses HBM exactly once per stage (2.1 MB/frame) and both contractions
ride the MXU from VMEM.

Layout per grid step (one frame x one channel chunk; the chunk is C
itself at 224 px — see _channel_chunk for the 448 px VMEM split):
  feats_l  (1, H_l, W_l, CC)  VMEM - pyramid level channel block, merged
                                     to (H, W*CC) in-kernel (free reshape)
  rois     (1, R, 4)          SMEM - absolute xyxy boxes of this frame
  out      (1, R, 7, 7, CC)   VMEM

Per level: build the separable bilinear weight matrices AY (R*7, H),
AX_r (7, W) on the VPU with the level-routing mask folded into AY (a RoI
contributes from exactly one level, so levels accumulate); then
t = AY @ F (one MXU dot against (H, W*C)) and per (r, i) row
out[r, i] = AX_r @ t[r*7+i].reshape(W, C).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _axis_weights_grid(lo_c: jnp.ndarray, hi_c: jnp.ndarray, size: int,
                       out_size: int, sampling_ratio: int):
    """Bilinear one-hot rows for one RoI on one axis: (out_size, size).

    lo_c/hi_c: scalars, the RoI's start/end in feature-grid coords
    (already stride-scaled and 0.5-shifted). Mean over the
    sampling_ratio sub-samples is folded in. Matches
    ops/roi_align.py::_axis_weights bit-for-bit semantics.
    """
    bin_sz = (hi_c - lo_c) / out_size
    # Mosaic's tpu.iota is integer-only; cast on the VPU afterwards
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (out_size, size), 1).astype(jnp.float32)
    ii = jax.lax.broadcasted_iota(
        jnp.int32, (out_size, size), 0).astype(jnp.float32)
    w = jnp.zeros((out_size, size), jnp.float32)
    for k in range(sampling_ratio):
        coord = lo_c + (ii + (k + 0.5) / sampling_ratio) * bin_sz
        valid = (coord >= -1.0) & (coord <= float(size))
        vc = jnp.maximum(coord, 0.0)
        lo = jnp.floor(vc)
        degenerate = lo >= float(size - 1)
        lo = jnp.minimum(lo, float(size - 1))
        hi = jnp.minimum(lo + 1.0, float(size - 1))
        frac = jnp.where(degenerate, 0.0, vc - lo)
        wk = ((iota == lo) * (1.0 - frac) + (iota == hi) * frac)
        w = w + wk * valid
    return w / sampling_ratio


def _make_kernel(num_rois: int, out_size: int, sampling_ratio: int,
                 strides: tuple, sizes: tuple, channels: int,
                 finest_scale: float, acc_dtype):
    """channels here is the per-grid-step channel block (= C, or a chunk
    of it when the pyramid is too large for VMEM — see _channel_chunk)."""
    num_levels = len(strides)

    def kernel(rois_ref, *refs):
        feat_refs = refs[:num_levels]
        out_ref = refs[num_levels]

        # per-RoI scalars from SMEM
        boxes = [[rois_ref[0, r, i] for i in range(4)]
                 for r in range(num_rois)]
        # level routing (reference map_roi_levels): floor(log2(
        # sqrt(area)/finest + 1e-6)) clipped to [0, L-1], done as
        # comparisons so no scalar transcendentals are needed
        areas = [jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
                 for (x1, y1, x2, y2) in boxes]

        def routed(r, level):
            v = jnp.sqrt(areas[r]) / finest_scale + 1e-6
            lo = 2.0 ** level
            hi = 2.0 ** (level + 1)
            m = (v >= lo) & (v < hi)
            if level == 0:
                m = v < hi
            if level == num_levels - 1:
                m = v >= lo
            return m.astype(jnp.float32)

        acc = [None] * (num_rois * out_size)
        for li in range(num_levels):
            h_l, w_l = sizes[li]
            stride = float(strides[li])
            ays = []
            axs = []
            for r in range(num_rois):
                x1, y1, x2, y2 = boxes[r]
                mask = routed(r, li)
                ay = _axis_weights_grid(y1 / stride - 0.5,
                                        y2 / stride - 0.5,
                                        h_l, out_size, sampling_ratio)
                ax = _axis_weights_grid(x1 / stride - 0.5,
                                        x2 / stride - 0.5,
                                        w_l, out_size, sampling_ratio)
                ays.append(ay * mask)     # routing mask folded into AY
                axs.append(ax)
            ay_all = jnp.concatenate(ays, axis=0)      # (R*7, H)
            # (H, W, CC) block -> (H, W*CC): contiguous merge, free
            f = feat_refs[li][0].reshape(h_l, w_l * channels)
            # f32 MXU accumulation, then cast back to the feature dtype —
            # exactly the mm formulation's tmp.astype(dtype) semantics
            # (ops/roi_align.py), and half the relayout traffic below
            t = jnp.dot(ay_all.astype(f.dtype), f,
                        preferred_element_type=acc_dtype).astype(f.dtype)
            # sublane unflatten (row-major contiguous, Mosaic relayouts
            # it in VMEM): each W-row block is then a static 2D slice
            t = t.reshape(num_rois * out_size * w_l, channels)
            for r in range(num_rois):
                ax_r = axs[r].astype(f.dtype)
                for i in range(out_size):
                    k = r * out_size + i
                    row = t[k * w_l:(k + 1) * w_l, :]
                    o = jnp.dot(ax_r, row,
                                preferred_element_type=acc_dtype)
                    acc[k] = o if acc[k] is None else acc[k] + o
        for r in range(num_rois):
            for i in range(out_size):
                out_ref[0, r, i, :, :] = acc[r * out_size + i].astype(
                    out_ref.dtype)

    return kernel


# Per-step VMEM budget for the pyramid blocks (bytes). The scoped-vmem
# stack limit is 16 MiB; the pipeline double-buffers every input block,
# and the kernel's own temporaries (the (R*7, W*CC) f32 contraction
# output and its reshape) need headroom on top, so blocks are capped at
# 10 MiB pre-double-buffering.
_VMEM_BLOCK_BUDGET = 10 * 1024 * 1024

# Per-grid-step RoI cap: the kernel body unrolls over RoIs, and Mosaic
# fails to lower the resulting program beyond a few dozen (see the
# chunking branch in roi_align_fpn_pallas).
_MAX_ROIS_PER_STEP = 16


def _step_vmem_bytes(sizes, cc, r, out_size, itemsize):
    """Estimate of one grid step's scoped-VMEM use: double-buffered
    pyramid blocks + the kernel's f32 contraction temporaries (the
    (R*out, W*CC) row blocks — these scale with R, so the query family's
    R=10 chunks cost ~6x the gaze path's R=3 at the same pyramid) + the
    double-buffered out block. Calibrated against observed Mosaic stack
    allocations (which run ~1.3x this estimate — the params decision
    below doubles it)."""
    cells = sum(h * w for (h, w) in sizes)
    blocks = cells * cc * itemsize * 2
    max_w = max(w for (_, w) in sizes)
    temp = r * out_size * max_w * cc * 4 * 2
    out_blk = r * out_size * out_size * cc * itemsize * 2
    return blocks + temp + out_blk


def _channel_chunk(sizes, c, itemsize):
    """Largest power-of-two channel block cc | C whose per-step pyramid
    blocks (double-buffered) fit the VMEM budget. At the gaze360 eval
    shape (224 px, f32: 4.3 MB pyramid) this returns C — one chunk, the
    original single-grid layout. At 448 px (l2cs) the P2 level alone is
    12.8 MB f32, which overflows the default 16 MiB scoped-vmem stack
    (observed: 'Scoped allocation with size 27.05M ... exceeded scoped
    vmem limit'), so the channel axis is split across a second grid
    dimension. Floor 128: Mosaic requires the last block dim be a
    multiple of 128 lanes (or the whole array dim); when 128 still
    overflows, the wrapper raises the kernel's vmem_limit_bytes per the
    R-aware _step_vmem_bytes estimate (v5e has 128 MiB VMEM — 16 MiB is
    only the default cap)."""
    cells = sum(h * w for (h, w) in sizes)
    cc = c
    while cc > 128 and cc % 2 == 0 and cells * cc * itemsize * 2 > \
            _VMEM_BLOCK_BUDGET:
        cc //= 2
    return cc


@partial(jax.jit, static_argnames=('out_size', 'sampling_ratio',
                                   'strides', 'finest_scale', 'interpret',
                                   'channel_chunk'))
def roi_align_fpn_pallas(feats: tuple,
                         rois: jnp.ndarray,
                         out_size: int = 7,
                         sampling_ratio: int = 2,
                         strides: tuple = (4, 8, 16, 32),
                         finest_scale: float = 56.0,
                         frame_idx: jnp.ndarray | None = None,
                         interpret: bool = False,
                         channel_chunk: int | None = None) -> jnp.ndarray:
    """Drop-in replacement for roi_align_fpn_mm (same signature/semantics).

    feats: tuple of L arrays (U, H_l, W_l, C) NHWC; rois: (N, R, 4) xyxy.
    Returns (N, R, out_size, out_size, C) in feats' dtype.

    frame_idx (N,) int32 maps each roi slot to its pyramid frame
    (U == N and identity when omitted). The dedup eval path passes the
    clip->unique-frame gather here as a SCALAR-PREFETCH index map instead
    of materialising the duplicated (N-frame) pyramid in HBM: the kernel
    DMAs each slot's frame block directly, and pallas skips the re-fetch
    when consecutive slots map to the same frame (overlapping clips).

    channel_chunk: per-grid-step channel block; None auto-selects the
    largest chunk fitting VMEM (_channel_chunk — C itself except at
    448 px+, where the pyramid block must be split). When chunked, the
    grid is (chunks, frames) with frames INNERMOST so the consecutive-
    slot refetch-skip above still applies within each chunk sweep."""
    n = rois.shape[0]
    c = feats[0].shape[-1]
    r = rois.shape[1]
    u = feats[0].shape[0]
    sizes = tuple((f.shape[1], f.shape[2]) for f in feats)
    dtype = feats[0].dtype

    if c % 128 != 0 and not interpret:
        # Mosaic lane constraint: the kernel's (rows, C) intermediates
        # need a 128-lane-multiple channel dim (measured: C=64 fails
        # 'unsupported shape cast' even at R=3; C=128/256 compile). No
        # shipped config is below 256 — only shrunken test/burn-in
        # configs land here — so fall back to the XLA formulation.
        from .roi_align import roi_align_fpn_mm
        fsel = feats if frame_idx is None else tuple(f[frame_idx]
                                                     for f in feats)
        return roi_align_fpn_mm(fsel, rois, out_size=out_size,
                                sampling_ratio=sampling_ratio,
                                strides=strides,
                                finest_scale=finest_scale)

    if r > _MAX_ROIS_PER_STEP:
        # the kernel unrolls its per-RoI loops, so a 100-query grid step
        # (TeViT/InstBlink) produces a kernel Mosaic cannot lower
        # ('infer-vector-layout: unsupported shape cast'; measured: R<=25
        # compiles, R=50 does not). Split the RoI axis across grid steps
        # instead: consecutive steps keep the same frame index, so the
        # pipeline's same-block refetch skip means the pyramid still
        # crosses HBM once per frame.
        k = max(d for d in range(1, _MAX_ROIS_PER_STEP + 1) if r % d == 0)
        if frame_idx is None:
            assert u == n, (u, n)
            frame_idx = jnp.arange(n, dtype=jnp.int32)
        out = roi_align_fpn_pallas(
            feats, rois.reshape(n * (r // k), k, 4), out_size=out_size,
            sampling_ratio=sampling_ratio, strides=strides,
            finest_scale=finest_scale,
            frame_idx=jnp.repeat(frame_idx, r // k),
            interpret=interpret, channel_chunk=channel_chunk)
        return out.reshape(n, r, out_size, out_size, c)

    cc = channel_chunk or _channel_chunk(sizes, c, dtype.itemsize)
    assert c % cc == 0, (c, cc)

    kernel = _make_kernel(r, out_size, sampling_ratio, strides, sizes, cc,
                          finest_scale, jnp.float32)

    if frame_idx is None:
        assert u == n, (u, n)
        frame_idx = jnp.arange(n, dtype=jnp.int32)

    def _k(fidx_ref, *refs):
        kernel(*refs)

    if cc == c:
        # single chunk (224 px and every training shape): 1-D grid over
        # frames with the (1, H, W*C) pre-merged layout — kept separate
        # from the chunked path below because this exact lowering is the
        # measured 1365 clips/s configuration (the 4-D block variant with
        # a degenerate chunk axis measured ~2.5% slower)
        feat_args = [f.reshape(u, h, w * c) for f, (h, w) in
                     zip(feats, sizes)]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n,),
            in_specs=[pl.BlockSpec((1, r, 4), lambda i, fidx: (i, 0, 0),
                                   memory_space=pltpu.SMEM)] + [
                pl.BlockSpec((1, h, w * c),
                             lambda i, fidx: (fidx[i], 0, 0),
                             memory_space=pltpu.VMEM)
                for (h, w) in sizes
            ],
            out_specs=pl.BlockSpec((1, r, out_size, out_size, c),
                                   lambda i, fidx: (i, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
    else:
        # channel-chunked grid (448 px+): frames INNERMOST so the
        # consecutive-slot refetch-skip survives within each chunk sweep
        feat_args = list(feats)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(c // cc, n),
            in_specs=[pl.BlockSpec((1, r, 4),
                                   lambda j, i, fidx: (i, 0, 0),
                                   memory_space=pltpu.SMEM)] + [
                pl.BlockSpec((1, h, w, cc),
                             lambda j, i, fidx: (fidx[i], 0, 0, j),
                             memory_space=pltpu.VMEM)
                for (h, w) in sizes
            ],
            out_specs=pl.BlockSpec((1, r, out_size, out_size, cc),
                                   lambda j, i, fidx: (i, 0, 0, 0, j),
                                   memory_space=pltpu.VMEM),
        )
    # when even the minimum chunk's estimated step footprint exceeds the
    # default scoped-vmem cap, lift the cap for this kernel (usage is
    # real VMEM either way; v5e has 128 MiB). The estimate runs ~30%
    # under Mosaic's actual stack allocation (17.9M estimated vs 22.92M
    # observed at the InstBlink 384x640 R=10 cc=128 shape), hence the 2x.
    step_bytes = _step_vmem_bytes(sizes, cc, r, out_size, dtype.itemsize)
    params = None
    if step_bytes > _VMEM_BLOCK_BUDGET and not interpret:
        params = pltpu.CompilerParams(
            vmem_limit_bytes=min(step_bytes * 2 + 16 * 1024 * 1024,
                                 120 * 1024 * 1024))
    out = pl.pallas_call(
        _k,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, r, out_size, out_size, c),
                                       dtype),
        interpret=interpret,
        **({'compiler_params': params} if params is not None else {}),
    )(frame_idx.astype(jnp.int32), rois.astype(jnp.float32), *feat_args)
    return out


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def roi_align_fpn_pallas_diff(feats, rois, out_size=7, sampling_ratio=2,
                              strides=(4, 8, 16, 32), finest_scale=56.0):
    """Differentiable wrapper: pallas forward, mm-formulation transpose
    backward (RoIAlign is linear in feats, so the mm vjp is exact; rois
    get zero gradient, matching the reference's detached proposals —
    multiclue_gaze_roi_head.py:134)."""
    return roi_align_fpn_pallas(feats, rois, out_size=out_size,
                                sampling_ratio=sampling_ratio,
                                strides=strides, finest_scale=finest_scale)


def _diff_fwd(feats, rois, out_size, sampling_ratio, strides, finest_scale):
    out = roi_align_fpn_pallas(feats, rois, out_size=out_size,
                               sampling_ratio=sampling_ratio,
                               strides=strides, finest_scale=finest_scale)
    return out, (feats, rois)


def _diff_bwd(out_size, sampling_ratio, strides, finest_scale, res, g):
    from .roi_align import roi_align_fpn_mm
    feats, rois = res
    _, vjp = jax.vjp(
        lambda f: roi_align_fpn_mm(f, rois, out_size=out_size,
                                   sampling_ratio=sampling_ratio,
                                   strides=strides,
                                   finest_scale=finest_scale), feats)
    return vjp(g.astype(feats[0].dtype))[0], jnp.zeros_like(rois)


roi_align_fpn_pallas_diff.defvjp(_diff_fwd, _diff_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def roi_align_fpn_pallas_gather_diff(feats, rois, frame_idx, out_size=7,
                                     sampling_ratio=2,
                                     strides=(4, 8, 16, 32),
                                     finest_scale=56.0):
    """Frame-indexed variant (dedup eval path): pallas forward reading
    each slot's frame via scalar-prefetch; backward = mm transpose of
    gather∘roi_align (scatter-add into the unique frames)."""
    return roi_align_fpn_pallas(feats, rois, out_size=out_size,
                                sampling_ratio=sampling_ratio,
                                strides=strides, finest_scale=finest_scale,
                                frame_idx=frame_idx)


def _gdiff_fwd(feats, rois, frame_idx, out_size, sampling_ratio, strides,
               finest_scale):
    out = roi_align_fpn_pallas_gather_diff(
        feats, rois, frame_idx, out_size, sampling_ratio, strides,
        finest_scale)
    return out, (feats, rois, frame_idx)


def _gdiff_bwd(out_size, sampling_ratio, strides, finest_scale, res, g):
    from .roi_align import roi_align_fpn_mm
    feats, rois, frame_idx = res
    _, vjp = jax.vjp(
        lambda f: roi_align_fpn_mm(
            tuple(x[frame_idx] for x in f), rois, out_size=out_size,
            sampling_ratio=sampling_ratio, strides=strides,
            finest_scale=finest_scale), feats)
    return (vjp(g.astype(feats[0].dtype))[0], jnp.zeros_like(rois),
            jnp.zeros(frame_idx.shape, jax.dtypes.float0))


roi_align_fpn_pallas_gather_diff.defvjp(_gdiff_fwd, _gdiff_bwd)
