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

Layout per grid step (one frame):
  feats_l  (1, H_l, W_l*C) VMEM  - pyramid level, W*C pre-merged by XLA
                                   (free: contiguity-preserving reshape)
  rois     (1, R, 4)       SMEM  - absolute xyxy boxes of this frame
  out      (1, R, 7, 7, C) VMEM

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
            f = feat_refs[li][0]                       # (H, W*C)
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


@partial(jax.jit, static_argnames=('out_size', 'sampling_ratio',
                                   'strides', 'finest_scale', 'interpret'))
def roi_align_fpn_pallas(feats: tuple,
                         rois: jnp.ndarray,
                         out_size: int = 7,
                         sampling_ratio: int = 2,
                         strides: tuple = (4, 8, 16, 32),
                         finest_scale: float = 56.0,
                         frame_idx: jnp.ndarray | None = None,
                         interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for roi_align_fpn_mm (same signature/semantics).

    feats: tuple of L arrays (U, H_l, W_l, C) NHWC; rois: (N, R, 4) xyxy.
    Returns (N, R, out_size, out_size, C) in feats' dtype.

    frame_idx (N,) int32 maps each roi slot to its pyramid frame
    (U == N and identity when omitted). The dedup eval path passes the
    clip->unique-frame gather here as a SCALAR-PREFETCH index map instead
    of materialising the duplicated (N-frame) pyramid in HBM: the kernel
    DMAs each slot's frame block directly, and pallas skips the re-fetch
    when consecutive slots map to the same frame (overlapping clips)."""
    n = rois.shape[0]
    c = feats[0].shape[-1]
    r = rois.shape[1]
    u = feats[0].shape[0]
    sizes = tuple((f.shape[1], f.shape[2]) for f in feats)
    dtype = feats[0].dtype

    # (U, H, W*C): contiguity-preserving, so XLA lowers it without a copy
    flat_feats = [f.reshape(u, f.shape[1], f.shape[2] * c) for f in feats]

    kernel = _make_kernel(r, out_size, sampling_ratio, strides, sizes, c,
                          finest_scale, jnp.float32)

    if frame_idx is None:
        assert u == n, (u, n)
        frame_idx = jnp.arange(n, dtype=jnp.int32)

    def _k(fidx_ref, *refs):
        kernel(*refs)

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
    out = pl.pallas_call(
        _k,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, r, out_size, out_size, c),
                                       dtype),
        interpret=interpret,
    )(frame_idx.astype(jnp.int32), rois.astype(jnp.float32), *flat_feats)
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
