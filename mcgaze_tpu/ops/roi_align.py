"""RoIAlign over an FPN pyramid, TPU-native.

The reference consumes mmcv's CUDA RoIAlign through SingleRoIExtractor
(reference mmdet/models/roi_heads/roi_extractors/single_level_roi_extractor.py):
each RoI is routed to one FPN level by scale (finest_scale=56), then
aligned-bilinear-sampled into a 7x7 grid with sampling_ratio=2.

Here the four feature levels are flattened into ONE (N, sum(H*W), C) tensor
and every bilinear corner becomes an index into it, so level routing is pure
index arithmetic and the whole op is a single XLA gather + weighted sum —
static shapes, no per-level host loop, differentiable (gather transposes to
scatter-add for the backward pass).

Semantics match mmcv RoIAlign(aligned=True):
  * coords:   x' = x * (1/stride) - 0.5
  * bin size: (x2'-x1')/out, no max(_, 1) clamp in aligned mode
  * samples:  2x2 sub-grid per bin at (j + (k+0.5)/2) * bin
  * bilinear: samples with y<-1 or y>H contribute 0; else clamp to
    [0, H-1] with degenerate top edge handling (y_low = floor, y_high =
    y_low+1 capped to H-1; if y_low >= H-1 then y = y_low = y_high = H-1)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def roi_levels(rois: jnp.ndarray, num_levels: int = 4,
               finest_scale: float = 56.0) -> jnp.ndarray:
    """FPN level per RoI (reference map_roi_levels, :36-55).

    rois: (..., 4) absolute xyxy in input-image coords -> (...,) int32.

    floor(log2(scale/finest + 1e-6)) clipped to [0, L-1], computed as
    power-of-two comparisons (count of thresholds 2^1..2^{L-1} passed)
    instead of a float log2 — bit-identical to the pallas kernel's
    routing (ops/roi_align_pallas.py) at level boundaries, where f32
    log2 rounding could otherwise route a threshold-straddling box to a
    different level than the comparison form.
    """
    scale = jnp.sqrt(jnp.clip((rois[..., 2] - rois[..., 0]) *
                              (rois[..., 3] - rois[..., 1]), 0.0, None))
    v = scale / finest_scale + 1e-6
    lvl = jnp.zeros(v.shape, jnp.int32)
    for level in range(1, num_levels):
        lvl = lvl + (v >= 2.0 ** level).astype(jnp.int32)
    return lvl


@partial(jax.jit, static_argnames=('out_size', 'sampling_ratio',
                                   'strides', 'finest_scale'))
def roi_align_fpn(feats: tuple,
                  rois: jnp.ndarray,
                  out_size: int = 7,
                  sampling_ratio: int = 2,
                  strides: tuple = (4, 8, 16, 32),
                  finest_scale: float = 56.0) -> jnp.ndarray:
    """Aligned RoIAlign with per-RoI FPN level routing.

    feats: tuple of L arrays (N, H_l, W_l, C), NHWC, strides[l] apart.
    rois:  (N, R, 4) absolute xyxy boxes in input-image coordinates.

    Returns (N, R, out_size, out_size, C) float features.
    """
    n = feats[0].shape[0]
    c = feats[0].shape[-1]
    num_levels = len(feats)
    hs = [f.shape[1] for f in feats]
    ws = [f.shape[2] for f in feats]
    offsets = [0]
    for h, w in zip(hs, ws):
        offsets.append(offsets[-1] + h * w)
    flat = jnp.concatenate([f.reshape(n, -1, c) for f in feats], axis=1)

    lvl = roi_levels(rois, num_levels, finest_scale)          # (N, R)
    h_of = jnp.asarray(hs, jnp.float32)[lvl]                  # (N, R)
    w_of = jnp.asarray(ws, jnp.float32)[lvl]
    w_int = jnp.asarray(ws, jnp.int32)[lvl]
    base = jnp.asarray(offsets[:num_levels], jnp.int32)[lvl]  # (N, R)
    inv_stride = 1.0 / jnp.asarray(strides, jnp.float32)[lvl]

    dtype = feats[0].dtype
    rois_f = rois.astype(jnp.float32)
    x1 = rois_f[..., 0] * inv_stride - 0.5                    # (N, R)
    y1 = rois_f[..., 1] * inv_stride - 0.5
    x2 = rois_f[..., 2] * inv_stride - 0.5
    y2 = rois_f[..., 3] * inv_stride - 0.5
    bin_w = (x2 - x1) / out_size
    bin_h = (y2 - y1) / out_size

    s = sampling_ratio
    # Sub-sample offsets within a bin: (out*s,) fractional positions.
    grid = (jnp.arange(out_size * s, dtype=jnp.float32).reshape(out_size, s)
            % s)
    pos = (jnp.arange(out_size, dtype=jnp.float32)[:, None] +
           (grid + 0.5) / s).reshape(-1)                      # (out*s,)

    # Sample coords: (N, R, out*s)
    ys = y1[..., None] + pos * bin_h[..., None]
    xs = x1[..., None] + pos * bin_w[..., None]

    def corners(v, size):
        """v: (N,R,K) coords; size: (N,R) dim -> (lo, hi, frac, valid)."""
        valid = (v >= -1.0) & (v <= size[..., None])
        vc = jnp.clip(v, 0.0, None)
        lo = jnp.floor(vc).astype(jnp.int32)
        max_lo = (size[..., None] - 1).astype(jnp.int32)
        degenerate = lo >= max_lo
        lo = jnp.minimum(lo, max_lo)
        hi = jnp.minimum(lo + 1, max_lo)
        frac = jnp.where(degenerate, 0.0, vc - lo)
        return lo, hi, frac, valid

    y_lo, y_hi, fy, vy = corners(ys, h_of)
    x_lo, x_hi, fx, vx = corners(xs, w_of)

    k = out_size * s
    w_b = w_int[..., None, None]
    basef = base[..., None, None]

    def flat_idx(yi, xi):
        return basef + yi[..., :, None] * w_b + xi[..., None, :]

    idx00 = flat_idx(y_lo, x_lo)          # (N, R, k, k)
    idx01 = flat_idx(y_lo, x_hi)
    idx10 = flat_idx(y_hi, x_lo)
    idx11 = flat_idx(y_hi, x_hi)

    wy1 = fy[..., :, None] * jnp.ones_like(fx[..., None, :])
    wx1 = jnp.ones_like(fy[..., :, None]) * fx[..., None, :]
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1
    valid = (vy[..., :, None] & vx[..., None, :]).astype(jnp.float32)

    r = rois.shape[1]

    def gather(idx):
        g = jnp.take_along_axis(flat, idx.reshape(n, -1)[..., None], axis=1)
        return g.reshape(n, r, k, k, c).astype(jnp.float32)

    w00 = (wy0 * wx0 * valid)[..., None]
    w01 = (wy0 * wx1 * valid)[..., None]
    w10 = (wy1 * wx0 * valid)[..., None]
    w11 = (wy1 * wx1 * valid)[..., None]
    samples = (gather(idx00) * w00 + gather(idx01) * w01 +
               gather(idx10) * w10 + gather(idx11) * w11)

    # Average the s x s sub-samples of each bin.
    samples = samples.reshape(n, r, out_size, s, out_size, s, c)
    out = jnp.mean(samples, axis=(3, 5))
    return out.astype(dtype)


def _axis_weights(coord, size, s):
    """One-hot bilinear weight rows for one axis.

    coord: (N, R, out*s) sample positions at a level; size: scalar dim.
    Returns (N, R, out, size): per-bin interpolation rows with the
    sampling_ratio average folded in (bin value = mean of s sub-samples,
    and bilinear is separable, so the mean folds into the weight matrix).
    """
    valid = (coord >= -1.0) & (coord <= size)
    vc = jnp.clip(coord, 0.0, None)
    lo = jnp.floor(vc).astype(jnp.int32)
    max_lo = size - 1
    degenerate = lo >= max_lo
    lo = jnp.minimum(lo, max_lo)
    hi = jnp.minimum(lo + 1, max_lo)
    frac = jnp.where(degenerate, 0.0, vc - lo)

    iota = jax.lax.broadcasted_iota(jnp.int32, (size,), 0)
    w = ((iota == lo[..., None]) * (1.0 - frac[..., None]) +
         (iota == hi[..., None]) * frac[..., None])
    w = w * valid[..., None]
    n, r, k = coord.shape
    return w.reshape(n, r, k // s, s, size).mean(3)


@partial(jax.jit, static_argnames=('out_size', 'sampling_ratio',
                                   'strides', 'finest_scale'))
def roi_align_fpn_mm(feats: tuple,
                     rois: jnp.ndarray,
                     out_size: int = 7,
                     sampling_ratio: int = 2,
                     strides: tuple = (4, 8, 16, 32),
                     finest_scale: float = 56.0) -> jnp.ndarray:
    """RoIAlign as separable one-hot MATMULS (the TPU-native formulation).

    Bilinear sampling is separable, so each RoI's 7x7 extraction at its
    level is  Ay (7, H) @ F (H, W, C) @ Ax^T (W, 7)  with Ay/Ax carrying
    <=2 non-zeros per row. XLA gathers serialize badly on TPU (~7 ms for
    336 RoIs); as batched GEMMs the same op rides the MXU in <1 ms.
    Per-RoI level routing is handled by computing every level (pyramid
    cost sum is ~1.33x level 0) and one-hot selecting.

    Matches roi_align_fpn (gather formulation) to float tolerance —
    cross-checked in tests/test_roi_align.py.
    """
    num_levels = len(feats)
    n, r, _ = rois.shape
    c = feats[0].shape[-1]
    dtype = feats[0].dtype

    lvl = roi_levels(rois, num_levels, finest_scale)          # (N, R)
    s = sampling_ratio
    pos = (jnp.arange(out_size, dtype=jnp.float32)[:, None] +
           (jnp.arange(s, dtype=jnp.float32)[None, :] + 0.5) / s).reshape(-1)

    rois_f = rois.astype(jnp.float32)
    per_level = []
    for li, stride in enumerate(strides):
        h_l, w_l = feats[li].shape[1:3]
        x1 = rois_f[..., 0] / stride - 0.5
        y1 = rois_f[..., 1] / stride - 0.5
        x2 = rois_f[..., 2] / stride - 0.5
        y2 = rois_f[..., 3] / stride - 0.5
        ys = y1[..., None] + pos * ((y2 - y1) / out_size)[..., None]
        xs = x1[..., None] + pos * ((x2 - x1) / out_size)[..., None]
        ay = _axis_weights(ys, h_l, s).astype(dtype)   # (N, R, 7, H)
        ax = _axis_weights(xs, w_l, s).astype(dtype)   # (N, R, 7, W)
        tmp = jnp.einsum('nrih,nhwc->nriwc', ay, feats[li],
                         preferred_element_type=jnp.float32)
        out_l = jnp.einsum('nriwc,nrjw->nrijc', tmp.astype(dtype), ax,
                           preferred_element_type=jnp.float32)
        per_level.append(out_l)

    stacked = jnp.stack(per_level)                      # (L, N, R, 7, 7, C)
    onehot = jax.nn.one_hot(lvl, num_levels, axis=0,
                            dtype=stacked.dtype)        # (L, N, R)
    out = jnp.einsum('lnrijc,lnr->nrijc', stacked, onehot)
    return out.astype(dtype)
