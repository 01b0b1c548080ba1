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

Round 5: each level's whole block is PREDICATED (`pl.when` over 'some
RoI of this chunk routes here', from the SMEM box scalars) and the
wrapper stable-sorts chunked RoI loads by level per frame so chunks are
level-pure — mmcv's own per-level gather
(single_level_roi_extractor.py:57-75) done inside one kernel. Non-routed
levels only ever contributed exact zeros, so the output is bit-identical
(d=0 verified on chip); measured at the InstBlink shape (4,400 RoIs,
384x640 bf16): 10.4 -> 6.6 ms (all-L0 boxes) / 6.4 (mixed) / 4.6
(image-scale), lifting the family's bench metric 34.3 -> 50.2 clips/s.
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


def _axis_weights_rows(lo_col, bin_col, idx_col, size: int,
                       sampling_ratio: int):
    """Vectorized bilinear rows for MANY (roi, bin) rows at once.

    lo_col/bin_col/idx_col: (M, 1) per-row start coord, bin size and bin
    index. Returns (M, size) — same math as _axis_weights_grid but with
    the per-RoI python loop replaced by row broadcasting, so one op
    chain covers every RoI of the chunk (the unrolled kernel emits one
    chain per RoI, which is what capped it at ~16 RoIs/step)."""
    m = lo_col.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (m, size), 1).astype(
        jnp.float32)
    w = jnp.zeros((m, size), jnp.float32)
    for k in range(sampling_ratio):
        coord = lo_col + (idx_col + (k + 0.5) / sampling_ratio) * bin_col
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


def _make_kernel_vec(num_rois: int, out_size: int, sampling_ratio: int,
                     strides: tuple, sizes: tuple, channels: int,
                     finest_scale: float, acc_dtype, group: int = 0):
    """Vectorized kernel body for large RoI chunks (the query family).

    Differences vs _make_kernel (measured on the unrolled body at the
    InstBlink shape — NOTES.md round-4 item 7 kernel follow-up):
      * weights for all R RoIs are built in ONE vectorized op chain
        (rois read from VMEM as vectors, not SMEM scalars), so Mosaic's
        per-RoI code-size blowup — what made R=20/25 chunks SLOWER than
        R=10 and R>=50 fail to lower — is gone;
      * the first contraction is i-major (rows ordered bin-then-roi), so
        after the sublane unflatten each output row i owns a CONTIGUOUS
        (R*W, C) slab of t;
      * the second contraction runs in block-diagonal GROUPS of `group`
        RoIs: out_size*(R/G) dots of (G*7, G*W) @ (G*W, C) instead of
        R*7*out_size tiny (7, W)@(W, C) dots — G trades a G-fold FLOP
        inflation (each group row carries (G-1)*W exact-zero weights)
        against a G*7-fold cut in MXU issue count. group=0 means G=R
        (one dot per output row, maximum inflation); group=1 keeps the
        unrolled body's FLOP count while still building weights
        vectorized.
    Numerics are identical in structure (f32 accumulation, bf16 weight
    cast, routing mask folded into AY; the block-diag rows only add
    exact zeros to the x-contraction).

    MEASURED NEGATIVE (kept opt-in; v5e, 4400 RoIs at the InstBlink
    384x640 bf16 pyramid, 2026-08-19): the unrolled body at R=10 chunks
    runs 12.87 ms; this body loses at every (cap, group) swept —
    g=1: 17.53/17.21/16.71/18.67 ms at cap 10/20/25/50; g=2: 18.14/
    17.97 (cap 10/20); g=5: 19.16/18.49 (cap 10/25); g=R: 21.76/25.56/
    36.75 (cap 10/20/25). Full-group cost scales with the G-fold
    x-FLOP inflation, and even g=1 (identical dot structure to the
    unrolled body) pays ~35% for the wide weight build + VMEM box
    reads, so the per-RoI scalar chains are NOT the unrolled body's
    cost center. What this body does buy: R=50 chunks COMPILE (the
    unrolled body's Mosaic lowering fails beyond ~25), so it is the
    fallback if a caller ever needs giant per-step chunks.
    """
    num_levels = len(strides)
    r7 = num_rois * out_size
    group = group or num_rois
    assert num_rois % group == 0, (num_rois, group)
    n_groups = num_rois // group

    def kernel(rois_ref, *refs):
        feat_refs = refs[:num_levels]
        out_ref = refs[num_levels]

        boxes = rois_ref[0]                       # (R, 4) f32, VMEM
        x1 = boxes[:, 0:1]
        y1 = boxes[:, 1:2]
        x2 = boxes[:, 2:3]
        y2 = boxes[:, 3:4]
        area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
        v = jnp.sqrt(area) / finest_scale + 1e-6  # (R, 1)

        # row indices shared by every level
        i_rows = (jax.lax.broadcasted_iota(jnp.int32, (r7, 1), 0)
                  // num_rois).astype(jnp.float32)     # AY i-major
        j_rows = (jax.lax.broadcasted_iota(jnp.int32, (r7, 1), 0)
                  % out_size).astype(jnp.float32)      # BD r-major

        acc = [None] * (n_groups * out_size)
        for li in range(num_levels):
            h_l, w_l = sizes[li]
            stride = float(strides[li])
            lo_m = 2.0 ** li
            hi_m = 2.0 ** (li + 1)
            mask = (v >= lo_m) & (v < hi_m)
            if li == 0:
                mask = v < hi_m
            if li == num_levels - 1:
                mask = v >= lo_m
            mask = mask.astype(jnp.float32)            # (R, 1)

            # AY, i-major rows (i*R + r): tile puts r fastest
            y_lo = y1 / stride - 0.5
            y_bin = (y2 / stride - 0.5 - y_lo) / out_size
            ay = _axis_weights_rows(
                jnp.tile(y_lo, (out_size, 1)),
                jnp.tile(y_bin, (out_size, 1)),
                i_rows, h_l, sampling_ratio)
            # level routing folded into AY exactly as the unrolled
            # kernel does (a RoI contributes from one level only)
            ay = ay * jnp.tile(mask, (out_size, 1))

            f = feat_refs[li][0].reshape(h_l, w_l * channels)
            t = jnp.dot(ay.astype(f.dtype), f,
                        preferred_element_type=acc_dtype).astype(f.dtype)
            t2 = t.reshape(r7 * w_l, channels)

            # block-diagonal AX: rows (r, j) j-fastest, cols (r % G, w).
            # Row r*out+j of group g = r//G carries ax[r, j] at columns
            # (r % G)*W + w; a group's rows/slabs are contiguous because
            # rows are r-major and t2 is i-major.
            x_lo = jnp.repeat(x1 / stride - 0.5, out_size, axis=0)
            x_bin = jnp.repeat((x2 - x1) / stride / out_size, out_size,
                               axis=0)
            col_i = jax.lax.broadcasted_iota(jnp.int32,
                                             (r7, group * w_l), 1)
            w_idx = (col_i % w_l).astype(jnp.float32)
            band = (col_i // w_l) == (jax.lax.broadcasted_iota(
                jnp.int32, (r7, group * w_l), 0) // out_size) % group
            bd = jnp.zeros((r7, group * w_l), jnp.float32)
            for k in range(sampling_ratio):
                coord = x_lo + (j_rows + (k + 0.5) / sampling_ratio) \
                    * x_bin
                valid = (coord >= -1.0) & (coord <= float(w_l))
                vc = jnp.maximum(coord, 0.0)
                lo = jnp.floor(vc)
                degenerate = lo >= float(w_l - 1)
                lo = jnp.minimum(lo, float(w_l - 1))
                hi = jnp.minimum(lo + 1.0, float(w_l - 1))
                frac = jnp.where(degenerate, 0.0, vc - lo)
                wk = ((w_idx == lo) * (1.0 - frac) + (w_idx == hi) * frac)
                bd = bd + wk * valid
            bd = (bd / sampling_ratio) * band.astype(jnp.float32)
            bd = bd.astype(f.dtype)

            for g in range(n_groups):
                bd_g = bd[g * group * out_size:(g + 1) * group * out_size]
                for i in range(out_size):
                    lo_row = (i * num_rois + g * group) * w_l
                    slab = t2[lo_row:lo_row + group * w_l, :]
                    o = jnp.dot(bd_g, slab,
                                preferred_element_type=acc_dtype)
                    k = g * out_size + i
                    acc[k] = o if acc[k] is None else acc[k] + o

        for g in range(n_groups):
            for i in range(out_size):
                out_ref[0, g * group:(g + 1) * group, i, :, :] = \
                    acc[g * out_size + i].reshape(
                        group, out_size, channels).astype(out_ref.dtype)

    return kernel


def _make_kernel(num_rois: int, out_size: int, sampling_ratio: int,
                 strides: tuple, sizes: tuple, channels: int,
                 finest_scale: float, acc_dtype, level_skip: bool = True):
    """channels here is the per-grid-step channel block (= C, or a chunk
    of it when the pyramid is too large for VMEM — see _channel_chunk).

    level_skip (round 5): each level's whole contraction block runs
    under a pl.when predicate — 'some RoI of this chunk routes here' —
    computed from the SMEM box scalars. A RoI contributes from exactly
    one level (the routing masks are disjoint), so the skipped levels
    only ever added EXACT ZEROS to the accumulator (mask-zeroed AY →
    t == 0 → o == 0); predicating them away changes no bits while
    skipping up to 3 of 4 levels' y-contractions, weight builds and
    lane→sublane relayouts per step. The wrapper sorts big RoI loads by
    level (roi_align_fpn_pallas) so chunks are level-pure and the
    predicate usually fires exactly once. Accumulation moves from a
    python-list f32 acc to out_ref read-modify-write: the owner level
    writes cast(o_owner), other executed levels add exact zeros —
    bit-identical to cast(sum of one non-zero term).
    """
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

        def routed_bool(r, level):
            v = jnp.sqrt(areas[r]) / finest_scale + 1e-6
            lo = 2.0 ** level
            hi = 2.0 ** (level + 1)
            m = (v >= lo) & (v < hi)
            if level == 0:
                m = v < hi
            if level == num_levels - 1:
                m = v >= lo
            return m

        if level_skip:
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        acc = [None] * (num_rois * out_size)

        def level_block(li):
            h_l, w_l = sizes[li]
            stride = float(strides[li])
            ays = []
            axs = []
            for r in range(num_rois):
                x1, y1, x2, y2 = boxes[r]
                mask = routed_bool(r, li).astype(jnp.float32)
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
                    if level_skip:
                        out_ref[0, r, i, :, :] += o.astype(out_ref.dtype)
                    else:
                        acc[k] = o if acc[k] is None else acc[k] + o

        for li in range(num_levels):
            if level_skip:
                used = routed_bool(0, li)
                for r in range(1, num_rois):
                    used = used | routed_bool(r, li)
                pl.when(used)(partial(level_block, li))
            else:
                level_block(li)

        if not level_skip:
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

# Chunk cap when the vectorized body is explicitly requested: it has no
# per-RoI code blowup, so its cap is a VMEM bound (the t f32 temp scales
# with R; R=50 compiles at the InstBlink pyramid, R=10/20/25 all
# measured), not a Mosaic lowering bound. The unrolled body stays the
# default at EVERY RoI count — the vec body measured slower across the
# whole (cap, group) sweep (see _make_kernel_vec docstring).
_MAX_ROIS_PER_STEP_VEC = 20


def _step_vmem_bytes(sizes, cc, r, out_size, itemsize, vec=False,
                     vec_group=0):
    """Estimate of one grid step's scoped-VMEM use: double-buffered
    pyramid blocks + the kernel's f32 contraction temporaries (the
    (R*out, W*CC) row blocks — these scale with R, so the query family's
    R=10 chunks cost ~6x the gaze path's R=3 at the same pyramid) + the
    double-buffered out block. Calibrated against observed Mosaic stack
    allocations (which run ~1.3x this estimate — the params decision
    below doubles it). The vectorized body adds the (R*out, R*W)
    block-diagonal x-weight build (f32 + cast copy) and the per-i f32
    accumulators."""
    cells = sum(h * w for (h, w) in sizes)
    blocks = cells * cc * itemsize * 2
    max_w = max(w for (_, w) in sizes)
    temp = r * out_size * max_w * cc * 4 * 2
    out_blk = r * out_size * out_size * cc * itemsize * 2
    extra = 0
    if vec:
        g = vec_group or r
        extra = (r * out_size * g * max_w * (4 + itemsize)
                 + out_size * r * out_size * cc * 4)
    return blocks + temp + out_blk + extra


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
                                   'channel_chunk', 'vectorized',
                                   'chunk_cap', 'vec_group', 'level_skip',
                                   'level_sort'))
def roi_align_fpn_pallas(feats: tuple,
                         rois: jnp.ndarray,
                         out_size: int = 7,
                         sampling_ratio: int = 2,
                         strides: tuple = (4, 8, 16, 32),
                         finest_scale: float = 56.0,
                         frame_idx: jnp.ndarray | None = None,
                         interpret: bool = False,
                         channel_chunk: int | None = None,
                         vectorized: bool | None = None,
                         chunk_cap: int | None = None,
                         vec_group: int | None = None,
                         level_skip: bool = True,
                         level_sort: bool = True) -> jnp.ndarray:
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
    slot refetch-skip above still applies within each chunk sweep.

    vectorized: use the all-RoI vectorized kernel body (_make_kernel_vec)
    instead of the per-RoI unrolled one. Opt-in only: the unrolled body
    measured faster at every swept (chunk_cap, vec_group), including the
    query family's R=100 loads — see _make_kernel_vec's docstring. The
    vec body exists as the giant-chunk fallback (R>25 chunks compile).
    chunk_cap: override the per-grid-step RoI cap (benchmarks only).
    vec_group: block-diagonal group size for the vectorized body's
    x-contraction (must divide the per-step RoI count; None = the full
    chunk — see _make_kernel_vec).
    level_skip: predicate each level's contraction block on 'some RoI of
    this chunk routes here' (pl.when over SMEM scalars) — bit-identical
    output, skips the exact-zero levels (see _make_kernel). False = the
    round-4 compute-all-levels body (A/B benchmarks).
    level_sort: when the RoI axis is chunked (r > cap), stable-sort each
    frame's RoIs by FPN level first and invert the permutation on the
    output, so chunks are level-pure and level_skip usually executes
    exactly ONE level per grid step. Pure reordering — the kernel's
    per-RoI routing masks are unchanged, so this is exact regardless of
    the predicate. mmcv does the same thing one abstraction up
    (single_level_roi_extractor.py:57-75 gathers each level's RoIs and
    runs that level's RoIAlign on only those)."""
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

    # Constant-input guard — same on-chip finding as the backward
    # wrapper (see roi_align_fpn_pallas_bwd): a compile-time-constant
    # rois folds the level-sort/un-permute index chain into literals,
    # which miscompiles at the pallas custom-call boundary. Pin rois as
    # a runtime value; free (the barrier is erased from optimized HLO).
    if not interpret:
        (rois,) = jax.lax.optimization_barrier((rois,))

    cap = chunk_cap or (_MAX_ROIS_PER_STEP_VEC if vectorized
                        else _MAX_ROIS_PER_STEP)
    if r > cap:
        # a 100-query grid step (TeViT/InstBlink) either fails to lower
        # (unrolled body: 'infer-vector-layout: unsupported shape cast'
        # beyond R~25) or blows the VMEM budget on the (R*7, W*C) f32
        # contraction temporary (vectorized body). Split the RoI axis
        # across grid steps instead: consecutive steps keep the same
        # frame index, so the pipeline's same-block refetch skip means
        # the pyramid still crosses HBM once per frame.
        k = max(d for d in range(1, cap + 1) if r % d == 0)
        if frame_idx is None:
            assert u == n, (u, n)
            frame_idx = jnp.arange(n, dtype=jnp.int32)
        order = None
        if level_sort:
            from .roi_align import roi_levels
            lv = roi_levels(rois, num_levels=len(strides),
                            finest_scale=finest_scale)        # (n, r)
            order = jnp.argsort(lv, axis=1, stable=True)
            rois = jnp.take_along_axis(rois, order[..., None], axis=1)
        out = roi_align_fpn_pallas(
            feats, rois.reshape(n * (r // k), k, 4), out_size=out_size,
            sampling_ratio=sampling_ratio, strides=strides,
            finest_scale=finest_scale,
            frame_idx=jnp.repeat(frame_idx, r // k),
            interpret=interpret, channel_chunk=channel_chunk,
            vectorized=vectorized, chunk_cap=chunk_cap,
            vec_group=vec_group, level_skip=level_skip,
            level_sort=False)
        out = out.reshape(n, r, out_size, out_size, c)
        if order is not None:
            inv = jnp.argsort(order, axis=1, stable=True)
            out = jnp.take_along_axis(
                out, inv[..., None, None, None], axis=1)
        return out

    cc = channel_chunk or _channel_chunk(sizes, c, dtype.itemsize)
    assert c % cc == 0, (c, cc)

    use_vec = bool(vectorized)
    if use_vec:
        kernel = _make_kernel_vec(r, out_size, sampling_ratio, strides,
                                  sizes, cc, finest_scale, jnp.float32,
                                  group=vec_group or 0)
    else:
        kernel = _make_kernel(r, out_size, sampling_ratio, strides, sizes,
                              cc, finest_scale, jnp.float32,
                              level_skip=level_skip)

    if frame_idx is None:
        assert u == n, (u, n)
        frame_idx = jnp.arange(n, dtype=jnp.int32)

    def _k(fidx_ref, *refs):
        kernel(*refs)

    # the unrolled body reads per-RoI scalars (SMEM); the vectorized
    # body reads the boxes as (R, 4) vectors (VMEM)
    rois_space = pltpu.VMEM if use_vec else pltpu.SMEM

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
                                   memory_space=rois_space)] + [
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
                                   memory_space=rois_space)] + [
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
    step_bytes = _step_vmem_bytes(sizes, cc, r, out_size, dtype.itemsize,
                                  vec=use_vec, vec_group=vec_group or 0)
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


def _axis_weights_grid_t(lo_c: jnp.ndarray, hi_c: jnp.ndarray, size: int,
                         out_size: int, sampling_ratio: int):
    """Transposed bilinear one-hot rows for one RoI on one axis:
    (size, out_size). Same math as _axis_weights_grid with the two iota
    roles swapped, so the backward kernel's contractions are plain
    row-major matmuls (no in-kernel transposes)."""
    bin_sz = (hi_c - lo_c) / out_size
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (size, out_size), 0).astype(jnp.float32)
    ii = jax.lax.broadcasted_iota(
        jnp.int32, (size, out_size), 1).astype(jnp.float32)
    w = jnp.zeros((size, out_size), jnp.float32)
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


def _make_bwd_kernel(num_rois: int, out_size: int, sampling_ratio: int,
                     strides: tuple, sizes: tuple, channels: int,
                     finest_scale: float,
                     merged: bool, chunked_grid: bool):
    """Backward kernel body: cotangent (1, R, out, out, CC) -> per-level
    pyramid gradient blocks, accumulated across the RoI chunks of a
    frame (the out blocks revisit — same frame index for cpf consecutive
    grid steps — so Mosaic keeps them in VMEM and writes back once).

    RoIAlign is linear: out_{r} = AY_r @ F_l @ AX_r^T at the routed
    level, so dF_l = sum_r AY_r^T @ G_r @ AX_r. Both transposed weight
    matrices are built directly in transposed layout
    (_axis_weights_grid_t) so every contraction is a plain matmul:
      per (r, i): m = AX_r^T (W, out) @ G[r, i] (out, CC)   [VPU-cheap]
      per level : dF += AYT (H, R*out) @ M (R*out, W*CC)    [the MXU dot]
    Level routing masks fold into AYT exactly as the forward folds them
    into AY; level blocks run under the same 'some RoI routes here'
    predicate, and the wrapper level-sorts chunks, so the zero-only
    levels are skipped (identical structure to the forward kernel)."""
    num_levels = len(strides)

    def kernel(rois_ref, g_ref, *out_refs):
        # chunk index is the INNERMOST grid dim; the out blocks' index
        # maps ignore it (static revisit — the canonical pallas reduction
        # pattern), so the gradient blocks persist in VMEM across the
        # frame's chunks and write back once. A dynamic (scalar-prefetch)
        # out map was measured WRONG on chip here: the revisit is not
        # detected, each step gets a fresh buffer, and not-first chunks
        # accumulate uninitialised VMEM (maxdiff ~60 vs ref ~4 at the
        # InstBlink shape; the interpret simulator's single-buffer
        # semantics hid it).
        first = pl.program_id(2 if chunked_grid else 1) == 0

        @pl.when(first)
        def _zero():
            for o in out_refs:
                o[...] = jnp.zeros(o.shape, o.dtype)

        boxes = [[rois_ref[0, r, i] for i in range(4)]
                 for r in range(num_rois)]
        areas = [jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
                 for (x1, y1, x2, y2) in boxes]

        def routed_bool(r, level):
            v = jnp.sqrt(areas[r]) / finest_scale + 1e-6
            lo = 2.0 ** level
            hi = 2.0 ** (level + 1)
            m = (v >= lo) & (v < hi)
            if level == 0:
                m = v < hi
            if level == num_levels - 1:
                m = v >= lo
            return m

        def level_block(li):
            h_l, w_l = sizes[li]
            stride = float(strides[li])
            ayts = []
            rows = []
            for r in range(num_rois):
                x1, y1, x2, y2 = boxes[r]
                mask = routed_bool(r, li).astype(jnp.float32)
                ayt = _axis_weights_grid_t(y1 / stride - 0.5,
                                           y2 / stride - 0.5,
                                           h_l, out_size, sampling_ratio)
                axt = _axis_weights_grid_t(x1 / stride - 0.5,
                                           x2 / stride - 0.5,
                                           w_l, out_size, sampling_ratio)
                ayts.append(ayt * mask)   # routing mask folded into AYT
                axt = axt.astype(g_ref.dtype)
                for i in range(out_size):
                    gi = g_ref[0, r, i, :, :]          # (out, CC)
                    rows.append(jnp.dot(axt, gi,
                                        preferred_element_type=jnp.float32
                                        ).astype(g_ref.dtype))  # (W, CC)
            ayt_all = jnp.concatenate(ayts, axis=1)    # (H, R*out)
            m_all = jnp.concatenate(rows, axis=0).reshape(
                num_rois * out_size, w_l * channels)   # (R*out, W*CC)
            df = jnp.dot(ayt_all.astype(m_all.dtype), m_all,
                         preferred_element_type=jnp.float32)  # (H, W*CC)
            o = out_refs[li]
            if merged:
                o[0] += df.astype(o.dtype)
            else:
                o[0] += df.reshape(h_l, w_l, channels).astype(o.dtype)

        for li in range(num_levels):
            used = routed_bool(0, li)
            for r in range(1, num_rois):
                used = used | routed_bool(r, li)
            pl.when(used)(partial(level_block, li))

    return kernel


def _bwd_step_vmem_bytes(sizes, cc, k, out_size, itemsize):
    """Scoped-VMEM estimate for one backward grid step: the resident
    per-level gradient blocks (+ double-buffered write-back), the
    double-buffered cotangent block, and the kernel temporaries (the
    (R*out, W*CC) m rows in f32 + their cast copy, the f32 df, the AYT
    builds). Same 2x calibration treatment as _step_vmem_bytes."""
    cells = sum(h * w for (h, w) in sizes)
    out_blocks = cells * cc * itemsize * 2
    g_block = k * out_size * out_size * cc * itemsize * 2
    max_w = max(w for (_, w) in sizes)
    max_h = max(h for (_, h) in sizes)
    temps = (k * out_size * max_w * cc * (4 + 2 * itemsize)
             + max_h * max_w * cc * 4
             + k * out_size * max_h * 4)
    return out_blocks + g_block + temps


@partial(jax.jit, static_argnames=('out_size', 'sampling_ratio', 'strides',
                                   'finest_scale', 'interpret',
                                   'channel_chunk', 'chunk_cap'))
def roi_align_fpn_pallas_bwd(feats, rois, g,
                             out_size: int = 7,
                             sampling_ratio: int = 2,
                             strides: tuple = (4, 8, 16, 32),
                             finest_scale: float = 56.0,
                             interpret: bool = False,
                             channel_chunk: int | None = None,
                             chunk_cap: int | None = None) -> tuple:
    """Pallas feature-gradient for roi_align_fpn_pallas (identity
    frame_idx — the training path; the dedup eval path never
    differentiates). feats are used for shapes/dtypes only (RoIAlign is
    linear in feats). Returns the per-level gradient tuple.

    Mirrors the forward wrapper: RoI chunking with per-frame level
    sorting (the chunk permutation is applied to g instead of inverted
    on the output) and the same VMEM-estimate-driven limit lift. The
    grid is (n, chunks) — RoI chunks INNERMOST with the out maps
    ignoring them (static accumulator revisit; channel chunking adds an
    outer dim). Matches the XLA mm-formulation vjp to float tolerance
    (tests/test_roi_align.py) and was verified bit-consistent on chip
    against the mm transpose at f32 (d=1.9e-6 rel)."""
    n, r = rois.shape[:2]
    c = feats[0].shape[-1]
    sizes = tuple((f.shape[1], f.shape[2]) for f in feats)
    dtype = feats[0].dtype

    if c % 128 != 0 and not interpret:
        # same Mosaic lane constraint as the forward: fall back to the
        # XLA formulation's transpose
        from .roi_align import roi_align_fpn_mm
        _, vjp = jax.vjp(
            lambda f: roi_align_fpn_mm(f, rois, out_size=out_size,
                                       sampling_ratio=sampling_ratio,
                                       strides=strides,
                                       finest_scale=finest_scale), feats)
        return vjp(g.astype(dtype))[0]

    # Constant-input guard (found on chip, round 5, jax 0.9.0): when
    # `rois` is a compile-time CONSTANT of the surrounding jit (e.g. a
    # grad taken with closed-over boxes), XLA folds the level-sort
    # indices below into literals and lowers the g permutation through a
    # bitpacked-index gather whose output, fed to the pallas custom
    # call, is read WRONG on chip (maxdiff ~60-69 vs ref scale ~6 at the
    # InstBlink shape; deterministic). The identical program with traced
    # rois — and the bitpacked gather in isolation — are both exact, so
    # this is a const-chain x custom-call boundary miscompile, not a
    # kernel bug. Pinning the inputs as runtime values at wrapper entry
    # routes the whole chain through the verified lowering; ~free (the
    # barrier disappears from the optimized HLO).
    # Verified on chip by tools/analysis_tools/roi_kernel_check.py.
    if not interpret:
        rois, g = jax.lax.optimization_barrier((rois, g))

    cap = chunk_cap or _MAX_ROIS_PER_STEP
    k = max(d for d in range(1, min(cap, r) + 1) if r % d == 0)
    cpf = r // k
    if cpf > 1:
        # level-pure chunks: sort each frame's RoIs by FPN level and
        # carry g along (pure reordering — sum over RoIs is permutation
        # invariant, so no inverse is needed on the output)
        from .roi_align import roi_levels
        lv = roi_levels(rois, num_levels=len(strides),
                        finest_scale=finest_scale)
        order = jnp.argsort(lv, axis=1, stable=True)
        rois = jnp.take_along_axis(rois, order[..., None], axis=1)
        g = jnp.take_along_axis(g, order[..., None, None, None], axis=1)
    nc = n * cpf
    rois_c = rois.reshape(nc, k, 4)
    g_c = g.reshape(nc, k, out_size, out_size, c)

    cc = channel_chunk or _channel_chunk(sizes, c, dtype.itemsize)
    assert c % cc == 0, (c, cc)
    merged = cc == c

    kernel = _make_bwd_kernel(k, out_size, sampling_ratio, strides, sizes,
                              cc, finest_scale, merged=merged,
                              chunked_grid=not merged)

    # STATIC grids only (identity frame mapping): the out blocks' index
    # maps must ignore the innermost chunk dim so Mosaic keeps one
    # accumulator buffer per frame sweep — see _make_bwd_kernel.
    if merged:
        grid = (n, cpf)
        in_specs = [
            pl.BlockSpec((1, k, 4), lambda i, j2: (i * cpf + j2, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, k, out_size, out_size, c),
                         lambda i, j2: (i * cpf + j2, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = [
            pl.BlockSpec((1, h, w * c), lambda i, j2: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for (h, w) in sizes
        ]
        out_shape = [jax.ShapeDtypeStruct((n, h, w * c), dtype)
                     for (h, w) in sizes]
    else:
        grid = (c // cc, n, cpf)
        in_specs = [
            pl.BlockSpec((1, k, 4), lambda j, i, j2: (i * cpf + j2, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, k, out_size, out_size, cc),
                         lambda j, i, j2: (i * cpf + j2, 0, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = [
            pl.BlockSpec((1, h, w, cc),
                         lambda j, i, j2: (i, 0, 0, j),
                         memory_space=pltpu.VMEM)
            for (h, w) in sizes
        ]
        out_shape = [jax.ShapeDtypeStruct((n, h, w, c), dtype)
                     for (h, w) in sizes]

    step_bytes = _bwd_step_vmem_bytes(sizes, cc, k, out_size,
                                      dtype.itemsize)
    params = None
    if step_bytes > _VMEM_BLOCK_BUDGET and not interpret:
        params = pltpu.CompilerParams(
            vmem_limit_bytes=min(step_bytes * 2 + 16 * 1024 * 1024,
                                 120 * 1024 * 1024))
    grads = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **({'compiler_params': params} if params is not None else {}),
    )(rois_c.astype(jnp.float32), g_c.astype(dtype))
    return tuple(df.reshape(n, h, w, c)
                 for df, (h, w) in zip(grads, sizes))


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def roi_align_fpn_pallas_diff(feats, rois, out_size=7, sampling_ratio=2,
                              strides=(4, 8, 16, 32), finest_scale=56.0):
    """Differentiable wrapper: pallas forward, pallas transpose backward
    on TPU (roi_align_fpn_pallas_bwd — the mm-formulation vjp elsewhere;
    RoIAlign is linear in feats so both transposes are exact). rois get
    zero gradient, matching the reference's detached proposals
    (multiclue_gaze_roi_head.py:134)."""
    return roi_align_fpn_pallas(feats, rois, out_size=out_size,
                                sampling_ratio=sampling_ratio,
                                strides=strides, finest_scale=finest_scale)


def _diff_fwd(feats, rois, out_size, sampling_ratio, strides, finest_scale):
    out = roi_align_fpn_pallas(feats, rois, out_size=out_size,
                               sampling_ratio=sampling_ratio,
                               strides=strides, finest_scale=finest_scale)
    return out, (feats, rois)


def _diff_bwd(out_size, sampling_ratio, strides, finest_scale, res, g):
    feats, rois = res
    if jax.default_backend() == 'tpu':
        # roi_align_fpn_pallas_bwd falls back to the mm transpose itself
        # when C violates the Mosaic lane constraint
        grads = roi_align_fpn_pallas_bwd(
            feats, rois, g.astype(feats[0].dtype), out_size=out_size,
            sampling_ratio=sampling_ratio, strides=strides,
            finest_scale=finest_scale)
        return grads, jnp.zeros_like(rois)
    from .roi_align import roi_align_fpn_mm
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
