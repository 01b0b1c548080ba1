"""On-device gaze MAE (jnp twin of evaluation/mae.py::gaze_error).

The north-star target names "on-device MAE-Front180 evaluation"
(BASELINE.json); the offline numpy scorer stays the default (float64,
no accelerator — the reference's own scorer is torch-CPU,
tools/calculate_mae_gaze360.py), and this module provides the
accelerator path: every video's (pred, gt) tracks concatenate into ONE
flat (N, 3) pair, the per-video smoothing stencil + angular math run in
a single jitted program (video boundaries handled by a segment-id mask,
so the edge handling of smooth_filter is exact), and one scalar readback
returns the three frame-weighted buckets.

Numerics: the device path accumulates in float32 (TPU-native) vs the
numpy scorer's float64 — measured agreement ~1e-4 deg on unit-scale
tracks (tests/test_mae.py::test_device_scorer_matches_numpy); acos near
|dot|=1 is the sensitive spot.
"""
from __future__ import annotations

import functools

import numpy as np


@functools.cache
def _score_flat_fn():
    import jax
    return jax.jit(_score_flat, static_argnames=('smooth', 'l2cs'))


def _score_flat(pred, gt, vid, smooth: bool = True, l2cs: bool = False):
    """pred/gt (N, 3) f32, vid (N,) int32 video segment ids.
    Returns (err_sum_360, n_360, err_sum_90, n_90, err_sum_20, n_20)."""
    import jax.numpy as jnp

    alpha = 0.6
    if smooth:
        same_prev = jnp.concatenate(
            [jnp.zeros((1,), bool), vid[1:] == vid[:-1]])
        same_next = jnp.concatenate(
            [vid[:-1] == vid[1:], jnp.zeros((1,), bool)])
        xp = jnp.roll(pred, 1, axis=0) * same_prev[:, None]
        xn = jnp.roll(pred, -1, axis=0) * same_next[:, None]
        cnt = same_prev.astype(jnp.float32) + same_next.astype(jnp.float32)
        out = alpha * pred + (1 - alpha) * (xp + xn) / jnp.maximum(
            cnt, 1.0)[:, None]
        norm = jnp.linalg.norm(out, axis=1, keepdims=True)
        out = out / jnp.maximum(norm, 1e-12)
        # length-1 videos pass through UNCHANGED (reference
        # smooth_filter's T < 2 early return — not even renormalised)
        pred = jnp.where((cnt > 0)[:, None], out, pred)

    gtn = gt / jnp.maximum(jnp.linalg.norm(gt, axis=1, keepdims=True),
                           1e-12)
    dots = jnp.clip(jnp.sum(pred * gtn, axis=1), -1.0, 1.0)
    err = jnp.degrees(jnp.arccos(dots))

    yaw = jnp.degrees(jnp.abs(jnp.arctan2(gtn[:, 0], -gtn[:, 2])))
    front90 = yaw <= 90
    front20 = yaw <= 20
    if l2cs:
        pitch = jnp.degrees(jnp.abs(jnp.arcsin(
            jnp.clip(gtn[:, 1], -1.0, 1.0))))
        front20 = front20 & (pitch <= 20)

    def bucket(mask):
        m = mask.astype(jnp.float32)
        return jnp.sum(err * m), jnp.sum(m)

    e90, n90 = bucket(front90)
    e20, n20 = bucket(front20)
    return (jnp.sum(err), jnp.float32(err.shape[0]), e90, n90, e20, n20)


def gaze_error_device(eval_data: list, anno_data: dict,
                      gaze_name: str = 'fusion_gazes',
                      smooth: bool = True, l2cs: bool = False) -> dict:
    """Drop-in for mae.gaze_error computing the angular math on the
    accelerator. Same bucket semantics: per-video mean x frame count =
    per-frame error sums, frame-weighted across videos."""
    preds, gts, vids = [], [], []
    for anno_id, video in enumerate(eval_data):
        p = np.asarray(video[gaze_name], np.float32)
        gt_row = anno_id * 3 if l2cs else anno_id
        g = np.asarray(anno_data['annotations'][gt_row]['gaze'],
                       np.float32)
        assert len(g) == len(p), (anno_id, len(g), len(p))
        preds.append(p)
        gts.append(g)
        vids.append(np.full(len(p), anno_id, np.int32))
    if not preds:
        return dict(mae360=0.0, front90=0.0, front20=0.0, frames=0)
    out = _score_flat_fn()(np.concatenate(preds), np.concatenate(gts),
                           np.concatenate(vids), smooth=smooth, l2cs=l2cs)
    e360, f360, e90, f90, e20, f20 = (float(x) for x in out)
    return dict(
        mae360=e360 / max(f360, 1),
        front90=e90 / max(f90, 1),
        front20=e20 / max(f20, 1),
        frames=int(f360),
    )
