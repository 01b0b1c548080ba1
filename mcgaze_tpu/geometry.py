"""Box and gaze geometry primitives (pure jax.numpy, fully jit-able).

TPU-native re-implementation of the geometry used by the reference MCGaze
stack (see /root/reference):
  * box format converters      -> mmdet/core/bbox/transforms.py
  * delta (dx,dy,dw,dh) coder  -> mmdet/core/bbox/coder/delta_xywh_bbox_coder.py
  * GIoU                       -> mmdet/core/bbox/iou_calculators (mode='giou')
  * yaw/pitch <-> unit vector  -> mmdet/models/losses/gaze_arccos_loss.py:69-83

Everything here is shape-polymorphic over leading dims and static-shaped in
the trailing coordinate dim, so it composes under jit/vmap/shard_map.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

# Matches the shipped configs: DeltaXYWHBBoxCoder(target_means=0,
# target_stds=(.5,.5,1,1), clip_border=False); wh_ratio_clip is the mmdet
# default (reference delta_xywh_bbox_coder.py:70).
DELTA_MEANS = (0.0, 0.0, 0.0, 0.0)
DELTA_STDS = (0.5, 0.5, 1.0, 1.0)
WH_RATIO_CLIP = 16.0 / 1000.0


def bbox_cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) [cx, cy, w, h] -> [x1, y1, x2, y2]."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], axis=-1)


def bbox_xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) [x1, y1, x2, y2] -> [cx, cy, w, h]."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1)


def delta2bbox(rois: jnp.ndarray,
               deltas: jnp.ndarray,
               means=DELTA_MEANS,
               stds=DELTA_STDS,
               wh_ratio_clip: float = WH_RATIO_CLIP) -> jnp.ndarray:
    """Decode (dx,dy,dw,dh) deltas against base boxes.

    Mirrors the non-clipped path of the reference `delta2bbox`
    (delta_xywh_bbox_coder.py:163-276 with clip_border=False): denormalise,
    clamp dw/dh to +-|log(wh_ratio_clip)|, shift/scale the roi.

    rois/deltas: (..., 4) xyxy / deltas. Returns (..., 4) xyxy.
    """
    means = jnp.asarray(means, dtype=deltas.dtype)
    stds = jnp.asarray(stds, dtype=deltas.dtype)
    d = deltas * stds + means
    dx, dy, dw, dh = jnp.split(d, 4, axis=-1)
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)

    x1, y1, x2, y2 = jnp.split(rois, 4, axis=-1)
    px = (x1 + x2) * 0.5
    py = (y1 + y2) * 0.5
    pw = x2 - x1
    ph = y2 - y1

    gx = px + pw * dx
    gy = py + ph * dy
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    return jnp.concatenate(
        [gx - gw * 0.5, gy - gh * 0.5, gx + gw * 0.5, gy + gh * 0.5], axis=-1)


def bbox2delta(proposals: jnp.ndarray,
               gt: jnp.ndarray,
               means=DELTA_MEANS,
               stds=DELTA_STDS) -> jnp.ndarray:
    """Inverse of delta2bbox (reference bbox2delta, same file :119-160)."""
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0]
    ph = proposals[..., 3] - proposals[..., 1]
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0]
    gh = gt[..., 3] - gt[..., 1]
    deltas = jnp.stack([(gx - px) / pw, (gy - py) / ph,
                        jnp.log(gw / pw), jnp.log(gh / ph)], axis=-1)
    means = jnp.asarray(means, dtype=deltas.dtype)
    stds = jnp.asarray(stds, dtype=deltas.dtype)
    return (deltas - means) / stds


def giou(pred: jnp.ndarray, target: jnp.ndarray,
         eps: float = 1e-7) -> jnp.ndarray:
    """Aligned generalised IoU of (..., 4) xyxy boxes -> (...,).

    Matches mmdet `bbox_overlaps(mode='giou', is_aligned=True)`.
    """
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    overlap = wh[..., 0] * wh[..., 1]

    area_p = ((pred[..., 2] - pred[..., 0]) * (pred[..., 3] - pred[..., 1]))
    area_t = ((target[..., 2] - target[..., 0]) *
              (target[..., 3] - target[..., 1]))
    union = jnp.maximum(area_p + area_t - overlap, eps)
    ious = overlap / union

    enc_lt = jnp.minimum(pred[..., :2], target[..., :2])
    enc_rb = jnp.maximum(pred[..., 2:], target[..., 2:])
    enc_wh = jnp.clip(enc_rb - enc_lt, 0.0, None)
    enc_area = jnp.maximum(enc_wh[..., 0] * enc_wh[..., 1], eps)
    return ious - (enc_area - union) / enc_area


def yaw_pitch_to_vector(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) [yaw, pitch] -> (..., 3) unit gaze vector.

    Gaze360 convention (reference gaze_arccos_loss.py:69-76):
      vx =  cos(pitch) * sin(yaw)
      vy =  sin(pitch)
      vz = -cos(pitch) * cos(yaw)
    """
    yaw = x[..., 0]
    pitch = x[..., 1]
    return jnp.stack([
        jnp.cos(pitch) * jnp.sin(yaw),
        jnp.sin(pitch),
        -jnp.cos(pitch) * jnp.cos(yaw),
    ], axis=-1)


def vector_to_yaw_pitch(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) gaze vector -> (..., 2) [yaw, pitch] (normalises first)."""
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    yaw = jnp.arctan2(x[..., 0], -x[..., 2])
    pitch = jnp.arcsin(jnp.clip(x[..., 1], -1.0, 1.0))
    return jnp.stack([yaw, pitch], axis=-1)
