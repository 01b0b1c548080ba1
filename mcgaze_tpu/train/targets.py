"""Fixed query->GT assignment as mask arithmetic.

The reference assigns deterministically (no Hungarian):
query0<->face, query1<->eyes, query2<->head when a frame carries 3 GT boxes;
head-only frames make queries 0/1 background and query2<->head
(reference mmdet/core/bbox/assigners/gaze_fixed_assigner.py:121-151).

Here the dataset already emits GT in the fixed-slot layout
    gt_boxes (B, T, 3, 4) xyxy   — row q is query q's target (zeros if absent)
    gt_valid (B, T, 3)           — 1 where the slot has a GT
    gt_gazes (B, T, 3, 3)        — per-slot gaze target (head-only frames
                                   carry the head gaze in slot 2, matching
                                   gaze_head.py:320-323)
so "assignment" is the identity and every per-frame python loop of the
reference (multiclue_gaze_roi_head.py:237-257) disappears into weights.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class ClipTargets(NamedTuple):
    boxes: jnp.ndarray   # (N, Q, 4) xyxy
    valid: jnp.ndarray   # (N, Q) float 0/1
    gazes: jnp.ndarray   # (N, Q, 3)
    whwh: jnp.ndarray    # (N, 4)


def flatten_targets(gt_boxes, gt_valid, gt_gazes, img_whwh) -> ClipTargets:
    """(B, T, ...) -> (N=B*T, ...) flattened clip targets."""
    b, t = gt_valid.shape[:2]
    n = b * t
    return ClipTargets(
        boxes=gt_boxes.reshape(n, *gt_boxes.shape[2:]).astype(jnp.float32),
        valid=gt_valid.reshape(n, *gt_valid.shape[2:]).astype(jnp.float32),
        gazes=gt_gazes.reshape(n, *gt_gazes.shape[2:]).astype(jnp.float32),
        whwh=img_whwh.reshape(n, 4).astype(jnp.float32),
    )


def slot_layout_from_counts(boxes_list, gazes_list):
    """Host-side helper: per-frame variable GT lists -> fixed-slot arrays.

    boxes_list: list of (k, 4) arrays with k in {0, 1, 3}; k==3 means
    (face, eyes, head) in annotation order, k==1 means head-only.
    Returns (boxes (3,4), valid (3,), gazes (3,3)). numpy in / numpy out.
    """
    import numpy as np
    out_b = np.zeros((3, 4), np.float32)
    out_v = np.zeros((3,), np.float32)
    out_g = np.zeros((3, 3), np.float32)
    k = len(boxes_list)
    if k == 3:
        out_b[:] = np.asarray(boxes_list, np.float32)
        out_g[:] = np.asarray(gazes_list, np.float32)
        out_v[:] = 1.0
    elif k == 1:
        out_b[2] = np.asarray(boxes_list[0], np.float32)
        out_g[2] = np.asarray(gazes_list[0], np.float32)
        out_v[2] = 1.0
    elif k != 0:
        raise ValueError(f'frames must carry 0, 1 or 3 GT boxes, got {k}')
    return out_b, out_v, out_g
