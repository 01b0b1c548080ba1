"""Clip-level Hungarian matching for the query video detectors
(TeViT / InstBlink families).

Reference semantics (the MCGaze fork gutted its own assigners, so the
behaviour spec is the commented-out original that still ships inside
/root/reference/mmdet/core/bbox/assigners/inference_hungarian_assigner.py
:127-183 plus the call site tevit_roi_head.py:149-167 /
instblink_roi_head.py:241-259):

  * one assignment per CLIP, not per frame: per-frame DETR costs
    (cls + L1 + GIoU) are aligned to instance TRACKS via gt_ids, frames
    where a track is absent contribute zero cost, and the per-track cost
    is averaged over its present frames before one Hungarian solve;
  * the solve maps each instance track to a distinct query; every other
    query is background in every frame; a matched query is foreground
    only in the frames where its track is present (per-frame
    AssignResult, stqi_head.py:251-258).

TPU-first design: the reference computes costs on device, ships them to
CPU and calls scipy per clip inside the train step
(inference_hungarian_assigner.py:185-192 `cost.detach().cpu()`).  Here
both the costs AND the assignment solve run inside the jitted train
step: `hungarian` is a pure-JAX Jonker-Volgenant shortest-augmenting-
path solver (lax loops, static shapes) vmapped over the batch, so
matching never leaves the chip and never breaks the single compiled
program.  Instance slots are static (`max_instances`), absent slots are
masked — the same slot discipline as train/targets.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import bbox_xyxy_to_cxcywh, giou

INF = jnp.float32(1e9)
# Cost assigned to padded (invalid) instance columns. Uniform across
# queries, so it shifts every candidate assignment of a padded column by
# the same constant and cannot change the optimal rows for real columns.
PAD_COST = jnp.float32(1e4)


def hungarian(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve min-cost assignment for `cost` (M, N) with M <= N.

    Returns (M,) int32: for each row (instance track) the assigned
    column (query). Jonker-Volgenant shortest augmenting path with
    potentials — the same algorithm family as
    scipy.optimize.linear_sum_assignment, expressed with lax loops so it
    jits and vmaps (cross-checked against scipy in
    tests/test_hungarian.py).
    """
    m, n = cost.shape
    assert m <= n, f'need rows <= cols, got {cost.shape}'
    c = cost.astype(jnp.float32)

    # 1-indexed working arrays; index 0 is the virtual root column.
    u = jnp.zeros((m + 1,), jnp.float32)           # row potentials
    v = jnp.zeros((n + 1,), jnp.float32)           # column potentials
    p = jnp.zeros((n + 1,), jnp.int32)             # p[j] = row matched to col j (0 = free)

    def assign_row(i, uvp):
        u, v, p = uvp
        p = p.at[0].set(i)
        minv = jnp.full((n + 1,), INF)
        used = jnp.zeros((n + 1,), bool)
        way = jnp.zeros((n + 1,), jnp.int32)

        def cond(state):
            _u, _v, p, _minv, _used, _way, j0 = state
            return p[j0] != 0

        def body(state):
            u, v, p, minv, used, way, j0 = state
            used = used.at[j0].set(True)
            i0 = p[j0]
            cols = jnp.arange(n + 1)
            cur = jnp.where(cols >= 1, c[i0 - 1, jnp.maximum(cols - 1, 0)]
                            - u[i0] - v[cols], INF)
            better = (~used) & (cur < minv)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            scan = jnp.where(used, INF, minv)
            j1 = jnp.argmin(scan).astype(jnp.int32)
            delta = scan[j1]
            # u[p[j]] += delta for used j ; v[j] -= delta for used j ;
            # minv[j] -= delta for unused j
            u = u.at[jnp.where(used, p, m + 1)].add(
                delta, mode='drop')
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used, minv, minv - delta)
            return u, v, p, minv, used, way, j1

        state = (u, v, p, minv, used, way, jnp.int32(0))
        u, v, p, minv, used, way, j0 = jax.lax.while_loop(cond, body, state)

        # augment along the alternating path recorded in `way`
        def aug_cond(state):
            _p, j0 = state
            return j0 != 0

        def aug_body(state):
            p, j0 = state
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return p, j1

        p, _ = jax.lax.while_loop(aug_cond, aug_body, (p, j0))
        return u, v, p

    u, v, p = jax.lax.fori_loop(1, m + 1, assign_row, (u, v, p))
    # invert: row i -> column j with p[j] == i
    rows = p[1:]                                   # (N,) row matched to each col
    col_of_row = jnp.zeros((m + 1,), jnp.int32)
    col_of_row = col_of_row.at[rows].set(jnp.arange(1, n + 1, dtype=jnp.int32),
                                         mode='drop')
    return col_of_row[1:] - 1                      # (M,) 0-based column


def focal_cls_cost(cls_logits: jnp.ndarray, gt_labels: jnp.ndarray,
                   alpha: float = 0.25, gamma: float = 2.0,
                   eps: float = 1e-12) -> jnp.ndarray:
    """mmdet FocalLossCost: (N, C) logits x (M,) labels -> (N, M)."""
    p = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    neg = -jnp.log1p(-p + eps) * (1 - alpha) * jnp.power(p, gamma)
    pos = -jnp.log(p + eps) * alpha * jnp.power(1 - p, gamma)
    return (pos - neg)[:, gt_labels]


def l1_bbox_cost(pred_cxcywh: jnp.ndarray, gt_cxcywh: jnp.ndarray
                 ) -> jnp.ndarray:
    """mmdet BBoxL1Cost: normalised cxcywh cdist-L1. (N,4)x(M,4)->(N,M)."""
    return jnp.sum(jnp.abs(pred_cxcywh[:, None] - gt_cxcywh[None]), -1)


def giou_cost(pred_xyxy: jnp.ndarray, gt_xyxy: jnp.ndarray) -> jnp.ndarray:
    """mmdet IoUCost(giou): -GIoU. (N,4)x(M,4)->(N,M)."""
    n, m = pred_xyxy.shape[0], gt_xyxy.shape[0]
    pp = jnp.repeat(pred_xyxy, m, axis=0)
    gg = jnp.tile(gt_xyxy, (n, 1))
    return -giou(pp, gg).reshape(n, m)


def clip_cost_matrix(cls_logits: jnp.ndarray,
                     boxes: jnp.ndarray,
                     whwh: jnp.ndarray,
                     gt_boxes: jnp.ndarray,
                     gt_labels: jnp.ndarray,
                     gt_present: jnp.ndarray,
                     inst_valid: jnp.ndarray,
                     cls_weight: float = 2.0,
                     l1_weight: float = 5.0,
                     iou_weight: float = 2.0) -> jnp.ndarray:
    """Per-clip track-level cost (M, N) for one clip.

    cls_logits (T, N, C); boxes (T, N, 4) absolute xyxy; whwh (4,);
    gt_boxes (M, T, 4) absolute xyxy; gt_labels (M,); gt_present (M, T)
    bool; inst_valid (M,) bool padded-slot mask.

    Per-frame DETR costs, masked by per-frame presence and averaged over
    present frames (the reference's `sum(costs_) / sum(weights)`,
    inference_hungarian_assigner.py:178-183). Invalid slots get the
    uniform PAD_COST column.
    """
    t, n, _ = cls_logits.shape
    m = gt_boxes.shape[0]
    whwh = whwh.astype(jnp.float32)

    def frame_cost(f):
        pred_n = boxes[f].astype(jnp.float32) / whwh
        gt_n = gt_boxes[:, f].astype(jnp.float32) / whwh
        c = (cls_weight * focal_cls_cost(cls_logits[f], gt_labels)
             + l1_weight * l1_bbox_cost(bbox_xyxy_to_cxcywh(pred_n),
                                        bbox_xyxy_to_cxcywh(gt_n))
             + iou_weight * giou_cost(boxes[f].astype(jnp.float32),
                                      gt_boxes[:, f].astype(jnp.float32)))
        return c * gt_present[:, f][None].astype(jnp.float32)   # (N, M)

    costs = jax.vmap(frame_cost)(jnp.arange(t))                 # (T, N, M)
    present = jnp.maximum(gt_present.sum(-1).astype(jnp.float32), 1.0)
    cost = costs.sum(0) / present[None]                         # (N, M)
    cost = jnp.where(inst_valid[None], cost, PAD_COST)
    return cost.T                                               # (M, N)


def match_clip(cls_logits, boxes, whwh, gt_boxes, gt_labels, gt_present,
               inst_valid, cls_weight: float = 2.0, l1_weight: float = 5.0,
               iou_weight: float = 2.0) -> jnp.ndarray:
    """One clip -> (M,) query index per instance slot (valid slots get a
    distinct query; padded slots get an arbitrary distinct query whose
    targets are masked out downstream)."""
    cost = clip_cost_matrix(cls_logits, boxes, whwh, gt_boxes, gt_labels,
                            gt_present, inst_valid, cls_weight, l1_weight,
                            iou_weight)
    return hungarian(cost)


def clip_targets_from_match(match: jnp.ndarray,
                            gt_boxes: jnp.ndarray,
                            gt_labels: jnp.ndarray,
                            gt_present: jnp.ndarray,
                            inst_valid: jnp.ndarray,
                            gt_blinks: jnp.ndarray | None,
                            num_queries: int,
                            num_classes: int):
    """Scatter a clip match into dense per-frame query targets.

    match (M,); gt_boxes (M, T, 4); gt_labels (M,); gt_present (M, T);
    inst_valid (M,); gt_blinks (M, T) or None.

    Returns dict with per-frame query-aligned arrays:
      labels (T, N) int32   — matched class, or num_classes (background)
      bbox_targets (T, N, 4)
      pos_mask (T, N) f32   — 1 where a present, valid instance matched
      blink_targets (T, N) f32 (if gt_blinks given)
    A query matched to a track is background in frames where the track
    is absent (reference stqi_head.py get_targets: per-frame labels with
    none-object where occluded).
    """
    m, t = gt_present.shape
    n = num_queries
    valid = inst_valid.astype(bool)
    # per-frame positive (inst, frame) pairs scattered to query slots
    q = jnp.where(valid, match, n)                 # invalid -> drop slot n
    labels = jnp.full((t, n + 1), num_classes, jnp.int32)
    labels = labels.at[:, q].set(
        jnp.where((gt_present.T & valid[None]),
                  jnp.broadcast_to(gt_labels[None], (t, m)),
                  num_classes).astype(jnp.int32))
    bbox_targets = jnp.zeros((t, n + 1, 4), jnp.float32)
    bbox_targets = bbox_targets.at[:, q].set(
        jnp.where((gt_present.T & valid[None])[..., None],
                  gt_boxes.transpose(1, 0, 2), 0.0))
    pos = jnp.zeros((t, n + 1), jnp.float32)
    pos = pos.at[:, q].set((gt_present.T & valid[None]).astype(jnp.float32))
    out = dict(labels=labels[:, :n], bbox_targets=bbox_targets[:, :n],
               pos_mask=pos[:, :n])
    if gt_blinks is not None:
        blink = jnp.zeros((t, n + 1), jnp.float32)
        blink = blink.at[:, q].set(
            jnp.where(gt_present.T & valid[None],
                      gt_blinks.T.astype(jnp.float32), 0.0))
        out['blink_targets'] = blink[:, :n]
    return out
