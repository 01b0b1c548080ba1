"""Deep-supervision loss for the TeViT / InstBlink query detectors.

Per stage (instblink_roi_head.py:229-281 + dii_head.py head_loss
semantics + blink_head.py:119-134):

  match  = clip-level Hungarian per clip (train/hungarian.py)
  loss_cls   = focal(cls_logits, matched labels) * 2.0 / num_pos
               (ALL queries contribute — background queries push their
               logits down; avg_factor = reduce_mean(num_pos))
  loss_bbox  = L1(boxes/whwh, gt/whwh)[pos] * 5.0 / num_pos
  loss_iou   = (1 - GIoU)[pos] * 2.0 / num_pos
  loss_blink = focal(blink_logits[pos], blink_target) * 5.0 / num_pos
               (the reference's `1 - targets` at blink_head.py:127 is
               mmcv label ENCODING — label 0 is the positive class — so
               sigmoid(logit) = P(blink) there and here;
               avg_factor = positive count, blink_head.py:121-122)

`num_pos` is the global positive count across the whole (sharded) batch,
which is exactly what the reference's reduce_mean + DDP averaging
computes. The Hungarian match runs on stop_gradient'ed predictions, as
the reference assigns on detached tensors (instblink_roi_head.py:139-145).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.query_detector import QueryDetectorConfig
from ..ops import losses as L
from .hungarian import clip_targets_from_match, match_clip


def _one_hot_labels(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """(...,) int labels (num_classes = background) -> (..., C) 0/1."""
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


def stage_losses(cfg: QueryDetectorConfig, stage_out: dict, batch: dict,
                 clip_length: int) -> dict:
    """Losses for one refinement stage.

    stage_out: cls_logits (B*T, Q, C), boxes (B*T, Q, 4),
               blink_logits (B*T, Q) when cfg.with_blink.
    batch: gt_boxes (B, M, T, 4) absolute xyxy; gt_labels (B, M);
           gt_present (B, M, T) bool; inst_valid (B, M) bool;
           gt_blinks (B, M, T) f32 (optional); whwh (B*T, 4).
    """
    t = clip_length
    n_total, q, c = stage_out['cls_logits'].shape
    b = n_total // t
    cls_logits = stage_out['cls_logits'].reshape(b, t, q, c)
    boxes = stage_out['boxes'].reshape(b, t, q, 4)
    whwh = batch['whwh'].reshape(b, t, 4)

    gt_blinks = batch.get('gt_blinks')          # (B, M, T) or None

    def per_clip_full(ci):
        m = match_clip(jax.lax.stop_gradient(cls_logits[ci]),
                       jax.lax.stop_gradient(boxes[ci]), whwh[ci, 0],
                       batch['gt_boxes'][ci], batch['gt_labels'][ci],
                       batch['gt_present'][ci], batch['inst_valid'][ci],
                       cfg.match_cls_weight, cfg.match_l1_weight,
                       cfg.match_iou_weight)
        return clip_targets_from_match(
            m, batch['gt_boxes'][ci], batch['gt_labels'][ci],
            batch['gt_present'][ci], batch['inst_valid'][ci],
            None if gt_blinks is None else gt_blinks[ci],
            num_queries=q, num_classes=cfg.num_classes)

    tg = jax.vmap(per_clip_full)(jnp.arange(b))
    labels = tg['labels'].reshape(b * t, q)              # (N, Q)
    bbox_targets = tg['bbox_targets'].reshape(b * t, q, 4)
    pos = tg['pos_mask'].reshape(b * t, q)               # (N, Q) f32
    num_pos = jnp.maximum(pos.sum(), 1.0)

    out = {}
    # focal cls over every (query, class); one-hot target of the matched
    # label, all-zero rows for background
    onehot = _one_hot_labels(labels, cfg.num_classes)    # (N, Q, C)
    out['loss_cls'] = cfg.loss_cls_weight * L.sigmoid_focal_loss(
        stage_out['cls_logits'].reshape(-1),
        onehot.reshape(-1), gamma=cfg.focal_gamma, alpha=cfg.focal_alpha,
        avg_factor=num_pos)
    whwh_n = batch['whwh'][:, None, :]                   # (N, 1, 4)
    out['loss_bbox'] = cfg.loss_bbox_weight * L.l1_loss(
        stage_out['boxes'] / whwh_n, bbox_targets / whwh_n,
        weight=pos[..., None], avg_factor=num_pos)
    out['loss_iou'] = cfg.loss_iou_weight * L.giou_loss(
        stage_out['boxes'].reshape(-1, 4), bbox_targets.reshape(-1, 4),
        weight=pos.reshape(-1), avg_factor=num_pos)
    if cfg.with_blink and 'blink_logits' in stage_out:
        blink_t = tg['blink_targets'].reshape(b * t, q)
        # The reference's `blink_targets = 1 - blink_targets`
        # (blink_head.py:127) is mmcv LABEL ENCODING, not a semantic
        # flip: mmcv's sigmoid focal one-hots integer labels where label
        # 0 IS the single positive class and label 1 (== num_classes) is
        # background, so blink=1 -> label 0 -> positive and
        # sigmoid(logit) is still P(blink). Our focal takes {0,1}
        # probability targets directly (1 = positive), so blink_t passes
        # through UNinverted — passing 1-blink_t trained the head to
        # score non-blink frames high (caught by the on-chip burn-in:
        # per-frame scores exactly complementary to GT, blink AP 0).
        # Only positive samples enter (the reference gathers pos_inds
        # before the head, instblink_roi_head.py:162-165).
        out['loss_blink'] = cfg.loss_blink_weight * L.sigmoid_focal_loss(
            stage_out['blink_logits'].reshape(-1),
            blink_t.reshape(-1), weight=pos.reshape(-1),
            gamma=cfg.focal_gamma, alpha=cfg.focal_alpha,
            avg_factor=num_pos)
    out['num_pos'] = num_pos
    return out


def total_loss(cfg: QueryDetectorConfig, model_out: dict, batch: dict,
               clip_length: int):
    """Sum over stages (stage weights are all 1.0 in the reference,
    instblink_roi_head.py:16). Returns (scalar, logs)."""
    logs = {}
    total = jnp.float32(0.0)
    for i, stage_out in enumerate(model_out['stages']):
        for name, val in stage_losses(cfg, stage_out, batch,
                                      clip_length).items():
            logs[f'stage{i}_{name}'] = val
            if name != 'num_pos':
                total = total + val
    logs['loss'] = total
    return total, logs
