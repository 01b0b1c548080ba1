"""Deep-supervision loss over the 4 refinement stages.

Assembles the per-stage, per-clue losses of the reference ROI head
(multiclue_gaze_roi_head.py:259-282 + gaze_stqi_head.py:280-334 +
gaze_head.py:205-248) as fully-masked static-shape arithmetic:

  per stage s, per clue q in (face, eyes, head):
    loss_cls  = focal(logits_q, valid_q) * 2.0            / num_pos_q
    loss_bbox = L1(box_q/whwh, gt_q/whwh)[pos] * 5.0      / num_pos_q
    loss_iou  = (1 - GIoU(box_q, gt_q))[pos]   * 2.0      / num_pos_q
    {face,eyes,head}_gaze = arccos(pred_q, gaze_q)[pos]   * 6.0 (mean)
    final_gaze = arccos(fusion, gaze_head)[pos_head] * 6.0
               + temporal(fusion over clip) * 1.0

`num_pos` is the global positive count (the reference's
reduce_mean(num_pos) + DDP gradient averaging collapses to exactly this
under a single global jit over the data mesh).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..models.mcgaze import ModelConfig
from ..ops import losses as L
from .targets import ClipTargets

CLUES = ('face', 'eyes', 'head')


def stage_losses(cfg: ModelConfig, stage_out: dict, tg: ClipTargets,
                 clip_length: int) -> dict:
    """Losses for one refinement stage. Returns dict of scalar jnp values."""
    out = {}
    n, q = tg.valid.shape
    logits = stage_out['cls_logits'][..., 0]          # (N, Q)
    boxes = stage_out['boxes']                        # (N, Q, 4)

    for qi, clue in enumerate(CLUES[:q]):
        valid = tg.valid[:, qi]                       # (N,)
        num_pos = jnp.maximum(jnp.sum(valid), 1.0)
        out[f'{clue}_loss_cls'] = cfg.loss_cls_weight * L.sigmoid_focal_loss(
            logits[:, qi], valid, gamma=cfg.focal_gamma,
            alpha=cfg.focal_alpha, avg_factor=num_pos)
        whwh = tg.whwh                                # (N, 4)
        out[f'{clue}_loss_bbox'] = cfg.loss_bbox_weight * L.l1_loss(
            boxes[:, qi] / whwh, tg.boxes[:, qi] / whwh,
            weight=valid[:, None], avg_factor=num_pos)
        out[f'{clue}_loss_iou'] = cfg.loss_iou_weight * L.giou_loss(
            boxes[:, qi], tg.boxes[:, qi], weight=valid,
            avg_factor=num_pos)

    gaze = stage_out['gaze']
    gaze_loss = L.GAZE_LOSSES[cfg.gaze_loss_type]
    for qi, clue in enumerate(CLUES):
        out[f'{clue}_gaze_loss'] = cfg.loss_gaze_weight * gaze_loss(
            gaze[clue], tg.gazes[:, qi], tg.valid[:, qi])
    # fusion trained against the head-slot gaze (gaze_head.py:215).
    out['final_gaze_loss'] = cfg.loss_gaze_weight * gaze_loss(
        gaze['fusion'], tg.gazes[:, 2], tg.valid[:, 2])
    out['final_gaze_temp'] = cfg.loss_temp_weight * L.temporal_gaze_loss(
        gaze['fusion'].reshape(-1, clip_length, 3))
    return out


def total_loss(cfg: ModelConfig, model_out: dict, tg: ClipTargets,
               clip_length: int):
    """Sum of stage losses weighted by stage_loss_weights.

    Returns (scalar, logs dict with per-stage keys 'stage{i}_{name}').
    """
    logs = {}
    total = jnp.float32(0.0)
    for i, stage_out in enumerate(model_out['stages']):
        w = cfg.stage_loss_weights[i]
        for name, val in stage_losses(cfg, stage_out, tg,
                                      clip_length).items():
            val = val * w
            logs[f'stage{i}_{name}'] = val
            total = total + val
    logs['loss'] = total
    return total, logs
