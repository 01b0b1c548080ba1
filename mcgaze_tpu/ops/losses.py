"""Loss kernels (pure jnp — XLA fuses these into a handful of VPU loops).

Mask-based re-formulations of the reference losses so the whole loss stack
is static-shaped and jit-able (the reference gathers positive rows with
dynamic indexing; we multiply by weights instead — identical values):

  * sigmoid focal loss  -> mmdet/models/losses/focal_loss.py:13-59
  * L1 / GIoU           -> mmdet/models/losses/{smooth_l1_loss,iou_loss}.py
  * gaze arccos loss    -> mmdet/models/losses/gaze_arccos_loss.py:56-66
  * gaze temporal loss  -> mmdet/models/losses/gaze_temp_loss.py:57-66
  * gaze cos loss       -> mmdet/models/losses/gaze_cos_loss.py (1 - cos)
  * gaze pinball loss   -> mmdet/models/losses/gaze_pinball_loss.py
                           (quantile 0.1/0.9)

All reductions follow mmcv `weight_reduce_loss`: elementwise loss * weight,
summed, divided by `avg_factor` (= cross-replica mean of num_pos; under a
global jit over a data mesh the arrays are global so no explicit collective
is needed).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import giou


def sigmoid_focal_loss(logits: jnp.ndarray,
                       targets: jnp.ndarray,
                       weight: jnp.ndarray | None = None,
                       gamma: float = 2.0,
                       alpha: float = 0.25,
                       avg_factor: jnp.ndarray | float = 1.0) -> jnp.ndarray:
    """Binary sigmoid focal loss.

    logits/targets/weight: broadcastable arrays; targets in {0,1}
    (1 = the query's clue is present in the frame). Returns
    sum(loss*weight)/avg_factor, matching the reference where labels are
    remapped pos->class0 / neg->background (gaze_stqi_head.py:296-310).
    """
    p = jax.nn.sigmoid(logits)
    t = targets.astype(logits.dtype)
    pt = (1.0 - p) * t + p * (1.0 - t)
    focal_weight = (alpha * t + (1.0 - alpha) * (1.0 - t)) * pt ** gamma
    # Numerically-stable BCE with logits.
    bce = jnp.maximum(logits, 0) - logits * t + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    loss = bce * focal_weight
    if weight is not None:
        loss = loss * weight
    return jnp.sum(loss) / avg_factor


def l1_loss(pred: jnp.ndarray,
            target: jnp.ndarray,
            weight: jnp.ndarray | None = None,
            avg_factor: jnp.ndarray | float = 1.0) -> jnp.ndarray:
    loss = jnp.abs(pred - target)
    if weight is not None:
        loss = loss * weight
    return jnp.sum(loss) / avg_factor


def giou_loss(pred: jnp.ndarray,
              target: jnp.ndarray,
              weight: jnp.ndarray | None = None,
              avg_factor: jnp.ndarray | float = 1.0,
              eps: float = 1e-7) -> jnp.ndarray:
    """pred/target (..., 4) xyxy; weight (...,) per-box."""
    loss = 1.0 - giou(pred, target, eps=eps)
    if weight is not None:
        loss = loss * weight
    return jnp.sum(loss) / avg_factor


def arccos_gaze_loss(pred: jnp.ndarray,
                     target: jnp.ndarray,
                     weight: jnp.ndarray,
                     eps: float = 1e-6) -> jnp.ndarray:
    """Mean angular error over positive rows.

    pred/target: (N, 3); weight: (N,) 0/1 positivity mask. The reference
    gathers positives then takes acos(hardtanh(cos_sim)).mean(); with masks
    that is sum(angle*w)/sum(w). A fully-masked batch yields 0.
    """
    denom = (jnp.linalg.norm(pred, axis=-1) *
             jnp.linalg.norm(target, axis=-1))
    sim = jnp.sum(pred * target, axis=-1) / jnp.maximum(denom, eps)
    sim = jnp.clip(sim, -1.0 + eps, 1.0 - eps)
    angle = jnp.arccos(sim)
    num_pos = jnp.sum(weight)
    return jnp.sum(angle * weight) / jnp.maximum(num_pos, 1.0)


def cos_gaze_loss(pred: jnp.ndarray,
                  target: jnp.ndarray,
                  weight: jnp.ndarray) -> jnp.ndarray:
    """Mean (1 - cos) over positive rows (reference GazeCosLoss.forward:
    cos = sum(pred*target) clamped to [-1, 1], loss = mean(1 - cos) over
    the gathered positive rows; pred/target arrive unit-normalised from
    GazeHead, so no norm division).

    pred/target: (N, 3); weight: (N,) 0/1 positivity mask.
    """
    cos = jnp.clip(jnp.sum(pred * target, axis=-1), -1.0, 1.0)
    num_pos = jnp.sum(weight)
    return jnp.sum((1.0 - cos) * weight) / jnp.maximum(num_pos, 1.0)


def pinball_gaze_loss(pred: jnp.ndarray,
                      target: jnp.ndarray,
                      weight: jnp.ndarray,
                      var: jnp.ndarray | float = 0.0,
                      q: float = 0.1) -> jnp.ndarray:
    """Quantile (pinball) loss at q/1-q (reference GazePinballLoss.forward:
    q_10 = target - (pred - var), q_90 = target - (pred + var),
    loss = mean(max(q*q_10, (q-1)*q_10)) + mean(max((1-q)*q_90, -q*q_90)),
    each mean over every element of the gathered positive rows).

    `var` is the model's per-component uncertainty; MCGaze's GazeHead
    predicts none (the reference registers this loss but its shipped heads
    never feed the `var` argument), so selecting it through a config uses
    var=0 — then the two quantile terms collapse to a plain L1 mean.

    pred/target: (N, D); weight: (N,) 0/1 positivity mask.
    """
    d = pred.shape[-1]
    q_lo = target - (pred - var)
    q_hi = target - (pred + var)
    lo = jnp.maximum(q * q_lo, (q - 1.0) * q_lo)
    hi = jnp.maximum((1.0 - q) * q_hi, -q * q_hi)
    denom = jnp.maximum(jnp.sum(weight), 1.0) * d
    return (jnp.sum(lo * weight[:, None]) +
            jnp.sum(hi * weight[:, None])) / denom


# Config-selectable per-clue gaze losses (reference losses/__init__.py:21-24
# registers all three; the shipped configs pick GazeArccosLoss). Each maps
# (pred (N,3), target (N,3), weight (N,)) -> scalar.
GAZE_LOSSES = {
    'arccos': arccos_gaze_loss,
    'cos': cos_gaze_loss,
    'pinball': pinball_gaze_loss,
}


def temporal_gaze_loss(pred: jnp.ndarray) -> jnp.ndarray:
    """Second-order temporal smoothness over a clip.

    pred: (B, T, D). loss_t = |2p_t - p_{t-1} - p_{t+1}|_1 with one-sided
    |2p_0 - 2p_1| / |2p_T - 2p_{T-1}| at the ends; mean over (B, T).
    """
    first = jnp.sum(jnp.abs(2 * pred[:, 0] - 2 * pred[:, 1]), axis=-1)
    last = jnp.sum(jnp.abs(2 * pred[:, -1] - 2 * pred[:, -2]), axis=-1)
    mid = jnp.sum(
        jnp.abs(2 * pred[:, 1:-1] - pred[:, 2:] - pred[:, :-2]), axis=-1)
    total = jnp.concatenate([first[:, None], mid, last[:, None]], axis=1)
    return jnp.mean(total)
