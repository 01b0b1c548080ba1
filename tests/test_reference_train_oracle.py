"""Training-loss parity against the REFERENCE'S OWN train path.

Executes the reference's full `MultiClueGaze.forward_train` — the real
FixedAssigner (gaze_fixed_assigner.py:121-151), PseudoSampler,
GazeSTQIHead.get_targets/loss/head_loss (gaze_stqi_head.py:207-489),
GazeHead.get_targets/loss (gaze_head.py:205-328), FocalLoss (CPU
py_sigmoid path), L1Loss, GIoULoss, GazeArccosLoss and GazeTempLoss —
on a fabricated mixed 1-GT/3-GT clip with the shared composed
checkpoint, and requires this repo's mask-arithmetic criterion
(train/criterion.py + train/targets.py) to reproduce every per-stage
loss key and the summed total.

This upgrades the train-side story from builder-written formula goldens
(tests/test_losses.py) to the reference's executed code: a shared
misreading of the loss/target semantics can no longer pass.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mcgaze_tpu.models.mcgaze import ModelConfig
from mcgaze_tpu.train.criterion import total_loss
from mcgaze_tpu.train.targets import flatten_targets, slot_layout_from_counts
from tests.reference_shim import build_reference_gaze_model
from tests.test_full_model_parity import (full_parity_fixture,  # noqa: F401
                                          scaled_reference_state_dict)

T, Q, IMG = 7, 3, 64
# frames 1 and 4 carry only the head box (the dataset's 1-GT convention,
# gaze_fixed_assigner.py:130-136); the rest carry (face, eyes, head)
HEAD_ONLY = {1, 4}


def _fabricate_batch(rng):
    """Per-frame GT lists (reference layout) + slot arrays (our layout)."""
    gt_bboxes, gt_labels, gt_gazes, gt_ids = [], [], [], []
    slot_b, slot_v, slot_g = [], [], []
    for t in range(T):
        k = 1 if t in HEAD_ONLY else 3
        boxes = []
        for _ in range(k):
            x1, y1 = rng.rand(2) * 30
            w, h = 8 + rng.rand(2) * 20
            boxes.append([x1, y1, x1 + w, y1 + h])
        gazes = rng.randn(k, 3).astype(np.float32)
        gazes /= np.linalg.norm(gazes, axis=-1, keepdims=True)
        gt_bboxes.append(torch.tensor(boxes, dtype=torch.float32))
        gt_labels.append(torch.tensor([2] if k == 1 else [0, 1, 2]))
        gt_gazes.append(torch.from_numpy(gazes))
        gt_ids.append(torch.tensor([2] if k == 1 else [0, 1, 2]))
        b, v, g = slot_layout_from_counts(boxes, list(gazes))
        slot_b.append(b)
        slot_v.append(v)
        slot_g.append(g)
    slots = (np.stack(slot_b)[None], np.stack(slot_v)[None],
             np.stack(slot_g)[None])           # (B=1, T, ...)
    return gt_bboxes, gt_labels, gt_gazes, gt_ids, slots


def test_train_losses_match_reference_code(full_parity_fixture, monkeypatch):
    # GazeTempLoss hard-codes .cuda() (gaze_temp_loss.py:59); run the
    # reference's code on this CPU-only host by making .cuda a no-op.
    monkeypatch.setattr(torch.Tensor, 'cuda',
                        lambda self, *a, **k: self, raising=True)

    model = build_reference_gaze_model(train=True)
    sd = scaled_reference_state_dict(np.random.RandomState(42))
    res = model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False)
    assert res.unexpected_keys == []

    rng = np.random.RandomState(21)
    imgs = rng.randn(T, IMG, IMG, 3).astype(np.float32)
    gt_bboxes, gt_labels, gt_gazes, gt_ids, slots = _fabricate_batch(rng)

    metas = [dict(img_shape=(IMG, IMG, 3), ori_shape=(IMG, IMG, 3),
                  scale_factor=np.ones(4, np.float32))
             for _ in range(T)]
    with torch.no_grad():
        timg = torch.from_numpy(
            imgs.transpose(0, 3, 1, 2))[None]          # (B=1,T,C,H,W)
        ref_losses = model.forward_train(
            timg, [metas], [gt_bboxes], [gt_labels], gt_gazes=[gt_gazes],
            gt_ids=[gt_ids])
    ref_losses = {k: float(v) for k, v in ref_losses.items()
                  if 'loss' in k or 'gaze' in k}
    ref_losses = {k: v for k, v in ref_losses.items() if 'pos_acc' not in k}

    # ---- ours: same batch through MCGazeModel + the masked criterion ----
    _, our_model, variables = full_parity_fixture
    cfg = ModelConfig()
    whwh = np.full((T, 4), float(IMG), np.float32)
    out = jax.jit(
        lambda v, i, w: our_model.apply(v, i, w, clip_length=T))(
            variables, jnp.asarray(imgs), jnp.asarray(whwh))
    tg = flatten_targets(jnp.asarray(slots[0]), jnp.asarray(slots[1]),
                         jnp.asarray(slots[2]),
                         jnp.broadcast_to(jnp.asarray(whwh)[None], (1, T, 4)))
    total, logs = total_loss(cfg, out, tg, clip_length=T)

    key_map = {}
    for s in range(4):
        for clue in ('face', 'eyes', 'head'):
            for part in ('loss_cls', 'loss_bbox', 'loss_iou'):
                key_map[f'stage{s}_{clue}_{part}'] = \
                    f'stage{s}_{clue}_{part}'
            key_map[f'stage{s}_{clue}_gaze_loss_gaze'] = \
                f'stage{s}_{clue}_gaze_loss'
        key_map[f'stage{s}_final_gaze_loss_gaze'] = \
            f'stage{s}_final_gaze_loss'
        key_map[f'stage{s}_final_gaze_loss_temp'] = \
            f'stage{s}_final_gaze_temp'

    assert set(ref_losses) == set(key_map), (
        sorted(set(ref_losses) ^ set(key_map)))
    for ref_key, our_key in key_map.items():
        np.testing.assert_allclose(
            float(logs[our_key]), ref_losses[ref_key], rtol=2e-3,
            atol=2e-4, err_msg=f'{ref_key} vs {our_key}')
    np.testing.assert_allclose(float(total), sum(ref_losses.values()),
                               rtol=2e-3)
