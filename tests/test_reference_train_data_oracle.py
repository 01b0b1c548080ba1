"""The composed TRAIN two-stack: the reference's executed
dataset -> aug pipeline -> collate layout -> forward_train losses vs
this repo's dataset -> train criterion, on the SAME clip of the same
fabricated tree with the same converted checkpoint and matched random
draws.

Round 4 proved the loss math on hand-built identical batches
(test_reference_train_oracle.py) and round 5 proved the data pipelines
produce identical batches (test_reference_data_oracle.py); this chains
them: the batches here come from the two REAL data paths, so a
train-side divergence anywhere (aug arithmetic, GT layout, loss
semantics, checkpoint mapping) fails one assertion.

Canvas contract: the reference pads each frame to /32 of its resized
shape (all frames of a clip share the crop ratio, so one shape); our
DataConfig.canvas is pinned to it — the FrozenBN boundary finding from
test_reference_driver_oracle.py applies to training identically.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mcgaze_tpu.data.dataset import DataConfig, Gaze360ClipDataset
from mcgaze_tpu.models.mcgaze import ModelConfig
from mcgaze_tpu.train.criterion import total_loss
from mcgaze_tpu.train.targets import flatten_targets
from tests.reference_shim import build_reference_gaze_model
from tests.test_data_and_driver import make_dataset
from tests.test_full_model_parity import (full_parity_fixture,  # noqa: F401
                                          scaled_reference_state_dict)
from tests.test_reference_data_oracle import (ScriptedRng,
                                              _build_reference_dataset)

pytestmark = pytest.mark.filterwarnings('ignore::UserWarning')

T = 7
RATIO_DRAW = 0.5          # crop ratio 0.68 + 0.5*0.32 = 0.84
# 48x64 source -> crop 0.84 = 40x54 -> resize fit 224 = 166x224
# -> reference Pad/32 = 192x224
CANVAS = (192, 224)


@pytest.mark.parametrize('idx,flip', [
    (5, False),    # mid-video, 3-GT frames only in the window
    (2, True),     # window crosses the head-only frame 3, flipped
])
def test_composed_train_two_stack(full_parity_fixture, tmp_path,  # noqa: F811
                                  monkeypatch, idx, flip):
    # GazeTempLoss hard-codes .cuda() (gaze_temp_loss.py:59)
    monkeypatch.setattr(torch.Tensor, 'cuda',
                        lambda self, *a, **k: self, raising=True)

    root = str(tmp_path)
    ann, prefix = make_dataset(root, num_videos=2, length=12,
                               head_only_frames=(3,))

    # ---- reference stack: executed dataset + pipeline -> forward_train
    ref_ds = _build_reference_dataset(ann, prefix)
    rng = ScriptedRng([RATIO_DRAW])
    monkeypatch.setattr(np.random, 'rand', rng.rand)
    monkeypatch.setattr(
        np.random, 'choice',
        lambda options, p=None: 'horizontal' if flip else None)
    data = ref_ds.prepare_train_clip(idx)
    assert rng.calls == 1

    model = build_reference_gaze_model(train=True)
    sd = scaled_reference_state_dict(np.random.RandomState(42))
    res = model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False)
    assert res.unexpected_keys == []

    imgs_t = data['img'].data                       # (T, 3, Hp, Wp)
    assert tuple(imgs_t.shape[-2:]) == CANVAS
    metas = [m for m in data['img_metas'].data]
    gt_bboxes = [b.float() for b in data['gt_bboxes'].data]
    gt_labels = [l.long() for l in data['gt_labels'].data]
    gt_gazes = [g.float() for g in data['gt_gazes'].data]
    gt_ids = [i for i in data['gt_ids'].data]
    with torch.no_grad():
        ref_losses = model.forward_train(
            imgs_t[None], [metas], [gt_bboxes], [gt_labels],
            gt_gazes=[gt_gazes], gt_ids=[gt_ids])
    ref_losses = {k: float(v) for k, v in ref_losses.items()
                  if ('loss' in k or 'gaze' in k) and 'pos_acc' not in k}

    # ---- our stack: our dataset (same draws) -> model + criterion ----
    _, our_model, variables = full_parity_fixture
    dcfg = DataConfig(ann_file=ann, img_prefix=prefix, clip_length=T,
                      scale=(224, 224), canvas=CANVAS, crop_size=0.68,
                      flip_ratio=0.5, ship_uint8=False)
    ds = Gaze360ClipDataset(dcfg, use_native=None)
    ds.rng = ScriptedRng([RATIO_DRAW, 0.2 if flip else 0.9])
    clip = ds.get_clip(idx)
    assert clip is not None

    # the two data paths fed the models the same pixels
    for fi in range(T):
        h, w = int(clip['img_whwh'][fi, 1]), int(clip['img_whwh'][fi, 0])
        np.testing.assert_allclose(
            clip['imgs'][fi, :h, :w],
            imgs_t[fi].permute(1, 2, 0).numpy()[:h, :w], atol=2e-4)

    cfg = ModelConfig()
    out = jax.jit(
        lambda v, i, w: our_model.apply(v, i, w, clip_length=T))(
            variables, jnp.asarray(clip['imgs']),
            jnp.asarray(clip['img_whwh']))
    tg = flatten_targets(jnp.asarray(clip['gt_boxes'])[None],
                         jnp.asarray(clip['gt_valid'])[None],
                         jnp.asarray(clip['gt_gazes'])[None],
                         jnp.asarray(clip['img_whwh'])[None])
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
            float(logs[our_key]), ref_losses[ref_key], rtol=5e-3,
            atol=5e-4, err_msg=f'{ref_key} vs {our_key}')
    np.testing.assert_allclose(float(total), sum(ref_losses.values()),
                               rtol=5e-3)
