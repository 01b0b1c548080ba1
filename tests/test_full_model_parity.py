"""End-to-end 4-stage torch-replica parity for the FULL model.

Composes a torch replica of the whole reference eval path on one 7-frame
clip — ResNet-50 (frozen BN) -> FPN -> fixed proposals -> 4x [level-routed
aligned RoIAlign -> GazeSTQIHead -> DeltaXYWH decode] -> GazeHead — from
the same synthetic reference-named checkpoint, and asserts
MCGazeModel.apply matches boxes / scores / gazes at every stage.

This is the strongest offline substitute for the 10.74-degree checkpoint
run: it exercises the composition risks module tests can't see (RoIAlign
level routing + fp32 forcing per single_level_roi_extractor.py:36-75,
stage-to-stage box feedback per multiclue_gaze_roi_head.py:73-137, decode
semantics per bbox_head.py:381-458).
"""
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mcgaze_tpu.models.mcgaze import MCGazeModel, ModelConfig
from mcgaze_tpu.utils.torch_convert import convert_torch_checkpoint
from tests.test_roi_align import torch_roi_align_single
from tests.test_torch_convert import reference_state_dict
from tests.test_torch_parity import torch_gaze_head, torch_stqi_stage

T, Q, IMG = 7, 3, 64
STRIDES = (4, 8, 16, 32)


def scaled_reference_state_dict(rng):
    """reference_state_dict rescaled so activations stay O(1) through the
    50-layer composition (raw N(0,1) conv stacks overflow fp32)."""
    sd = reference_state_dict(rng)
    out = {}
    for k, v in sd.items():
        if k == 'rpn_head.init_proposal_bboxes.weight':
            out[k] = v                      # normalised cxcywh in [0,1)
        elif v.ndim == 4:                   # conv: He-ish scale
            out[k] = v / np.sqrt(np.prod(v.shape[1:]))
        elif v.ndim == 2:                   # linear / embedding
            out[k] = v / np.sqrt(v.shape[1])
        elif k.endswith('running_var'):
            out[k] = v                      # already |N| + 0.5
        elif k.endswith('running_mean'):
            out[k] = 0.1 * v
        elif k.endswith('.weight'):         # LN/BN affine scale
            out[k] = 1.0 + 0.1 * v
        else:                               # biases
            out[k] = 0.1 * v
    return {k: np.asarray(v, np.float32) for k, v in out.items()}


def tbn(sd, key, x):
    return F.batch_norm(
        x, torch.from_numpy(sd[f'{key}.running_mean']),
        torch.from_numpy(sd[f'{key}.running_var']),
        torch.from_numpy(sd[f'{key}.weight']),
        torch.from_numpy(sd[f'{key}.bias']), training=False)


def tconv(sd, key, x, stride=1, pad=0):
    return F.conv2d(x, torch.from_numpy(sd[key]), stride=stride,
                    padding=pad)


def torch_resnet50(sd, x):
    """Eval-mode torchvision-layout R50; returns (c2, c3, c4, c5) NCHW."""
    x = torch.relu(tbn(sd, 'backbone.bn1',
                       tconv(sd, 'backbone.conv1.weight', x, 2, 3)))
    x = F.max_pool2d(x, 3, 2, 1)
    outs = []
    for s, n_blocks in enumerate((3, 4, 6, 3)):
        for i in range(n_blocks):
            b = f'backbone.layer{s + 1}.{i}'
            stride = 2 if (s > 0 and i == 0) else 1
            y = torch.relu(tbn(sd, f'{b}.bn1',
                               tconv(sd, f'{b}.conv1.weight', x)))
            y = torch.relu(tbn(sd, f'{b}.bn2',
                               tconv(sd, f'{b}.conv2.weight', y, stride, 1)))
            y = tbn(sd, f'{b}.bn3', tconv(sd, f'{b}.conv3.weight', y))
            if i == 0:
                x = tbn(sd, f'{b}.downsample.1',
                        tconv(sd, f'{b}.downsample.0.weight', x, stride))
            x = torch.relu(x + y)
        outs.append(x)
    return outs


def torch_fpn(sd, feats):
    """mmdet FPN: 1x1 laterals, nearest 2x top-down, 3x3 output convs."""
    lat = []
    for i, f in enumerate(feats):
        w = torch.from_numpy(sd[f'neck.lateral_convs.{i}.conv.weight'])
        b = torch.from_numpy(sd[f'neck.lateral_convs.{i}.conv.bias'])
        lat.append(F.conv2d(f, w, b))
    for i in range(len(lat) - 1, 0, -1):
        lat[i - 1] = lat[i - 1] + F.interpolate(lat[i], scale_factor=2,
                                                mode='nearest')
    outs = []
    for i, f in enumerate(lat):
        w = torch.from_numpy(sd[f'neck.fpn_convs.{i}.conv.weight'])
        b = torch.from_numpy(sd[f'neck.fpn_convs.{i}.conv.bias'])
        outs.append(F.conv2d(f, w, b, padding=1))
    return outs


def torch_map_roi_levels(rois, num_levels=4, finest_scale=56.0):
    """single_level_roi_extractor.py:36-55."""
    scale = torch.sqrt((rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]))
    lvls = torch.floor(torch.log2(scale / finest_scale + 1e-6))
    return lvls.clamp(0, num_levels - 1).long()


def torch_roi_extract(fpn_feats, boxes):
    """boxes (N, Q, 4) image coords -> (N*Q, S, S, C) NHWC, fp32,
    level-routed aligned RoIAlign (sampling_ratio 2)."""
    n = boxes.shape[0]
    rois = boxes.reshape(-1, 4)
    lvls = torch_map_roi_levels(rois)
    out = torch.zeros(n * Q, 7, 7, 256)
    for r in range(n * Q):
        lvl = int(lvls[r])
        img = r // Q
        feat = fpn_feats[lvl][img].permute(1, 2, 0)       # HWC
        out[r] = torch_roi_align_single(
            feat, rois[r:r + 1], spatial_scale=1.0 / STRIDES[lvl])[0]
    return out


def torch_delta2bbox(rois, deltas, stds=(0.5, 0.5, 1.0, 1.0),
                     wh_ratio_clip=16 / 1000):
    """DeltaXYWHBBoxCoder.decode, clip_border=False
    (delta_xywh_bbox_coder.py:163-276)."""
    d = deltas * torch.tensor(stds)
    max_ratio = abs(math.log(wh_ratio_clip))
    dx, dy = d[..., 0], d[..., 1]
    dw = d[..., 2].clamp(-max_ratio, max_ratio)
    dh = d[..., 3].clamp(-max_ratio, max_ratio)
    px = (rois[..., 0] + rois[..., 2]) * 0.5
    py = (rois[..., 1] + rois[..., 3]) * 0.5
    pw = rois[..., 2] - rois[..., 0]
    ph = rois[..., 3] - rois[..., 1]
    gx, gy = px + pw * dx, py + ph * dy
    gw, gh = pw * torch.exp(dw), ph * torch.exp(dh)
    return torch.stack([gx - gw * 0.5, gy - gh * 0.5,
                        gx + gw * 0.5, gy + gh * 0.5], dim=-1)


@pytest.fixture(scope='module')
def full_parity_fixture(tmp_path_factory):
    rng = np.random.RandomState(42)
    sd = scaled_reference_state_dict(rng)
    path = str(tmp_path_factory.mktemp('full') / 'ref.pth')
    torch.save({'state_dict': {k: torch.from_numpy(v)
                               for k, v in sd.items()}}, path)
    cfg = ModelConfig()
    model = MCGazeModel(cfg)
    # jitted init/apply: eager op-by-op dispatch of the full R50 cost this
    # fixture ~40s on the 1-core box; compiled versions persist in the
    # compile cache across runs
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((T, IMG, IMG, 3), jnp.float32),
                                    jnp.full((T, 4), float(IMG)))
    converted = convert_torch_checkpoint(path, variables)
    return sd, model, converted


def test_full_model_matches_torch_replica(full_parity_fixture):
    sd, model, variables = full_parity_fixture
    rng = np.random.RandomState(7)
    imgs = rng.randn(T, IMG, IMG, 3).astype(np.float32)
    whwh = np.full((T, 4), float(IMG), np.float32)

    # ---- torch replica, full eval path ----
    with torch.no_grad():
        tx = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        fpn = torch_fpn(sd, torch_resnet50(sd, tx))
        init_boxes = torch.from_numpy(
            sd['rpn_head.init_proposal_bboxes.weight'])
        cx, cy, w, h = init_boxes.unbind(-1)
        boxes = torch.stack([cx - w / 2, cy - h / 2,
                             cx + w / 2, cy + h / 2], -1)
        boxes = boxes[None] * torch.from_numpy(whwh)[:, None, :]
        query = torch.from_numpy(
            sd['rpn_head.init_proposal_features.weight'])[None].expand(
                T, Q, 256).contiguous()
        ref_stages = []
        for stage in range(4):
            roi_feat = torch_roi_extract(fpn, boxes)
            cls_logits, deltas, obj = torch_stqi_stage(
                sd, query, roi_feat, stage=stage, n=T, t=T)
            boxes = torch_delta2bbox(boxes, deltas)
            gaze = torch_gaze_head(sd, obj, stage=stage)
            ref_stages.append((cls_logits, boxes, gaze))
            query = obj

    # ---- ours: one apply (jitted, persistent-cacheable) ----
    out = jax.jit(lambda v, i, w: model.apply(v, i, w, clip_length=T))(
        variables, jnp.asarray(imgs), jnp.asarray(whwh))

    for stage, (r_cls, r_boxes, r_gaze) in enumerate(ref_stages):
        o = out['stages'][stage]
        np.testing.assert_allclose(
            np.asarray(jax.nn.sigmoid(o['cls_logits'])),
            torch.sigmoid(r_cls).numpy(), atol=1e-4,
            err_msg=f'stage{stage} scores')
        np.testing.assert_allclose(
            np.asarray(o['boxes']), r_boxes.numpy(), rtol=1e-3, atol=1e-3,
            err_msg=f'stage{stage} boxes')
        for k in ('fusion', 'face', 'eyes', 'head'):
            np.testing.assert_allclose(
                np.asarray(o['gaze'][k]), r_gaze[k].numpy(), atol=1e-3,
                err_msg=f'stage{stage} gaze {k}')
