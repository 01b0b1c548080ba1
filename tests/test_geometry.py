"""Golden tests for geometry against torch re-derivations of the reference
math (delta coder: reference mmdet/core/bbox/coder/delta_xywh_bbox_coder.py;
gaze converters: mmdet/models/losses/gaze_arccos_loss.py:69-83)."""
import math

import numpy as np
import pytest
import torch

from mcgaze_tpu import geometry


def torch_delta2bbox(rois, deltas, means=(0, 0, 0, 0), stds=(.5, .5, 1, 1),
                     wh_ratio_clip=16 / 1000):
    means = deltas.new_tensor(means).view(1, -1)
    stds = deltas.new_tensor(stds).view(1, -1)
    denorm = deltas * stds + means
    dxy = denorm[..., :2]
    dwh = denorm[..., 2:]
    max_ratio = abs(math.log(wh_ratio_clip))
    dwh = dwh.clamp(min=-max_ratio, max=max_ratio)
    pxy = (rois[..., :2] + rois[..., 2:]) * 0.5
    pwh = rois[..., 2:] - rois[..., :2]
    gxy = pxy + pwh * dxy
    gwh = pwh * dwh.exp()
    x1y1 = gxy - gwh * 0.5
    x2y2 = gxy + gwh * 0.5
    return torch.cat([x1y1, x2y2], dim=-1)


def test_cxcywh_roundtrip():
    rng = np.random.RandomState(0)
    boxes = rng.rand(32, 4).astype(np.float32)
    boxes[:, 2:] += 0.5
    xyxy = geometry.bbox_cxcywh_to_xyxy(boxes)
    back = geometry.bbox_xyxy_to_cxcywh(xyxy)
    np.testing.assert_allclose(np.asarray(back), boxes, atol=1e-6)


def test_delta2bbox_matches_torch():
    rng = np.random.RandomState(1)
    rois = rng.uniform(0, 200, (64, 4)).astype(np.float32)
    rois[:, 2:] = rois[:, :2] + rng.uniform(5, 100, (64, 2)).astype(np.float32)
    deltas = rng.randn(64, 4).astype(np.float32) * 2
    ours = np.asarray(geometry.delta2bbox(rois, deltas))
    ref = torch_delta2bbox(torch.from_numpy(rois),
                           torch.from_numpy(deltas)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=2e-3)


def test_bbox2delta_roundtrip():
    rng = np.random.RandomState(2)
    rois = rng.uniform(0, 200, (16, 4)).astype(np.float32)
    rois[:, 2:] = rois[:, :2] + rng.uniform(5, 100, (16, 2)).astype(np.float32)
    gt = rois + rng.uniform(-3, 3, (16, 4)).astype(np.float32)
    deltas = geometry.bbox2delta(rois, gt)
    rec = np.asarray(geometry.delta2bbox(rois, np.asarray(deltas)))
    np.testing.assert_allclose(rec, gt, rtol=1e-4, atol=1e-3)


def test_giou_aligned():
    a = np.array([[0., 0., 10., 10.], [0., 0., 10., 10.]], np.float32)
    b = np.array([[0., 0., 10., 10.], [10., 10., 20., 20.]], np.float32)
    g = np.asarray(geometry.giou(a, b))
    assert g[0] == pytest.approx(1.0, abs=1e-5)
    # disjoint, touching at a corner: iou 0, enclosing 400, union 200
    assert g[1] == pytest.approx(0.0 - 200.0 / 400.0, abs=1e-5)


def test_gaze_conversion_roundtrip_and_convention():
    rng = np.random.RandomState(3)
    yp = rng.uniform(-1.2, 1.2, (100, 2)).astype(np.float32)
    vec = np.asarray(geometry.yaw_pitch_to_vector(yp))
    np.testing.assert_allclose(np.linalg.norm(vec, axis=-1), 1.0, atol=1e-5)
    back = np.asarray(geometry.vector_to_yaw_pitch(vec))
    np.testing.assert_allclose(back, yp, atol=1e-5)
    # Convention: yaw=0,pitch=0 -> looking along -z (into the camera).
    v0 = np.asarray(geometry.yaw_pitch_to_vector(np.zeros((1, 2), np.float32)))
    np.testing.assert_allclose(v0, [[0., 0., -1.]], atol=1e-6)
