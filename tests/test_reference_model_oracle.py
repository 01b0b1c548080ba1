"""Model parity against the REFERENCE'S OWN CODE, executed in-process.

Until now every model-parity test compared MCGazeModel against a torch
replica *written by this repo* (tests/test_torch_parity.py) — a shared
transcription error would pass silently. These tests close that gap:
tests/reference_shim.py executes the reference's actual
GazeSTQIHead/GazeHead/DynamicConv/DeltaXYWHBBoxCoder/
FixedEmbeddingRPNHead/SingleRoIExtractor/MultiClueGazeROIHead/
MultiClueGaze source from /root/reference (only external mmcv bricks
stubbed), loads the same synthetic reference-named checkpoint, and
requires:

  * each replica forward == the reference module's forward (<=2e-5), and
  * the composed MCGazeModel eval path == the reference detector's
    `simple_test` (gaze_stqi_head.py:119-205, gaze_head.py:140-200,
    multiclue_gaze_roi_head.py:287-385, multiclue_gaze.py:105-131)
    at <=1e-3 through all 4 stages (same tolerance as
    test_full_model_parity).

Also locks the checkpoint key surface: loading our synthetic state dict
into the real reference model must leave NO unexpected keys and only the
dead BBoxHead default heads missing.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mcgaze_tpu import geometry
from tests.reference_shim import build_reference_gaze_model, install
from tests.test_full_model_parity import (full_parity_fixture,  # noqa: F401
                                          scaled_reference_state_dict)
from tests.test_roi_align import torch_roi_align_single
from tests.test_torch_convert import reference_state_dict
from tests.test_torch_parity import torch_gaze_head, torch_stqi_stage

T, Q, C, IMG = 7, 3, 256, 64


@pytest.fixture(scope='module')
def ref_model():
    model = build_reference_gaze_model()
    sd = scaled_reference_state_dict(np.random.RandomState(42))
    res = model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False)
    # key-surface lock: nothing unexpected; only BBoxHead's dead default
    # heads (unused by GazeSTQIHead.forward, which defines the per-clue
    # face/eyes/head_fc_{cls,reg} instead) may be absent.
    assert res.unexpected_keys == []
    dead = {f'roi_head.bbox_head.{s}.fc_{h}.{p}'
            for s in range(4) for h in ('cls', 'reg')
            for p in ('weight', 'bias')}
    assert set(res.missing_keys) == dead
    return model, sd


def test_shim_roialign_matches_scalar_golden():
    """The shim's vectorized RoIAlign (the one mmcv op the reference
    model needs) must equal the repo's scalar golden bit-for-bit-ish."""
    ns = install()
    rng = np.random.RandomState(3)
    feat = torch.from_numpy(rng.randn(2, 16, 12, 10).astype(np.float32))
    rois = torch.tensor([
        [0, 1.5, 2.0, 17.0, 11.0],   # partly out of bounds (W=10)
        [1, -3.0, -2.0, 4.5, 6.25],  # negative start
        [0, 3.0, 3.0, 3.0, 3.0],     # degenerate
        [1, 0.0, 0.0, 20.0, 24.0],   # fully covering, out of range
    ], dtype=torch.float32)
    op = ns.SingleRoIExtractor  # noqa: F841 — ensures shim installed
    from tests.reference_shim import RoIAlign
    got = RoIAlign(7, spatial_scale=0.5, sampling_ratio=2)(feat, rois)
    for r in range(rois.shape[0]):
        b = int(rois[r, 0])
        want = torch_roi_align_single(
            feat[b].permute(1, 2, 0), rois[r:r + 1, 1:],
            spatial_scale=0.5)[0]
        np.testing.assert_allclose(got[r].permute(1, 2, 0).numpy(),
                                   want.numpy(), atol=1e-5,
                                   err_msg=f'roi {r}')


def test_stqi_head_replica_matches_reference(ref_model):
    """Our hand-written replica (tests/test_torch_parity.py) vs the
    reference's actual GazeSTQIHead.forward — same weights, same inputs."""
    model, sd = ref_model
    rng = np.random.RandomState(11)
    query = torch.from_numpy(rng.randn(T, Q, C).astype(np.float32))
    roi_nhwc = torch.from_numpy(
        rng.randn(T * Q, 7, 7, C).astype(np.float32))
    with torch.no_grad():
        for stage in range(4):
            head = model.roi_head.bbox_head[stage]
            cls_ref, delta_ref, obj_ref, attn_ref = head(
                roi_nhwc.permute(0, 3, 1, 2).contiguous(), query,
                clip_length=T)
            cls_rep, delta_rep, obj_rep = torch_stqi_stage(
                sd, query, roi_nhwc, stage=stage, n=T, t=T)
            np.testing.assert_allclose(cls_rep.numpy(), cls_ref.numpy(),
                                       atol=2e-5, err_msg=f's{stage} cls')
            np.testing.assert_allclose(delta_rep.numpy(),
                                       delta_ref.numpy(), atol=2e-5,
                                       err_msg=f's{stage} delta')
            np.testing.assert_allclose(
                obj_rep.numpy(), obj_ref.reshape(T, Q, C).numpy(),
                atol=2e-5, err_msg=f's{stage} obj')


def test_gaze_head_replica_matches_reference(ref_model):
    model, sd = ref_model
    rng = np.random.RandomState(12)
    attn = torch.from_numpy(rng.randn(T, Q, C).astype(np.float32))
    with torch.no_grad():
        for stage in range(4):
            head = model.roi_head.gaze_head[stage]
            fusion, face, eyes, hd = head(attn, None)
            rep = torch_gaze_head(sd, attn, stage=stage)
            for key, ref_val in (('fusion', fusion), ('face', face),
                                 ('eyes', eyes), ('head', hd)):
                np.testing.assert_allclose(
                    rep[key].numpy(), ref_val.numpy(), atol=2e-5,
                    err_msg=f's{stage} gaze {key}')


def test_delta_decode_matches_reference():
    """geometry.delta2bbox vs the reference DeltaXYWHBBoxCoder.decode
    with the config's stds (.5,.5,1,1) and clip_border=False."""
    ns = install()
    coder = ns.DeltaXYWHBBoxCoder(clip_border=False,
                                  target_means=[0., 0., 0., 0.],
                                  target_stds=[0.5, 0.5, 1., 1.])
    rng = np.random.RandomState(13)
    boxes = rng.rand(40, 4).astype(np.float32) * 60
    boxes[:, 2:] += boxes[:, :2] + 1
    deltas = (rng.randn(40, 4) * 2).astype(np.float32)
    ref = coder.decode(torch.from_numpy(boxes), torch.from_numpy(deltas),
                       max_shape=(IMG, IMG, 3))
    ours = geometry.delta2bbox(jnp.asarray(boxes), jnp.asarray(deltas),
                               stds=(0.5, 0.5, 1.0, 1.0))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5,
                               atol=2e-4)


def test_rpn_proposals_match_reference(ref_model):
    model, sd = ref_model
    whwh = torch.tensor([[48., 40., 48., 40.]]).repeat(T, 1)
    metas = [dict(img_shape=(40, 48, 3)) for _ in range(T)]
    feats = [torch.zeros(T, C, 8, 8)]
    with torch.no_grad():
        boxes, feats_out, imgs_whwh = model.rpn_head.simple_test_rpn(
            feats, metas)
    init = sd['rpn_head.init_proposal_bboxes.weight']
    cx, cy, w, h = init.T
    want = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    want = want[None] * whwh.numpy()[:, None, :]
    np.testing.assert_allclose(boxes.numpy(), want, atol=1e-5)
    np.testing.assert_allclose(
        feats_out.numpy(),
        np.broadcast_to(sd['rpn_head.init_proposal_features.weight'],
                        (T, Q, C)), atol=0)
    np.testing.assert_allclose(imgs_whwh.numpy()[:, 0], whwh.numpy(),
                               atol=0)


def test_full_model_matches_reference_code(ref_model, full_parity_fixture):
    """THE composed oracle: MCGazeModel.apply vs the reference detector's
    own simple_test on one 7-frame clip, shared checkpoint, <=1e-3."""
    model, sd = ref_model
    _, our_model, variables = full_parity_fixture
    rng = np.random.RandomState(7)
    imgs = rng.randn(T, IMG, IMG, 3).astype(np.float32)
    whwh = np.full((T, 4), float(IMG), np.float32)

    metas = [dict(img_shape=(IMG, IMG, 3), ori_shape=(IMG, IMG, 3),
                  scale_factor=np.array([1., 1., 1., 1.],
                                        dtype=np.float32))
             for _ in range(T)]
    with torch.no_grad():
        timg = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        (det_bboxes, det_labels), gaze = model.simple_test(
            timg, metas, rescale=False, format=False)

    out = jax.jit(
        lambda v, i, w: our_model.apply(v, i, w, clip_length=T))(
            variables, jnp.asarray(imgs), jnp.asarray(whwh))
    last = out['stages'][3]
    ours_boxes = np.asarray(last['boxes'])
    ours_scores = np.asarray(jax.nn.sigmoid(last['cls_logits']))[..., 0]

    ref_boxes = np.stack([d[:, :4].numpy() for d in det_bboxes])
    ref_scores = np.stack([d[:, 4].numpy() for d in det_bboxes])
    np.testing.assert_allclose(ours_boxes, ref_boxes, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(ours_scores, ref_scores, atol=1e-4)
    assert [list(l) for l in det_labels] == [[0, 1, 2]] * T

    for key, ref_key in (('fusion', 'gaze_score'),
                         ('face', 'face_gaze_score'),
                         ('eyes', 'eyes_gaze_score'),
                         ('head', 'head_gaze_score')):
        np.testing.assert_allclose(
            np.asarray(last['gaze'][key]), gaze[ref_key].numpy(),
            atol=1e-3, err_msg=f'gaze {key}')
