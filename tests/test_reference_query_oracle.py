"""Query-family (TeViT/InstBlink) parity against the REFERENCE'S OWN
CODE, executed in-process — the tests/reference_shim.py technique
widened from the gaze path (tests/test_reference_model_oracle.py) to the
sibling families.

Reference files EXECUTED here (not replicated):
  mmdet/models/backbones/msgshift.py        full MsgShifT backbone
  mmdet/models/roi_heads/bbox_heads/{dii_head,stqi_head}.py
  mmdet/models/roi_heads/mask_heads/blink_head.py
  mmdet/models/roi_heads/{instblink_roi_head,tevit_roi_head}.py
  mmdet/models/detectors/{tevit,instblink}.py   (imported, registered)

What can and cannot be composed: the fork REWROTE DIIHead/STQIHead for
the 3 gaze clues (dii_head.py:102-116 replaces the generic fc_cls/fc_reg
with face/eyes/head towers; stqi_head.py:88-99 hard-indexes queries
0/1/2), so the shipped InstBlink chain cannot run a generic 100-query
inference — models/query_detector.py restores the commented-out generic
originals (documented deviation). The oracle therefore pins exactly the
parts the fork left intact and our model claims parity with:

  * the FULL MsgShifT backbone forward (msgshift.py:734-750),
  * the STQI stage TRUNK — spatial->temporal shared attention, real
    DynamicConv, FFN — via its obj_feat/attn_feats outputs
    (stqi_head.py:42-80), which do not touch the gutted cls/reg heads,
  * the shipped BlinkHead forward (blink_head.py:78-105), including the
    unchained-loop quirk our `blink_reference_semantics` flag models,
  * the checkpoint key surface of each (loading our synthetic
    reference-named state dicts into the executed modules leaves no
    unexpected keys).
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mcgaze_tpu.models.msgshift import MsgShifT
from mcgaze_tpu.models.query_detector import (BlinkHead, GenericSTQIHead,
                                              init_query_model)
from mcgaze_tpu.utils.torch_convert import (convert_msgshift_backbone,
                                            convert_query_torch_checkpoint)
from tests.reference_shim import install
from tests.test_query_convert import CFG, query_state_dict

B, T = 2, CFG.clip_length
N = B * T
Q, C, S = CFG.num_queries, CFG.channels, CFG.roi_size

# tiny 2-stage MsgShifT spec (same as tests/test_msgshift_torch_parity):
# stage 0 even-depth (both shift signs), stage 1 odd-depth (last layer
# unshifted), sr_ratio 2 then 1 — every forward branch exercised
M_TOK, SHIFT = 4, (1, -1)
EMBED, DEPTHS, HEADS = 8, (2, 1), (1, 2)
PATCH, STRIDES, PADS = (7, 3), (4, 2), (3, 1)
SR, MLP, IMG = (2, 1), (2, 2), 16


def _randomize(module, rng, scale=1.0):
    """Replace every parameter/buffer with seeded gaussian values so the
    executed reference module is the single source of weights."""
    with torch.no_grad():
        new = {k: torch.from_numpy(
                   (rng.randn(*v.shape) * scale).astype(np.float32))
               for k, v in module.state_dict().items()}
        module.load_state_dict(new)
    return {k: v.numpy() for k, v in new.items()}


@pytest.fixture(scope='module')
def ns():
    return install()


def test_msgshift_matches_reference_code(ns):
    """Our flax MsgShifT vs the reference's OWN MsgShifTBase forward
    (msgshift.py:734-750: patch embeds with the messenger summed-kernel
    path, SRA with concatenated msg tokens, conv-FFN, per-layer
    alternating messenger rolls, after-stage LN), weights flowing
    reference-module -> convert_msgshift_backbone -> flax."""
    ref = ns.MsgShifTBase(
        num_msg_tokens=M_TOK, shift_strides=list(SHIFT),
        pretrain_img_size=IMG, embed_dims=EMBED, num_stages=2,
        num_layers=list(DEPTHS), num_heads=list(HEADS),
        patch_sizes=list(PATCH), strides=list(STRIDES),
        paddings=list(PADS), sr_ratios=list(SR), out_indices=(0, 1),
        mlp_ratios=list(MLP),
        # the shipped MsgShifT subclass's flags (msgshift.py:752-763)
        use_abs_pos_embed=False, norm_after_stage=True, use_conv_ffn=True)
    ref.eval()
    sd = _randomize(ref, np.random.RandomState(5), scale=0.5)

    params = {}
    convert_msgshift_backbone(params, sd, prefix='')
    ours = MsgShifT(num_msg_tokens=M_TOK, shift_strides=SHIFT,
                    embed_dim=EMBED, num_layers=DEPTHS, num_heads=HEADS,
                    patch_sizes=PATCH, strides=STRIDES, paddings=PADS,
                    sr_ratios=SR, mlp_ratios=MLP)

    rng = np.random.RandomState(6)
    x = rng.randn(B * T, IMG, IMG, 3).astype(np.float32)
    with torch.no_grad():
        want = ref(B, T, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got = jax.jit(ours.apply, static_argnames='clip_length')(
        {'params': params['backbone']}, jnp.asarray(x), clip_length=T)

    assert len(got) == len(want) == 2
    for lvl, (j, t) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(j), t.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4, err_msg=f'level {lvl}')


@pytest.fixture(scope='module')
def query_pair(ns, tmp_path_factory):
    """(reference-named synthetic sd, our converted variables) shared by
    the head oracles — the same checkpoint both sides load."""
    rng = np.random.RandomState(0)
    sd = query_state_dict(rng)
    path = str(tmp_path_factory.mktemp('qo') / 'instblink.pth')
    torch.save({'state_dict': {k: torch.from_numpy(v)
                               for k, v in sd.items()}}, path)
    _, variables = init_query_model(CFG, jax.random.PRNGKey(0),
                                    image_size=(64, 64))
    converted = convert_query_torch_checkpoint(
        path, variables, num_stages=CFG.num_stages,
        with_blink=CFG.with_blink, num_cls_fcs=CFG.num_cls_fcs,
        num_reg_fcs=CFG.num_reg_fcs)
    return sd, converted


def test_stqi_trunk_matches_reference_code(ns, query_pair):
    """The reference's actual STQIHead.forward (stqi_head.py:42-80:
    spatial attention, the resize/permute temporal-attention chain with
    the SHARED attention module + norm, real DynamicConv + residual +
    LN, FFN) against our GenericSTQIHead — compared on the obj_feat and
    attn_feats outputs, which the fork's gaze-specialized cls/reg
    rewrite never touches. attn_feats is what _blink_forward consumes
    (instblink_roi_head.py:121,149-153)."""
    sd, variables = query_pair
    ref = ns.STQIHead(
        num_classes=CFG.num_classes,
        num_ffn_fcs=2, num_heads=CFG.num_heads,
        num_cls_fcs=CFG.num_cls_fcs, num_reg_fcs=CFG.num_reg_fcs,
        feedforward_channels=CFG.ffn_channels, in_channels=C,
        dropout=0.0, roi_feat_size=S,
        dynamic_conv_cfg=dict(
            type='DynamicConv', in_channels=C,
            feat_channels=CFG.dyn_feat_channels, out_channels=C,
            input_feat_shape=S, act_cfg=dict(type='ReLU', inplace=True),
            norm_cfg=dict(type='LN')),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=2.0),
        loss_bbox=dict(type='L1Loss', loss_weight=5.0),
        loss_iou=dict(type='GIoULoss', loss_weight=2.0),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder', clip_border=False,
                        target_means=[0., 0., 0., 0.],
                        target_stds=[0.5, 0.5, 1., 1.]))
    ref.eval()

    prefix = 'roi_head.bbox_head.0.'
    # fc_cls/fc_reg are OUR generic restoration (dii_head.py:102-106
    # commented originals) — the executed reference keeps BBoxHead's
    # dead defaults at different shapes, so they are dropped here, and
    # the face/eyes/head towers of the gaze rewrite stay at init
    mapped = {k[len(prefix):]: torch.from_numpy(v)
              for k, v in sd.items() if k.startswith(prefix)
              and not k[len(prefix):].startswith(('fc_cls', 'fc_reg'))}
    res = ref.load_state_dict(mapped, strict=False)
    assert res.unexpected_keys == []       # converter key-surface lock
    allowed = ('fc_cls', 'fc_reg', 'face_fc', 'eyes_fc', 'head_fc')
    assert all(k.startswith(allowed) for k in res.missing_keys), \
        res.missing_keys

    rng = np.random.RandomState(11)
    query = rng.randn(N, Q, C).astype(np.float32)
    roi = rng.randn(N * Q, S, S, C).astype(np.float32)
    with torch.no_grad():
        _cls, _delta, obj_ref, attn_ref = ref(
            torch.from_numpy(roi.transpose(0, 3, 1, 2)).contiguous(),
            torch.from_numpy(query), clip_length=T)

    head = GenericSTQIHead(
        channels=C, num_heads=CFG.num_heads,
        ffn_channels=CFG.ffn_channels,
        feat_channels=CFG.dyn_feat_channels, roi_size=S,
        num_classes=CFG.num_classes, num_cls_fcs=CFG.num_cls_fcs,
        num_reg_fcs=CFG.num_reg_fcs)
    _j_cls, _j_deltas, j_obj, j_attn = head.apply(
        {'params': variables['params']['bbox_head_0']},
        jnp.asarray(roi), jnp.asarray(query), T)

    np.testing.assert_allclose(np.asarray(j_attn), attn_ref.numpy(),
                               rtol=2e-5, atol=2e-5, err_msg='attn_feats')
    np.testing.assert_allclose(np.asarray(j_obj), obj_ref.numpy(),
                               rtol=2e-5, atol=2e-5, err_msg='obj_feat')


def test_blink_head_matches_reference_code(ns, query_pair):
    """The reference's actual BlinkHead.forward executed
    (blink_head.py:78-105). Its loop re-applies every tower layer to the
    raw input, so the shipped computation is fc_blink(ReLU(x)) with the
    tower weights dead — the executed code now PROVES the quirk our
    `blink_reference_semantics=True` flag reproduces, and refutes the
    chained-intent tower for shipped checkpoints."""
    sd, variables = query_pair
    ref = ns.BlinkHead(in_channels=C)
    ref.eval()
    prefix = 'roi_head.mask_head.0.'
    mapped = {k[len(prefix):]: torch.from_numpy(v)
              for k, v in sd.items() if k.startswith(prefix)}
    res = ref.load_state_dict(mapped, strict=False)
    assert res.unexpected_keys == [] and res.missing_keys == []

    rng = np.random.RandomState(12)
    feats = rng.randn(N, Q, C).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(feats))[..., 0].numpy()

    p = {'params': variables['params']['blink_head_0']}
    got = BlinkHead(C, reference_semantics=True).apply(
        p, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5,
                               atol=2e-5)
    chained = BlinkHead(C).apply(p, jnp.asarray(feats))
    assert np.abs(np.asarray(chained) - want).max() > 1e-4


def test_blink_loss_matches_reference_code(ns):
    """Execute the reference's BlinkHead.loss (blink_head.py:119-134 —
    the real mmdet FocalLoss CPU path + the `1 - blink_targets` line)
    and pin that our probability-target focal reproduces it EXACTLY:
    mmcv one-hots integer labels with label 0 as the positive class, so
    `1 - targets` is label ENCODING (blink=1 -> label 0 -> positive),
    not a semantic flip — the interpretation train/query_criterion.py
    documents and the burn-in once caught getting wrong."""
    import jax.numpy as jnp

    from mcgaze_tpu.ops import losses as L

    head = ns.BlinkHead(in_channels=C)
    rng = np.random.RandomState(21)
    p = 37                                    # positive samples
    pred = torch.from_numpy(rng.randn(p, 1).astype(np.float32))
    blinks = torch.from_numpy(
        (rng.rand(p) < 0.3).astype(np.int64))  # 1 = blink

    ref = head.loss(pred, blinks)['loss_blink'].item()

    ours = float(5.0 * L.sigmoid_focal_loss(
        jnp.asarray(pred.numpy().reshape(-1)),
        jnp.asarray(blinks.numpy().astype(np.float32)),
        gamma=2.0, alpha=0.25, avg_factor=float(p)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)

    # and get_targets (blink_head.py:136-146) is a pos-index gather
    class _Res:
        def __init__(self, idx):
            self.pos_assigned_gt_inds = torch.as_tensor(idx)

    gt = [torch.tensor([0., 1., 1.]), torch.tensor([1., 0.])]
    got = head.get_targets([_Res([2, 0]), _Res([1])], gt, None)
    np.testing.assert_array_equal(got.numpy(), [1., 0., 0.])
