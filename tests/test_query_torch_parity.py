"""Numerical forward parity vs torch for the query-family heads
(TeViT/InstBlink): the generic STQI refinement stage and the blink head.

Same discipline as tests/test_torch_parity.py for the gaze path: build a
small torch replica with the reference structure (stqi_head.py:42-87 at
eval, dropout off; the generic fc_cls/fc_reg restore dii_head.py:102-106's
commented originals as documented in models/query_detector.py; blink
tower per blink_head.py:59-64), load the SAME synthetic reference-named
state_dict through convert_query_torch_checkpoint, and compare at 2e-5 —
tight enough to prove the packed in_proj import, the dual-layout
attention reshapes, the DynamicConv bmm layout and the LN epsilon all
match torch.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mcgaze_tpu.models.query_detector import (BlinkHead, GenericSTQIHead,
                                              init_query_model)
from mcgaze_tpu.utils.torch_convert import convert_query_torch_checkpoint
from tests.test_query_convert import CFG, query_state_dict
from tests.test_torch_parity import torch_linear, torch_ln, torch_tower

B, T = 2, CFG.clip_length                    # N = B*T frames
N = B * T
Q, C, S = CFG.num_queries, CFG.channels, CFG.roi_size
F = CFG.dyn_feat_channels


@pytest.fixture(scope='module')
def query_variables(tmp_path_factory):
    rng = np.random.RandomState(0)
    sd = query_state_dict(rng)
    path = str(tmp_path_factory.mktemp('qp') / 'instblink.pth')
    torch.save({'state_dict': {k: torch.from_numpy(v)
                               for k, v in sd.items()}}, path)
    _, variables = init_query_model(CFG, jax.random.PRNGKey(0),
                                    image_size=(64, 64))
    converted = convert_query_torch_checkpoint(
        path, variables, num_stages=CFG.num_stages,
        with_blink=CFG.with_blink, num_cls_fcs=CFG.num_cls_fcs,
        num_reg_fcs=CFG.num_reg_fcs)
    return sd, converted


def torch_mha(sd, prefix, x):
    """x (B, S, E) -> x + MHA(x): torch.nn.MultiheadAttention with the
    packed in_proj layout, plus the mmcv-brick residual."""
    mha = torch.nn.MultiheadAttention(C, CFG.num_heads, batch_first=True)
    with torch.no_grad():
        mha.in_proj_weight.copy_(
            torch.from_numpy(sd[f'{prefix}.in_proj_weight']))
        mha.in_proj_bias.copy_(
            torch.from_numpy(sd[f'{prefix}.in_proj_bias']))
        mha.out_proj.weight.copy_(
            torch.from_numpy(sd[f'{prefix}.out_proj.weight']))
        mha.out_proj.bias.copy_(
            torch.from_numpy(sd[f'{prefix}.out_proj.bias']))
    mha.eval()
    return x + mha(x, x, x, need_weights=False)[0]


def torch_generic_stqi_stage(sd, query, roi_feat, stage=0):
    """Reference STQIHead.forward (stqi_head.py:42-87) at eval with the
    generic DII cls/reg heads: spatial attn -> temporal attn (same
    module+LN, stqi_head.py:55-66's resize/permute chain) -> DynamicConv
    -> FFN -> towers -> fc_cls/fc_reg. query (N,Q,C); roi_feat
    (N*Q,S,S,C) NHWC."""
    tb = f'roi_head.bbox_head.{stage}'
    x = torch_mha(sd, f'{tb}.attention.attn', query)
    x = torch_ln(sd, f'{tb}.attention_norm', x)
    # temporal layout (stqi_head.py:55-60): [b*t,Q,C] -> [t,b*Q,C]; as
    # batch_first that is (b*Q, t, C) with b-major batch order
    x = x.reshape(B, T, Q, C).permute(0, 2, 1, 3).reshape(B * Q, T, C)
    x = torch_mha(sd, f'{tb}.attention.attn', x)
    x = torch_ln(sd, f'{tb}.attention_norm', x)
    x = x.reshape(B, Q, T, C).permute(0, 2, 1, 3).reshape(N, Q, C)
    attn_feat = x                  # stqi_head.py:74 attn_feats return

    # DynamicConv (transformer.py:1116-1164)
    dc = f'{tb}.instance_interactive_conv'
    fq = x.reshape(N * Q, C)
    params = torch_linear(sd, f'{dc}.dynamic_layer', fq)
    p_in = params[:, :C * F].view(N * Q, C, F)
    p_out = params[:, C * F:].view(N * Q, F, C)
    feats = roi_feat.reshape(N * Q, S * S, C)
    y = torch.bmm(feats, p_in)
    y = torch.relu(torch_ln(sd, f'{dc}.norm_in', y))
    y = torch.bmm(y, p_out)
    y = torch.relu(torch_ln(sd, f'{dc}.norm_out', y))
    y = torch_linear(sd, f'{dc}.fc_layer', y.flatten(1))
    y = torch.relu(torch_ln(sd, f'{dc}.fc_norm', y))
    obj = torch_ln(sd, f'{tb}.instance_interactive_conv_norm', fq + y)

    # FFN residual + norm
    z = torch_linear(sd, f'{tb}.ffn.layers.0.0', obj)
    z = torch_linear(sd, f'{tb}.ffn.layers.1', torch.relu(z))
    obj = torch_ln(sd, f'{tb}.ffn_norm', obj + z)

    cls_feat = torch_tower(sd, f'{tb}.cls_fcs', obj, CFG.num_cls_fcs)
    reg_feat = torch_tower(sd, f'{tb}.reg_fcs', obj, CFG.num_reg_fcs)
    cls_logits = torch_linear(sd, f'{tb}.fc_cls',
                              cls_feat).reshape(N, Q, CFG.num_classes)
    deltas = torch_linear(sd, f'{tb}.fc_reg', reg_feat).reshape(N, Q, 4)
    return cls_logits, deltas, obj.reshape(N, Q, C), attn_feat


def torch_blink_head(sd, obj, stage=0):
    """blink_head.py:59-64 intent (chained 2x(Linear-LN-ReLU) + fc, see
    models/query_detector.py deviation notes), pre-rewrite mask_head
    naming."""
    tg = f'roi_head.mask_head.{stage}'
    x = torch_tower(sd, f'{tg}.blink_fcs', obj, 2)
    return torch_linear(sd, f'{tg}.fc_blink', x)[..., 0]


@pytest.mark.parametrize('stage', [0, 1])
def test_generic_stqi_stage_matches_torch(query_variables, stage):
    sd, variables = query_variables
    rng = np.random.RandomState(1 + stage)
    query = rng.randn(N, Q, C).astype(np.float32)
    roi = rng.randn(N * Q, S, S, C).astype(np.float32)

    t_cls, t_deltas, t_obj, t_attn = torch_generic_stqi_stage(
        sd, torch.from_numpy(query), torch.from_numpy(roi), stage)

    head = GenericSTQIHead(
        channels=C, num_heads=CFG.num_heads,
        ffn_channels=CFG.ffn_channels, feat_channels=F, roi_size=S,
        num_classes=CFG.num_classes, num_cls_fcs=CFG.num_cls_fcs,
        num_reg_fcs=CFG.num_reg_fcs)
    p = variables['params'][f'bbox_head_{stage}']
    j_cls, j_deltas, j_obj, j_attn = head.apply(
        {'params': p}, jnp.asarray(roi), jnp.asarray(query), T)

    np.testing.assert_allclose(np.asarray(j_cls), t_cls.detach().numpy(),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(j_deltas),
                               t_deltas.detach().numpy(),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(j_obj), t_obj.detach().numpy(),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(j_attn), t_attn.detach().numpy(),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize('stage', [0, 1])
def test_blink_head_matches_torch(query_variables, stage):
    sd, variables = query_variables
    rng = np.random.RandomState(3 + stage)
    obj = rng.randn(N, Q, C).astype(np.float32)
    ref = torch_blink_head(sd, torch.from_numpy(obj), stage)
    out = BlinkHead(C).apply(
        {'params': variables['params'][f'blink_head_{stage}']},
        jnp.asarray(obj))
    np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize('stage', [0])
def test_blink_head_reference_semantics_matches_shipped_torch(
        query_variables, stage):
    """The fork's SHIPPED blink forward is an unchained loop
    (blink_head.py:103-104): every layer re-applies to the raw input, so
    the torch model computes fc_blink(ReLU(x)) with the tower weights
    dead. BlinkHead(reference_semantics=True) reproduces that exactly —
    the setting reference-trained checkpoints need."""
    sd, variables = query_variables
    rng = np.random.RandomState(7 + stage)
    obj = rng.randn(N, Q, C).astype(np.float32)

    # the literal reference loop: blink_feat ends as ReLU(raw input)
    tg = f'roi_head.mask_head.{stage}'
    x = torch.relu(torch.from_numpy(obj))
    ref = torch_linear(sd, f'{tg}.fc_blink', x)[..., 0]

    out = BlinkHead(C, reference_semantics=True).apply(
        {'params': variables['params'][f'blink_head_{stage}']},
        jnp.asarray(obj))
    np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(),
                               rtol=2e-5, atol=2e-5)
    # and it differs from the chained-intent tower (the weights are
    # random, so agreement would mean the flag is not wired)
    chained = BlinkHead(C).apply(
        {'params': variables['params'][f'blink_head_{stage}']},
        jnp.asarray(obj))
    assert np.abs(np.asarray(out) - np.asarray(chained)).max() > 1e-4
