"""Numerical forward parity vs torch for the hard-parity modules
(SURVEY.md §7 'hard parts': torch MHA packed in_proj layout, mmcv FFN/LN
ordering, DynamicConv bmm layout, frozen-BN bottleneck).

Each test builds a small torch replica with the reference's structure
(gaze_stqi_head.py / gaze_head.py / torchvision resnet semantics at eval
time, dropout off), loads the SAME synthetic reference-named state_dict
through utils.torch_convert, and compares outputs to 2e-5
(tight enough to prove the LN epsilon matches torch's 1e-5)."""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from mcgaze_tpu.models.heads import GazeHead, STQIHead
from mcgaze_tpu.models.mcgaze import ModelConfig, init_model
from mcgaze_tpu.utils.torch_convert import convert_torch_checkpoint
from tests.test_torch_convert import reference_state_dict

N, Q, C, T, S = 7, 3, 256, 7, 7       # one 7-frame clip


@pytest.fixture(scope='module')
def stage0_variables(tmp_path_factory):
    rng = np.random.RandomState(0)
    sd = reference_state_dict(rng)
    path = str(tmp_path_factory.mktemp('pp') / 'ref.pth')
    torch.save({'state_dict': {k: torch.from_numpy(v)
                               for k, v in sd.items()}}, path)
    _, variables = init_model(ModelConfig(), jax.random.PRNGKey(0),
                              image_size=(64, 64))
    converted = convert_torch_checkpoint(path, variables)
    return sd, converted


def torch_mha(sd, prefix, x):
    """x (B, S, E) -> x + MHA(x) with the packed in_proj layout of
    torch.nn.MultiheadAttention (mmcv brick adds the identity)."""
    mha = tnn.MultiheadAttention(C, 8, batch_first=True)
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


def torch_ln(sd, prefix, x):
    return torch.nn.functional.layer_norm(
        x, (x.shape[-1],), torch.from_numpy(sd[f'{prefix}.weight']),
        torch.from_numpy(sd[f'{prefix}.bias']))


def torch_linear(sd, prefix, x, bias=True):
    w = torch.from_numpy(sd[f'{prefix}.weight'])
    b = torch.from_numpy(sd[f'{prefix}.bias']) if bias else None
    return torch.nn.functional.linear(x, w, b)


def torch_tower(sd, prefix, x, n):
    """n x (Linear-no-bias, LN, ReLU) — reference cls/reg/gaze towers."""
    for i in range(n):
        x = torch_linear(sd, f'{prefix}.{3 * i}', x, bias=False)
        x = torch_ln(sd, f'{prefix}.{3 * i + 1}', x)
        x = torch.relu(x)
    return x


def torch_stqi_stage(sd, query, roi_feat, stage=0, n=N, t=T):
    """Reference GazeSTQIHead.forward (gaze_stqi_head.py:119-201) at eval:
    spatial attn -> temporal attn (same module+LN) -> DynamicConv ->
    FFN -> towers -> per-clue heads. query (N,Q,C); roi_feat (N*Q,S,S,C)
    NHWC (converted to the torch hw-major flatten inside)."""
    N_, T_ = n, t
    tb = f'roi_head.bbox_head.{stage}'
    x = torch_mha(sd, f'{tb}.attention.attn', query)
    x = torch_ln(sd, f'{tb}.attention_norm', x)
    # temporal: (N=B*T, Q, C) -> (B*Q, T, C), same attention weights
    x = x.reshape(1, T_, Q, C).permute(0, 2, 1, 3).reshape(Q, T_, C)
    x = torch_mha(sd, f'{tb}.attention.attn', x)
    x = torch_ln(sd, f'{tb}.attention_norm', x)
    x = x.reshape(1, Q, T_, C).permute(0, 2, 1, 3).reshape(N_, Q, C)

    # DynamicConv (transformer.py:1116-1164)
    dc = f'{tb}.instance_interactive_conv'
    fq = x.reshape(N_ * Q, C)
    params = torch_linear(sd, f'{dc}.dynamic_layer', fq)
    p_in = params[:, :C * 64].view(N_ * Q, C, 64)
    p_out = params[:, C * 64:].view(N_ * Q, 64, C)
    feats = roi_feat.reshape(N_ * Q, S * S, C)
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

    cls_feat = torch_tower(sd, f'{tb}.cls_fcs', obj, 1).reshape(N_, Q, C)
    reg_feat = torch_tower(sd, f'{tb}.reg_fcs', obj, 3).reshape(N_, Q, C)
    cls_logits, deltas = [], []
    for i, clue in enumerate(('face', 'eyes', 'head')):
        cls_logits.append(torch_linear(sd, f'{tb}.{clue}_fc_cls',
                                       cls_feat[:, i]))
        deltas.append(torch_linear(sd, f'{tb}.{clue}_fc_reg',
                                   reg_feat[:, i]))
    return (torch.stack(cls_logits, 1), torch.stack(deltas, 1),
            obj.reshape(N_, Q, C))


def torch_gaze_head(sd, obj, stage=0):
    tg = f'roi_head.gaze_head.{stage}'
    gazes, confs = [], []
    for i, clue in enumerate(('face', 'eyes', 'head')):
        g = torch_tower(sd, f'{tg}.gaze_{clue}_fcs', obj[:, i], 2)
        gazes.append(torch_linear(sd, f'{tg}.fc_{clue}', g))
        f = torch_tower(sd, f'{tg}.gaze_{clue}_confidence', obj[:, i], 2)
        confs.append(torch_linear(sd, f'{tg}.fc_{clue}_confidence', f))
    fused = torch_linear(
        sd, f'{tg}.fc_gaze',
        torch.cat([c * g for c, g in zip(confs, gazes)], -1))
    norm = lambda v: v / v.norm(dim=-1, keepdim=True)
    return dict(fusion=norm(fused), face=norm(gazes[0]),
                eyes=norm(gazes[1]), head=norm(gazes[2]))


def test_stqi_stage_matches_torch(stage0_variables):
    sd, variables = stage0_variables
    rng = np.random.RandomState(1)
    query = rng.randn(N, Q, C).astype(np.float32)
    roi = rng.randn(N * Q, S, S, C).astype(np.float32)

    t_cls, t_deltas, t_obj = torch_stqi_stage(
        sd, torch.from_numpy(query), torch.from_numpy(roi))

    head = STQIHead()
    p = variables['params']['bbox_head_0']
    j_cls, j_deltas, j_obj = head.apply(
        {'params': p}, jnp.asarray(roi), jnp.asarray(query), T)

    np.testing.assert_allclose(np.asarray(j_cls),
                               t_cls.detach().numpy(), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(j_deltas),
                               t_deltas.detach().numpy(), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(j_obj),
                               t_obj.detach().numpy(), rtol=2e-5, atol=2e-5)


def test_gaze_head_matches_torch(stage0_variables):
    sd, variables = stage0_variables
    rng = np.random.RandomState(2)
    obj = rng.randn(N, Q, C).astype(np.float32)
    ref = torch_gaze_head(sd, torch.from_numpy(obj))
    out = GazeHead().apply({'params': variables['params']['gaze_head_0']},
                           jnp.asarray(obj))
    for k in ('fusion', 'face', 'eyes', 'head'):
        np.testing.assert_allclose(np.asarray(out[k]),
                                   ref[k].detach().numpy(), rtol=2e-5, atol=2e-5,
                                   err_msg=k)


def test_bottleneck_matches_torch(stage0_variables):
    """Frozen-BN bottleneck vs a plain-torch eval-mode bottleneck
    (conv1x1-bn-relu, conv3x3-bn-relu, conv1x1-bn, +downsample, relu)."""
    sd, variables = stage0_variables
    pre = 'backbone.layer1.0'

    def conv(x, key, stride=1, pad=0):
        return torch.nn.functional.conv2d(
            x, torch.from_numpy(sd[key]), stride=stride, padding=pad)

    def bn(x, key):
        return torch.nn.functional.batch_norm(
            x, torch.from_numpy(sd[f'{key}.running_mean']),
            torch.from_numpy(sd[f'{key}.running_var']),
            torch.from_numpy(sd[f'{key}.weight']),
            torch.from_numpy(sd[f'{key}.bias']), training=False)

    rng = np.random.RandomState(3)
    x = rng.randn(2, 8, 8, 64).astype(np.float32)
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    y = torch.relu(bn(conv(tx, f'{pre}.conv1.weight'), f'{pre}.bn1'))
    y = torch.relu(bn(conv(y, f'{pre}.conv2.weight', pad=1), f'{pre}.bn2'))
    y = bn(conv(y, f'{pre}.conv3.weight'), f'{pre}.bn3')
    idn = bn(conv(tx, f'{pre}.downsample.0.weight'), f'{pre}.downsample.1')
    ref = torch.relu(y + idn).detach().numpy().transpose(0, 2, 3, 1)

    from mcgaze_tpu.models.resnet import Bottleneck
    p = variables['params']['backbone']['layer1_0']
    st = variables['stats']['backbone']['layer1_0']
    out = Bottleneck(64).apply({'params': p, 'stats': st}, jnp.asarray(x))
    # random weights compound magnitudes over 3 convs; conv accumulation
    # order differs between XLA and oneDNN -> relative tolerance
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=5e-3)


def test_s2d_stem_matches_plain():
    """The opt-in space-to-depth stem (resnet.py::ResNet.s2d_stem) is an
    exact regrouping of the 7x7-stride-2 conv: same conv1/kernel param
    tree, same outputs (up to f32 reassociation)."""
    from mcgaze_tpu.models.resnet import ResNet

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    plain = ResNet(26, dtype=jnp.float32)
    s2d = ResNet(26, dtype=jnp.float32, s2d_stem=True)
    v = plain.init(jax.random.PRNGKey(0), x)
    v2 = s2d.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == \
        jax.tree_util.tree_structure(v2)
    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(v2)):
        assert a.shape == b.shape
    for a, b in zip(plain.apply(v, x), s2d.apply(v, x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-5)
