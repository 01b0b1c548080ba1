"""Full-backbone numerical parity of MsgShifT vs a torch replica.

The replica mirrors the fork's module structure exactly
(mmdet/models/backbones/msgshift.py, the shipped `MsgShifT` subclass:
conv-FFN with depthwise 3x3, no abs pos embed, norm after stage,
LN eps 1e-6):
  * PatchEmbed conv + messenger tokens through the spatially-summed
    kernel (msgshift.py:142-147)
  * PVTEncoderLayer: pre-norm SRA over [spatial; messengers] with the
    sr-conv-reduced kv (:307-318, packed torch MultiheadAttention),
    pre-norm conv-FFN with the messenger summed-kernel path (:225-229),
    residuals on the pre-norm concatenation (:427-433)
  * messenger-token roll across frames, sign alternating per layer,
    last layer of an odd-depth stage unshifted (:435-441, :677-684)
  * after-stage LayerNorm on both token sets (:745)

Weights flow through convert_msgshift_backbone from a synthetic
reference-named state_dict, proving the converter layout
(packed in_proj, conv kernel transpose, depthwise kernel) end-to-end.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from mcgaze_tpu.models.msgshift import MsgShifT
from mcgaze_tpu.utils.torch_convert import convert_msgshift_backbone

# tiny two-stage variant: stage 0 even-depth (both shift directions),
# stage 1 odd-depth (last layer unshifted) + sr_ratio 1 (kv = spatial
# tokens only) — exercises every branch of the forward
B, T = 1, 2
M = 4
SHIFT = (1, -1)
EMBED = 8
DEPTHS = (2, 1)
HEADS = (1, 2)
PATCH = (7, 3)
STRIDES = (4, 2)
PADS = (3, 1)
SR = (2, 1)
MLP = (2, 2)
IMG = 16
CHS = tuple(EMBED * h for h in HEADS)


def msgshift_state_dict(rng):
    sd = {}

    def lin(name, i, o):
        sd[f'{name}.weight'] = (rng.randn(o, i) * 0.3).astype(np.float32)
        sd[f'{name}.bias'] = (rng.randn(o) * 0.1).astype(np.float32)

    def ln(name, c):
        sd[f'{name}.weight'] = (1.0 + 0.1 * rng.randn(c)).astype(np.float32)
        sd[f'{name}.bias'] = (0.1 * rng.randn(c)).astype(np.float32)

    def conv(name, i, o, k, groups=1):
        sd[f'{name}.weight'] = (rng.randn(o, i // groups, k, k)
                                * 0.3).astype(np.float32)
        sd[f'{name}.bias'] = (rng.randn(o) * 0.1).astype(np.float32)

    sd['backbone.msg_tokens'] = (rng.randn(1, M, 3)
                                 * 0.02).astype(np.float32)
    in_c = 3
    for i, depth in enumerate(DEPTHS):
        ch = CHS[i]
        conv(f'backbone.layers.{i}.0.projection', in_c, ch, PATCH[i])
        ln(f'backbone.layers.{i}.0.norm', ch)
        for lid in range(depth):
            tl = f'backbone.layers.{i}.1.{lid}'
            ln(f'{tl}.norm1', ch)
            sd[f'{tl}.attn.attn.in_proj_weight'] = (
                rng.randn(3 * ch, ch) * 0.3).astype(np.float32)
            sd[f'{tl}.attn.attn.in_proj_bias'] = (
                rng.randn(3 * ch) * 0.1).astype(np.float32)
            lin(f'{tl}.attn.attn.out_proj', ch, ch)
            if SR[i] > 1:
                conv(f'{tl}.attn.sr', ch, ch, SR[i])
                ln(f'{tl}.attn.norm', ch)
            ln(f'{tl}.norm2', ch)
            hidden = MLP[i] * ch
            conv(f'{tl}.ffn.layers.0', ch, hidden, 1)
            conv(f'{tl}.ffn.layers.1', hidden, hidden, 3, groups=hidden)
            conv(f'{tl}.ffn.layers.4', hidden, ch, 1)
        ln(f'backbone.layers.{i}.2', ch)
        in_c = ch
    return sd


def t_ln(sd, p, x):
    return tF.layer_norm(x, (x.shape[-1],),
                         torch.from_numpy(sd[f'{p}.weight']),
                         torch.from_numpy(sd[f'{p}.bias']), eps=1e-6)


def t_mha(sd, p, q, kv, heads):
    e = q.shape[-1]
    mha = torch.nn.MultiheadAttention(e, heads, batch_first=True)
    with torch.no_grad():
        mha.in_proj_weight.copy_(torch.from_numpy(sd[f'{p}.in_proj_weight']))
        mha.in_proj_bias.copy_(torch.from_numpy(sd[f'{p}.in_proj_bias']))
        mha.out_proj.weight.copy_(
            torch.from_numpy(sd[f'{p}.out_proj.weight']))
        mha.out_proj.bias.copy_(torch.from_numpy(sd[f'{p}.out_proj.bias']))
    mha.eval()
    return mha(q, kv, kv, need_weights=False)[0]


def torch_msgshift(sd, x):
    """x (B*T, 3, H, W) -> list of (B*T, C, h, w) pyramid levels."""
    n = x.shape[0]
    msg = torch.from_numpy(sd['backbone.msg_tokens']).repeat(n, 1, 1)
    outs = []
    for i, depth in enumerate(DEPTHS):
        ch = CHS[i]
        pe = f'backbone.layers.{i}.0'
        w = torch.from_numpy(sd[f'{pe}.projection.weight'])
        b = torch.from_numpy(sd[f'{pe}.projection.bias'])
        x = tF.conv2d(x, w, b, stride=STRIDES[i], padding=PADS[i])
        msg = msg @ w.sum((-1, -2)).T + b
        h, wd = x.shape[2], x.shape[3]
        x = x.flatten(2).transpose(1, 2)
        x = t_ln(sd, f'{pe}.norm', x)
        msg = t_ln(sd, f'{pe}.norm', msg)
        for lid in range(depth):
            tl = f'backbone.layers.{i}.1.{lid}'
            xa = t_ln(sd, f'{tl}.norm1', x)
            ma = t_ln(sd, f'{tl}.norm1', msg)
            q = torch.cat([xa, ma], 1)
            if SR[i] > 1:
                srw = torch.from_numpy(sd[f'{tl}.attn.sr.weight'])
                srb = torch.from_numpy(sd[f'{tl}.attn.sr.bias'])
                kv_sp = tF.conv2d(
                    xa.transpose(1, 2).reshape(n, ch, h, wd),
                    srw, srb, stride=SR[i]).flatten(2).transpose(1, 2)
                kv_m = ma @ srw.sum((-1, -2)).T + srb
                kv = t_ln(sd, f'{tl}.attn.norm',
                          torch.cat([kv_sp, kv_m], 1))
            else:
                kv = xa
            o = torch.cat([x, msg], 1) + t_mha(
                sd, f'{tl}.attn.attn', q, kv, HEADS[i])
            x, msg = o[:, :-M], o[:, -M:]

            xf = t_ln(sd, f'{tl}.norm2', x)
            mf = t_ln(sd, f'{tl}.norm2', msg)
            f1w = torch.from_numpy(sd[f'{tl}.ffn.layers.0.weight'])
            f1b = torch.from_numpy(sd[f'{tl}.ffn.layers.0.bias'])
            dww = torch.from_numpy(sd[f'{tl}.ffn.layers.1.weight'])
            dwb = torch.from_numpy(sd[f'{tl}.ffn.layers.1.bias'])
            f2w = torch.from_numpy(sd[f'{tl}.ffn.layers.4.weight'])
            f2b = torch.from_numpy(sd[f'{tl}.ffn.layers.4.bias'])
            y = tF.conv2d(xf.transpose(1, 2).reshape(n, ch, h, wd),
                          f1w, f1b)
            y = tF.conv2d(y, dww, dwb, padding=1, groups=dww.shape[0])
            y = tF.gelu(y)
            y = tF.conv2d(y, f2w, f2b).flatten(2).transpose(1, 2)
            x = x + y
            m2 = mf @ f1w.sum((-1, -2)).T + f1b
            m2 = m2 * dww.sum((-1, -2, -3)) + dwb
            m2 = tF.gelu(m2)
            m2 = m2 @ f2w.sum((-1, -2)).T + f2b
            msg = msg + m2

            # messenger shift (msgshift.py:435-441, :677-684)
            if not (lid == depth - 1 and depth % 2 == 1):
                strides = (SHIFT if lid % 2 == 0
                           else tuple(-s for s in SHIFT))
                g = msg.reshape(B, T, M, ch).chunk(len(strides), dim=2)
                g = [torch.roll(t_, r, dims=1)
                     for t_, r in zip(g, strides)]
                msg = torch.cat(g, dim=2).flatten(0, 1)
        x = t_ln(sd, f'backbone.layers.{i}.2', x)
        msg = t_ln(sd, f'backbone.layers.{i}.2', msg)
        x = x.transpose(1, 2).reshape(n, ch, h, wd)
        outs.append(x)
    return outs


@pytest.fixture(scope='module')
def parity_pair():
    rng = np.random.RandomState(0)
    sd = msgshift_state_dict(rng)
    params = {}
    convert_msgshift_backbone(params, sd)

    model = MsgShifT(num_msg_tokens=M, shift_strides=SHIFT,
                     embed_dim=EMBED, num_layers=DEPTHS, num_heads=HEADS,
                     patch_sizes=PATCH, strides=STRIDES, paddings=PADS,
                     sr_ratios=SR, mlp_ratios=MLP)
    # shape-check the converted tree against a real init
    init = jax.jit(model.init, static_argnames=('clip_length',))(
        jax.random.PRNGKey(0),
        jnp.zeros((B * T, IMG, IMG, 3), jnp.float32), clip_length=T)
    flat_init = jax.tree_util.tree_leaves_with_path(init['params'])
    flat_conv = jax.tree_util.tree_leaves_with_path(
        {'backbone': params['backbone']} if 'backbone' in params
        else params)
    return sd, model, params['backbone'], {
        jax.tree_util.keystr(k): v.shape for k, v in flat_init}, {
        jax.tree_util.keystr(k): v.shape for k, v in flat_conv}


def test_converter_covers_every_leaf(parity_pair):
    _, _, _, init_shapes, conv_shapes = parity_pair
    conv_shapes = {k.replace("['backbone']", ''): v
                   for k, v in conv_shapes.items()}
    assert conv_shapes == init_shapes


def test_msgshift_matches_torch(parity_pair):
    sd, model, params, _, _ = parity_pair
    rng = np.random.RandomState(1)
    x = rng.randn(B * T, IMG, IMG, 3).astype(np.float32)

    ref = torch_msgshift(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    outs = model.apply({'params': params}, jnp.asarray(x), clip_length=T)

    assert len(outs) == len(ref)
    for lvl, (j, t) in enumerate(zip(outs, ref)):
        np.testing.assert_allclose(
            np.asarray(j), t.detach().numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4, err_msg=f'level {lvl}')
