"""YOLOv5 block-level forward parity vs plain-torch replicas (eval mode):
ConvBlock (conv+BN+SiLU), Bottleneck, C3, SPP, Focus and the v4 anchor
decode — pins the converter layouts the crowdhuman checkpoint relies on."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mcgaze_tpu.models.yolov5 import (C3, SPP, Bottleneck, ConvBlock, Focus,
                                      YoloConfig, convert_torch_yolo,
                                      decode_predictions)

torch.manual_seed(0)


def torch_convbn(x, w, bn_w, bn_b, bn_m, bn_v, stride=1):
    k = w.shape[-1]
    y = torch.nn.functional.conv2d(x, w, stride=stride, padding=k // 2)
    y = torch.nn.functional.batch_norm(y, bn_m, bn_v, bn_w, bn_b,
                                       training=False, eps=1e-3)
    return torch.nn.functional.silu(y)


def make_conv_sd(rng, prefix, cin, cout, k):
    return {
        f'{prefix}.conv.weight': torch.from_numpy(
            rng.randn(cout, cin, k, k).astype(np.float32) * 0.1),
        f'{prefix}.bn.weight': torch.from_numpy(
            rng.rand(cout).astype(np.float32) + 0.5),
        f'{prefix}.bn.bias': torch.from_numpy(
            rng.randn(cout).astype(np.float32) * 0.1),
        f'{prefix}.bn.running_mean': torch.from_numpy(
            rng.randn(cout).astype(np.float32) * 0.1),
        f'{prefix}.bn.running_var': torch.from_numpy(
            rng.rand(cout).astype(np.float32) + 0.5),
    }


def flax_conv_vars(sd, prefix):
    w = sd[f'{prefix}.conv.weight'].numpy()
    return {
        'params': {'conv': {'kernel': w.transpose(2, 3, 1, 0)},
                   'bn': {'scale': sd[f'{prefix}.bn.weight'].numpy(),
                          'bias': sd[f'{prefix}.bn.bias'].numpy()}},
        'batch_stats': {'bn': {
            'mean': sd[f'{prefix}.bn.running_mean'].numpy(),
            'var': sd[f'{prefix}.bn.running_var'].numpy()}},
    }


def test_convblock_matches_torch():
    rng = np.random.RandomState(0)
    sd = make_conv_sd(rng, 'm', 8, 16, 3)
    x = rng.randn(2, 12, 12, 8).astype(np.float32)
    ref = torch_convbn(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                       sd['m.conv.weight'], sd['m.bn.weight'],
                       sd['m.bn.bias'], sd['m.bn.running_mean'],
                       sd['m.bn.running_var'], stride=2)
    out = ConvBlock(16, 3, 2).apply(flax_conv_vars(sd, 'm'),
                                    jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out),
                               ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4)


def test_focus_matches_torch():
    """Focus: torch de-interleaves as [::2,::2], [1::2,::2], [::2,1::2],
    [1::2,1::2] along H,W then 3x3 conv (yolo common.py Focus.forward)."""
    rng = np.random.RandomState(1)
    sd = make_conv_sd(rng, 'f.conv', 12, 16, 3)
    x = rng.randn(1, 8, 8, 3).astype(np.float32)
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    cat = torch.cat([tx[..., ::2, ::2], tx[..., 1::2, ::2],
                     tx[..., ::2, 1::2], tx[..., 1::2, 1::2]], 1)
    ref = torch_convbn(cat, sd['f.conv.conv.weight'],
                       sd['f.conv.bn.weight'], sd['f.conv.bn.bias'],
                       sd['f.conv.bn.running_mean'],
                       sd['f.conv.bn.running_var'])
    # NHWC channel order after space-to-depth differs from NCHW concat:
    # flax concatenates [(0,0),(1,0),(0,1),(1,1)] slices channel-last, so
    # channel groups line up 1:1 with the torch cat order.
    variables = {'params': {'conv': flax_conv_vars(sd, 'f.conv')['params']},
                 'batch_stats': {'conv':
                                 flax_conv_vars(sd, 'f.conv')['batch_stats']}}
    out = Focus(16).apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out),
                               ref.numpy().transpose(0, 2, 3, 1), atol=1e-4)


def _c3_sd(rng, prefix, c, n):
    sd = {}
    c_ = c // 2
    sd.update(make_conv_sd(rng, f'{prefix}.cv1', c, c_, 1))
    sd.update(make_conv_sd(rng, f'{prefix}.cv2', c, c_, 1))
    sd.update(make_conv_sd(rng, f'{prefix}.cv3', c, c, 1))
    for i in range(n):
        sd.update(make_conv_sd(rng, f'{prefix}.m.{i}.cv1', c_, c_, 1))
        sd.update(make_conv_sd(rng, f'{prefix}.m.{i}.cv2', c_, c_, 3))
    return sd


def torch_c3(sd, prefix, x, n, shortcut=True):
    def cb(name, t, stride=1):
        return torch_convbn(t, sd[f'{name}.conv.weight'],
                            sd[f'{name}.bn.weight'], sd[f'{name}.bn.bias'],
                            sd[f'{name}.bn.running_mean'],
                            sd[f'{name}.bn.running_var'], stride)

    a = cb(f'{prefix}.cv1', x)
    b = cb(f'{prefix}.cv2', x)
    for i in range(n):
        y = cb(f'{prefix}.m.{i}.cv2', cb(f'{prefix}.m.{i}.cv1', a))
        a = a + y if shortcut else y
    return cb(f'{prefix}.cv3', torch.cat([a, b], 1))


def test_c3_matches_torch_via_converter():
    """Round-trip THROUGH convert_torch_yolo naming (model.2 = first C3)."""
    rng = np.random.RandomState(2)
    cfg = YoloConfig()
    n = cfg.depth(3)
    c = cfg.width(128)          # 96
    sd = _c3_sd(rng, 'model.2', c, n)
    x = rng.randn(1, 8, 8, c).astype(np.float32)
    ref = torch_c3(sd, 'model.2', torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   n)

    # convert just this block by borrowing the full converter's helpers
    from mcgaze_tpu.models.yolov5 import convert_torch_yolo as _  # noqa
    import mcgaze_tpu.models.yolov5 as y5
    params, stats = {}, {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def get(name):
        return sd[name].numpy()

    for cv in ('cv1', 'cv2', 'cv3'):
        put(params, ['l2', cv, 'conv', 'kernel'],
            get(f'model.2.{cv}.conv.weight').transpose(2, 3, 1, 0))
        put(params, ['l2', cv, 'bn', 'scale'], get(f'model.2.{cv}.bn.weight'))
        put(params, ['l2', cv, 'bn', 'bias'], get(f'model.2.{cv}.bn.bias'))
        put(stats, ['l2', cv, 'bn', 'mean'],
            get(f'model.2.{cv}.bn.running_mean'))
        put(stats, ['l2', cv, 'bn', 'var'],
            get(f'model.2.{cv}.bn.running_var'))
    for i in range(n):
        for cv in ('cv1', 'cv2'):
            put(params, ['l2', f'm{i}', cv, 'conv', 'kernel'],
                get(f'model.2.m.{i}.{cv}.conv.weight').transpose(2, 3, 1, 0))
            put(params, ['l2', f'm{i}', cv, 'bn', 'scale'],
                get(f'model.2.m.{i}.{cv}.bn.weight'))
            put(params, ['l2', f'm{i}', cv, 'bn', 'bias'],
                get(f'model.2.m.{i}.{cv}.bn.bias'))
            put(stats, ['l2', f'm{i}', cv, 'bn', 'mean'],
                get(f'model.2.m.{i}.{cv}.bn.running_mean'))
            put(stats, ['l2', f'm{i}', cv, 'bn', 'var'],
                get(f'model.2.m.{i}.{cv}.bn.running_var'))
    out = C3(c, n).apply({'params': params['l2'],
                          'batch_stats': stats['l2']}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out),
                               ref.numpy().transpose(0, 2, 3, 1), atol=2e-4)


def test_decode_matches_torch_formula():
    """v4 decode: xy=(2s-0.5+grid)*stride, wh=(2s)^2*anchor."""
    cfg = YoloConfig(num_classes=2, img_size=64)
    rng = np.random.RandomState(3)
    maps = [jnp.asarray(rng.randn(1, 8, 8, 3 * 7).astype(np.float32)),
            jnp.asarray(rng.randn(1, 4, 4, 3 * 7).astype(np.float32)),
            jnp.asarray(rng.randn(1, 2, 2, 3 * 7).astype(np.float32))]
    preds = np.asarray(decode_predictions(cfg, maps))
    # check one specific anchor cell on level 1 (stride 16)
    h = w = 4
    yy, xx, a = 2, 3, 1
    raw = np.asarray(maps[1])[0, yy, xx].reshape(3, 7)[a]
    s = 1 / (1 + np.exp(-raw))
    idx = 8 * 8 * 3 + (yy * w + xx) * 3 + a
    np.testing.assert_allclose(preds[0, idx, 0],
                               (s[0] * 2 - 0.5 + xx) * 16, rtol=1e-5)
    np.testing.assert_allclose(preds[0, idx, 1],
                               (s[1] * 2 - 0.5 + yy) * 16, rtol=1e-5)
    np.testing.assert_allclose(preds[0, idx, 2],
                               (s[2] * 2) ** 2 * cfg.anchors[1][a][0],
                               rtol=1e-5)
    np.testing.assert_allclose(preds[0, idx, 4:], s[4:], rtol=1e-5)
