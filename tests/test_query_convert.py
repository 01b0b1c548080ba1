"""Query-family (InstBlink/TeViT) checkpoint converter: a synthetic
state_dict with the fork's module names — including the pre-rewrite
`mask_head` naming that init_detector rewrites to `blink_head`
(apis/inference.py:46) — must fill every leaf of the flax tree with the
right layout."""
import numpy as np
import pytest
import torch

import jax

from mcgaze_tpu.models.query_detector import (QueryDetectorConfig,
                                              init_query_model)
from mcgaze_tpu.utils.torch_convert import convert_query_torch_checkpoint

CFG = QueryDetectorConfig(
    num_stages=2, clip_length=3, num_queries=8, num_classes=5,
    channels=32, ffn_channels=64, num_heads=4, dyn_feat_channels=16,
    with_blink=True, max_per_img=4, max_instances=2, roi_impl='mm')


def query_state_dict(rng, cfg=CFG):
    """Synthetic torch state_dict in the fork's naming (DII-style
    generic heads + BlinkHead, see convert_query_checkpoint_dict)."""
    sd = {}

    def lin(name, i, o, bias=True):
        sd[f'{name}.weight'] = rng.randn(o, i).astype(np.float32)
        if bias:
            sd[f'{name}.bias'] = rng.randn(o).astype(np.float32)

    def ln(name, c):
        sd[f'{name}.weight'] = rng.randn(c).astype(np.float32)
        sd[f'{name}.bias'] = rng.randn(c).astype(np.float32)

    def bn(name, c):
        ln(name, c)
        sd[f'{name}.running_mean'] = rng.randn(c).astype(np.float32)
        sd[f'{name}.running_var'] = np.abs(
            rng.randn(c)).astype(np.float32) + 0.5

    def conv(name, i, o, k, bias=False):
        sd[f'{name}.weight'] = rng.randn(o, i, k, k).astype(np.float32)
        if bias:
            sd[f'{name}.bias'] = rng.randn(o).astype(np.float32)

    conv('backbone.conv1', 3, 64, 7)
    bn('backbone.bn1', 64)
    widths = [(64, 64), (256, 128), (512, 256), (1024, 512)]
    for s, n in enumerate((3, 4, 6, 3)):
        cin, mid = widths[s]
        for i in range(n):
            b = f'backbone.layer{s + 1}.{i}'
            conv(f'{b}.conv1', cin if i == 0 else mid * 4, mid, 1)
            bn(f'{b}.bn1', mid)
            conv(f'{b}.conv2', mid, mid, 3)
            bn(f'{b}.bn2', mid)
            conv(f'{b}.conv3', mid, mid * 4, 1)
            bn(f'{b}.bn3', mid * 4)
            if i == 0:
                conv(f'{b}.downsample.0', cin, mid * 4, 1)
                bn(f'{b}.downsample.1', mid * 4)

    c = cfg.channels
    for i, cin in enumerate((256, 512, 1024, 2048)):
        conv(f'neck.lateral_convs.{i}.conv', cin, c, 1, bias=True)
        conv(f'neck.fpn_convs.{i}.conv', c, c, 3, bias=True)

    sd['rpn_head.init_proposal_bboxes.weight'] = rng.rand(
        cfg.num_queries, 4).astype(np.float32)
    sd['rpn_head.init_proposal_features.weight'] = rng.randn(
        cfg.num_queries, c).astype(np.float32)

    f = cfg.dyn_feat_channels
    for s in range(cfg.num_stages):
        tb = f'roi_head.bbox_head.{s}'
        sd[f'{tb}.attention.attn.in_proj_weight'] = rng.randn(
            3 * c, c).astype(np.float32)
        sd[f'{tb}.attention.attn.in_proj_bias'] = rng.randn(
            3 * c).astype(np.float32)
        lin(f'{tb}.attention.attn.out_proj', c, c)
        ln(f'{tb}.attention_norm', c)
        dc = f'{tb}.instance_interactive_conv'
        lin(f'{dc}.dynamic_layer', c, 2 * c * f)
        ln(f'{dc}.norm_in', f)
        ln(f'{dc}.norm_out', c)
        lin(f'{dc}.fc_layer', cfg.roi_size ** 2 * c, c)
        ln(f'{dc}.fc_norm', c)
        ln(f'{tb}.instance_interactive_conv_norm', c)
        lin(f'{tb}.ffn.layers.0.0', c, cfg.ffn_channels)
        lin(f'{tb}.ffn.layers.1', cfg.ffn_channels, c)
        ln(f'{tb}.ffn_norm', c)
        for i in range(cfg.num_cls_fcs):
            lin(f'{tb}.cls_fcs.{3 * i}', c, c, bias=False)
            ln(f'{tb}.cls_fcs.{3 * i + 1}', c)
        for i in range(cfg.num_reg_fcs):
            lin(f'{tb}.reg_fcs.{3 * i}', c, c, bias=False)
            ln(f'{tb}.reg_fcs.{3 * i + 1}', c)
        lin(f'{tb}.fc_cls', c, cfg.num_classes)
        lin(f'{tb}.fc_reg', c, 4)
        # pre-rewrite `mask_head` naming on purpose (the converter must
        # apply the ('mask_head', 'blink_head') rewrite itself)
        tg = f'roi_head.mask_head.{s}'
        for i in range(2):
            lin(f'{tg}.blink_fcs.{3 * i}', c, c, bias=False)
            ln(f'{tg}.blink_fcs.{3 * i + 1}', c)
        lin(f'{tg}.fc_blink', c, 1)
    return sd


@pytest.fixture(scope='module')
def converted(tmp_path_factory):
    rng = np.random.RandomState(0)
    sd = query_state_dict(rng)
    path = str(tmp_path_factory.mktemp('ckpt') / 'instblink.pth')
    torch.save({'state_dict': {k: torch.from_numpy(v)
                               for k, v in sd.items()}}, path)
    _, variables = init_query_model(CFG, jax.random.PRNGKey(0),
                                    image_size=(64, 64))
    out = convert_query_torch_checkpoint(
        path, variables, num_stages=CFG.num_stages,
        with_blink=CFG.with_blink, num_cls_fcs=CFG.num_cls_fcs,
        num_reg_fcs=CFG.num_reg_fcs)
    return sd, variables, out


def test_every_query_param_leaf_is_overwritten(converted):
    sd, variables, out = converted
    n_same = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            variables['params']):
        node = out['params']
        for p in path:
            node = node[p.key]
        if np.allclose(np.asarray(node), np.asarray(leaf)):
            n_same.append(jax.tree_util.keystr(path))
    assert not n_same, f'leaves not overwritten: {n_same[:10]}'
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            variables['stats']):
        node = out['stats']
        for p in path:
            node = node[p.key]
        assert not np.allclose(np.asarray(node), np.asarray(leaf)), path


def test_blink_and_cls_linear_layouts(converted):
    sd, _, out = converted
    x = np.random.RandomState(1).randn(5, CFG.channels).astype(np.float32)
    # fc_blink came in under the mask_head name
    w = sd['roi_head.mask_head.0.fc_blink.weight']
    b = sd['roi_head.mask_head.0.fc_blink.bias']
    k = np.asarray(out['params']['blink_head_0']['fc_blink']['kernel'])
    jb = np.asarray(out['params']['blink_head_0']['fc_blink']['bias'])
    np.testing.assert_allclose(x @ k + jb, x @ w.T + b,
                               rtol=1e-5, atol=1e-6)
    w = sd['roi_head.bbox_head.1.fc_cls.weight']
    b = sd['roi_head.bbox_head.1.fc_cls.bias']
    k = np.asarray(out['params']['bbox_head_1']['fc_cls']['kernel'])
    jb = np.asarray(out['params']['bbox_head_1']['fc_cls']['bias'])
    np.testing.assert_allclose(x @ k + jb, x @ w.T + b,
                               rtol=1e-5, atol=1e-6)


def test_unknown_stage_count_raises(converted):
    """A config/checkpoint stage mismatch must fail loudly (KeyError on
    the missing stage-2 tensors), not silently half-convert."""
    sd, variables, _ = converted
    from mcgaze_tpu.utils.torch_convert import convert_query_checkpoint_dict
    with pytest.raises(KeyError):
        convert_query_checkpoint_dict(sd, num_stages=3)
