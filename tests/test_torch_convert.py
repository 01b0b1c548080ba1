"""Checkpoint converter tests: a synthetic state_dict with the reference's
exact module names must fill EVERY leaf of the flax tree, and converted
sub-modules must be numerically equivalent to torch recomputation."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mcgaze_tpu.models.mcgaze import ModelConfig, init_model
from mcgaze_tpu.utils.torch_convert import (convert_mcgaze_checkpoint_dict,
                                            convert_torch_checkpoint,
                                            convert_torchvision_resnet)


def reference_state_dict(rng, num_stages=4):
    """Synthetic state_dict with the names the reference checkpoints use
    (mmdet MultiClueGaze; see gaze_stqi_head.py / gaze_head.py)."""
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

    def conv(name, i, o, k):
        sd[f'{name}.weight'] = rng.randn(o, i, k, k).astype(np.float32)

    # backbone (resnet50)
    conv('backbone.conv1', 3, 64, 7)
    bn('backbone.bn1', 64)
    widths = [(64, 64), (256, 128), (512, 256), (1024, 512)]
    blocks = (3, 4, 6, 3)
    for s, n in enumerate(blocks):
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

    # neck
    for i, cin in enumerate((256, 512, 1024, 2048)):
        conv(f'neck.lateral_convs.{i}.conv', cin, 256, 1)
        sd[f'neck.lateral_convs.{i}.conv.bias'] = rng.randn(256).astype(
            np.float32)
        conv(f'neck.fpn_convs.{i}.conv', 256, 256, 3)
        sd[f'neck.fpn_convs.{i}.conv.bias'] = rng.randn(256).astype(
            np.float32)

    sd['rpn_head.init_proposal_bboxes.weight'] = rng.rand(3, 4).astype(
        np.float32)
    sd['rpn_head.init_proposal_features.weight'] = rng.randn(3, 256).astype(
        np.float32)

    for s in range(num_stages):
        tb = f'roi_head.bbox_head.{s}'
        sd[f'{tb}.attention.attn.in_proj_weight'] = rng.randn(
            768, 256).astype(np.float32)
        sd[f'{tb}.attention.attn.in_proj_bias'] = rng.randn(768).astype(
            np.float32)
        lin(f'{tb}.attention.attn.out_proj', 256, 256)
        ln(f'{tb}.attention_norm', 256)
        dc = f'{tb}.instance_interactive_conv'
        lin(f'{dc}.dynamic_layer', 256, 2 * 256 * 64)
        ln(f'{dc}.norm_in', 64)
        ln(f'{dc}.norm_out', 256)
        lin(f'{dc}.fc_layer', 49 * 256, 256)
        ln(f'{dc}.fc_norm', 256)
        ln(f'{tb}.instance_interactive_conv_norm', 256)
        lin(f'{tb}.ffn.layers.0.0', 256, 2048)
        lin(f'{tb}.ffn.layers.1', 2048, 256)
        ln(f'{tb}.ffn_norm', 256)
        lin(f'{tb}.cls_fcs.0', 256, 256, bias=False)
        ln(f'{tb}.cls_fcs.1', 256)
        for i in range(3):
            lin(f'{tb}.reg_fcs.{3 * i}', 256, 256, bias=False)
            ln(f'{tb}.reg_fcs.{3 * i + 1}', 256)
        for clue in ('face', 'eyes', 'head'):
            lin(f'{tb}.{clue}_fc_cls', 256, 1)
            lin(f'{tb}.{clue}_fc_reg', 256, 4)
        tg = f'roi_head.gaze_head.{s}'
        for clue in ('face', 'eyes', 'head'):
            for i in range(2):
                lin(f'{tg}.gaze_{clue}_fcs.{3 * i}', 256, 256, bias=False)
                ln(f'{tg}.gaze_{clue}_fcs.{3 * i + 1}', 256)
                lin(f'{tg}.gaze_{clue}_confidence.{3 * i}', 256, 256,
                    bias=False)
                ln(f'{tg}.gaze_{clue}_confidence.{3 * i + 1}', 256)
            lin(f'{tg}.fc_{clue}', 256, 3)
            lin(f'{tg}.fc_{clue}_confidence', 256, 3)
        lin(f'{tg}.fc_gaze', 9, 3)
    return sd


@pytest.fixture(scope='module')
def converted(tmp_path_factory):
    rng = np.random.RandomState(0)
    sd = reference_state_dict(rng)
    path = str(tmp_path_factory.mktemp('ckpt') / 'ref.pth')
    torch.save({'state_dict': {k: torch.from_numpy(v)
                               for k, v in sd.items()}}, path)
    cfg = ModelConfig()
    _, variables = init_model(cfg, jax.random.PRNGKey(0),
                              image_size=(64, 64))
    out = convert_torch_checkpoint(path, variables)
    return sd, variables, out


def test_every_param_leaf_is_overwritten(converted):
    sd, variables, out = converted
    # count torch tensors vs converted leaves: every torch entry must have
    # landed somewhere, and no init leaf may survive unchanged
    before = jax.tree_util.tree_leaves_with_path(variables['params'])
    after_tree = out['params']

    n_same = []
    for path, leaf in before:
        node = after_tree
        for p in path:
            node = node[p.key]
        if np.allclose(np.asarray(node), np.asarray(leaf)):
            n_same.append(jax.tree_util.keystr(path))
    assert not n_same, f'leaves not overwritten: {n_same[:10]}'

    # stats too
    before = jax.tree_util.tree_leaves_with_path(variables['stats'])
    for path, leaf in before:
        node = out['stats']
        for p in path:
            node = node[p.key]
        assert not np.allclose(np.asarray(node), np.asarray(leaf)), path


def test_linear_layout_roundtrip(converted):
    sd, _, out = converted
    w = sd['roi_head.gaze_head.0.fc_gaze.weight']      # (3, 9) torch
    k = np.asarray(out['params']['gaze_head_0']['fc_gaze']['kernel'])
    x = np.random.RandomState(1).randn(5, 9).astype(np.float32)
    ref = x @ w.T + sd['roi_head.gaze_head.0.fc_gaze.bias']
    ours = x @ k + np.asarray(
        out['params']['gaze_head_0']['fc_gaze']['bias'])
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_torchvision_backbone_convert(converted):
    sd, variables, _ = converted
    tv_sd = {k[len('backbone.'):]: v for k, v in sd.items()
             if k.startswith('backbone.')}
    out = convert_torchvision_resnet(tv_sd, variables)
    k = np.asarray(out['params']['backbone']['conv1']['kernel'])
    assert k.shape == (7, 7, 3, 64)
    np.testing.assert_allclose(
        k, np.transpose(tv_sd['conv1.weight'], (2, 3, 1, 0)))


def test_messy_checkpoint_reports_unexpected_keys(tmp_path):
    """A reference-shaped .pth that ALSO carries optimizer state, mmcv
    EMAHook shadow buffers (ema_<name> with dots->underscores), and an
    unknown aux tensor must convert to exactly the clean conversion,
    with the extras named in a warning — mirroring load_checkpoint's
    unexpected-keys tolerance (apis/inference.py:46). BN
    num_batches_tracked and the dead BBoxHead fc_cls/fc_reg defaults
    (key-surface lock, test_reference_model_oracle.py) stay silent."""
    import warnings

    import torch

    from mcgaze_tpu.models.mcgaze import ModelConfig, init_model
    from mcgaze_tpu.utils.torch_convert import convert_torch_checkpoint

    rng = np.random.RandomState(5)
    sd = reference_state_dict(rng)
    _, variables = init_model(ModelConfig(), jax.random.PRNGKey(0),
                              image_size=(64, 64))
    clean_path = str(tmp_path / 'clean.pth')
    torch.save({'state_dict': {k: torch.from_numpy(v)
                               for k, v in sd.items()}}, clean_path)
    with warnings.catch_warnings():
        warnings.simplefilter('error')      # clean ckpt must NOT warn
        clean = convert_torch_checkpoint(clean_path, variables)

    messy = {k: torch.from_numpy(v) for k, v in sd.items()}
    # mmcv EMAHook registers shadow buffers named ema_<param with . -> _>
    for k, v in list(sd.items())[:6]:
        messy['ema_' + k.replace('.', '_')] = torch.from_numpy(v.copy())
    # silent extras: BN bookkeeping + the dead BBoxHead default heads
    messy['backbone.bn1.num_batches_tracked'] = torch.tensor(7000)
    messy['roi_head.bbox_head.0.fc_cls.weight'] = torch.zeros(2, 12544)
    messy['roi_head.bbox_head.0.fc_cls.bias'] = torch.zeros(2)
    messy['aux_head.fc.weight'] = torch.zeros(3, 3)
    messy_path = str(tmp_path / 'messy.pth')
    torch.save({'state_dict': messy,
                'optimizer': {'state': {}, 'param_groups': []},
                'meta': {'epoch': 1}}, messy_path)

    with pytest.warns(UserWarning, match='no counterpart') as rec:
        converted = convert_torch_checkpoint(messy_path, variables)
    msg = '\n'.join(str(w.message) for w in rec)
    assert 'aux_head.fc.weight' in msg
    assert 'ema_' in msg
    assert 'num_batches_tracked' not in msg
    assert 'fc_cls' not in msg

    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), clean, converted)
