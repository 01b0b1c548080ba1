"""Torch (mmdet/torchvision) checkpoint -> mcgaze_tpu variables.

Maps the reference's state_dict names (mmdet MultiClueGaze modules; see
mmdet/models/roi_heads/bbox_heads/gaze_stqi_head.py and
mask_heads/gaze_head.py for the layer definitions) onto this package's
flax param tree. Layout conventions:
  * torch Linear weight (out, in)    -> Dense kernel (in, out): transpose
  * torch Conv weight  (O, I, H, W)  -> flax Conv kernel (H, W, I, O)
  * BatchNorm running_mean/var       -> 'stats' collection
  * torch MHA in_proj/out_proj       -> attention/qkv + attention/out

Also understands plain torchvision resnet50 state_dicts (for the
`torchvision://resnet50` pretrained init of the reference config) via
`convert_torchvision_resnet`.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _t(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(w):
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _set(tree: Dict, path: str, value):
    keys = path.split('/')
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _bn(params, stats, jx, tk, sd):
    _set(params, f'{jx}/scale', np.asarray(sd[f'{tk}.weight']))
    _set(params, f'{jx}/bias', np.asarray(sd[f'{tk}.bias']))
    _set(stats, f'{jx}/mean', np.asarray(sd[f'{tk}.running_mean']))
    _set(stats, f'{jx}/var', np.asarray(sd[f'{tk}.running_var']))


def _linear(params, jx, tk, sd, transpose=True):
    _set(params, f'{jx}/kernel',
         _t(sd[f'{tk}.weight']) if transpose else np.asarray(
             sd[f'{tk}.weight']))
    if f'{tk}.bias' in sd:
        _set(params, f'{jx}/bias', np.asarray(sd[f'{tk}.bias']))


def _ln(params, jx, tk, sd):
    _set(params, f'{jx}/scale', np.asarray(sd[f'{tk}.weight']))
    _set(params, f'{jx}/bias', np.asarray(sd[f'{tk}.bias']))


def convert_backbone(params, stats, sd, prefix='backbone.'):
    """mmdet/torchvision resnet names -> backbone/* tree.

    Block counts are read off the state_dict itself (count of
    layerN.i.conv1 keys), so any bottleneck depth (26/50/101/152)
    converts fully — a hardcoded depth table silently half-converted
    non-r50 checkpoints (round-3 review finding)."""
    _set(params, 'backbone/conv1/kernel', _conv(sd[prefix + 'conv1.weight']))
    _bn(params, stats, 'backbone/bn1', prefix + 'bn1', sd)

    def stage_blocks(s):
        n = 0
        while f'{prefix}layer{s + 1}.{n}.conv1.weight' in sd:
            n += 1
        return n

    blocks = tuple(stage_blocks(s) for s in range(4))
    assert all(blocks), f'no resnet blocks found under {prefix!r}: {blocks}'
    for s, n in enumerate(blocks):
        for i in range(n):
            tb = f'{prefix}layer{s + 1}.{i}'
            jb = f'backbone/layer{s + 1}_{i}'
            for j in (1, 2, 3):
                _set(params, f'{jb}/conv{j}/kernel',
                     _conv(sd[f'{tb}.conv{j}.weight']))
                _bn(params, stats, f'{jb}/bn{j}', f'{tb}.bn{j}', sd)
            if f'{tb}.downsample.0.weight' in sd:
                _set(params, f'{jb}/downsample_conv/kernel',
                     _conv(sd[f'{tb}.downsample.0.weight']))
                _bn(params, stats, f'{jb}/downsample_bn',
                    f'{tb}.downsample.1', sd)


def _mlp_tower(params, jx, tk_list, sd):
    """tk_list: [(linear_key, ln_key), ...] per layer."""
    for i, (lin, ln) in enumerate(tk_list):
        _linear(params, f'{jx}/fc{i}', lin, sd)
        _ln(params, f'{jx}/ln{i}', ln, sd)


class _TrackedDict(dict):
    """dict recording which keys a converter actually read, so extra
    checkpoint tensors (optimizer moments, EMA shadows, aux heads) are
    REPORTED instead of silently ignored — the analogue of mmcv
    load_checkpoint's unexpected-keys log (apis/inference.py:46 loads
    with revise_keys tolerance but still prints the leftovers)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.consumed = set()

    def __getitem__(self, key):
        self.consumed.add(key)
        return super().__getitem__(key)

    # converters must read via sd[key] for tracking; cover the other
    # read paths so a future converter using .get()/.pop() doesn't
    # trigger false 'unexpected checkpoint tensors' warnings
    def get(self, key, default=None):
        if key in self:
            self.consumed.add(key)
        return super().get(key, default)

    def pop(self, key, *default):
        if key in self:
            self.consumed.add(key)
        return super().pop(key, *default)


def _warn_unexpected(sd: '_TrackedDict', benign, what: str):
    """Warn (never raise) about unconsumed checkpoint keys; `benign`
    is a predicate for keys that are expected to be extra."""
    leftovers = sorted(k for k in sd
                       if k not in sd.consumed and not benign(k))
    if leftovers:
        import warnings
        warnings.warn(
            f'{what}: {len(leftovers)} checkpoint tensors have no '
            f'counterpart in this model and were ignored '
            f'(load proceeds, mmcv load_checkpoint tolerance): '
            f'{leftovers[:8]}{"..." if len(leftovers) > 8 else ""}')
    return leftovers


def convert_mcgaze_checkpoint_dict(sd: dict, num_stages: int = 4) -> dict:
    """Full MCGaze .pth state_dict -> {'params':..., 'stats':...} nested
    dicts of numpy arrays (caller merges into init shapes)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    sd = _TrackedDict({k[len('module.'):] if k.startswith('module.')
                       else k: v for k, v in sd.items()})

    convert_backbone(params, stats, sd)

    for i in range(4):
        _set(params, f'neck/lateral_{i}/kernel',
             _conv(sd[f'neck.lateral_convs.{i}.conv.weight']))
        _set(params, f'neck/lateral_{i}/bias',
             np.asarray(sd[f'neck.lateral_convs.{i}.conv.bias']))
        _set(params, f'neck/fpn_{i}/kernel',
             _conv(sd[f'neck.fpn_convs.{i}.conv.weight']))
        _set(params, f'neck/fpn_{i}/bias',
             np.asarray(sd[f'neck.fpn_convs.{i}.conv.bias']))

    _set(params, 'init_proposal_bboxes',
         np.asarray(sd['rpn_head.init_proposal_bboxes.weight']))
    _set(params, 'init_proposal_features',
         np.asarray(sd['rpn_head.init_proposal_features.weight']))

    for s in range(num_stages):
        tb = f'roi_head.bbox_head.{s}'
        jb = f'bbox_head_{s}'
        # attention (mmcv wraps torch MHA as `.attn`), DynamicConv, FFN,
        # cls/reg towers — shared with the query family (_stage_common)
        _stage_common(params, sd, tb, jb, num_cls_fcs=1, num_reg_fcs=3)
        for clue in ('face', 'eyes', 'head'):
            _linear(params, f'{jb}/{clue}_fc_cls', f'{tb}.{clue}_fc_cls', sd)
            _linear(params, f'{jb}/{clue}_fc_reg', f'{tb}.{clue}_fc_reg', sd)

        tg = f'roi_head.gaze_head.{s}'
        jg = f'gaze_head_{s}'
        for clue in ('face', 'eyes', 'head'):
            _mlp_tower(params, f'{jg}/gaze_{clue}_fcs',
                       [(f'{tg}.gaze_{clue}_fcs.{3 * i}',
                         f'{tg}.gaze_{clue}_fcs.{3 * i + 1}')
                        for i in range(2)], sd)
            _mlp_tower(params, f'{jg}/gaze_{clue}_confidence',
                       [(f'{tg}.gaze_{clue}_confidence.{3 * i}',
                         f'{tg}.gaze_{clue}_confidence.{3 * i + 1}')
                        for i in range(2)], sd)
            _linear(params, f'{jg}/fc_{clue}', f'{tg}.fc_{clue}', sd)
            _linear(params, f'{jg}/fc_{clue}_confidence',
                    f'{tg}.fc_{clue}_confidence', sd)
        _linear(params, f'{jg}/fc_gaze', f'{tg}.fc_gaze', sd)

    def benign(k):
        # BN bookkeeping; and BBoxHead's dead default heads, proven
        # never read by GazeSTQIHead.forward (the reference-model
        # oracle's key-surface lock,
        # tests/test_reference_model_oracle.py::ref_model)
        return (k.endswith('num_batches_tracked')
                or (k.startswith('roi_head.bbox_head.')
                    and ('.fc_cls.' in k or '.fc_reg.' in k)))

    _warn_unexpected(sd, benign, 'convert_mcgaze_checkpoint_dict')
    return dict(params=params, stats=stats)


def _stage_common(params, sd, tb, jb, num_cls_fcs, num_reg_fcs):
    """The per-stage layers shared by the gaze STQIHead and the generic
    query-family head: attention, DynamicConv, FFN, cls/reg towers
    (stqi_head.py:40-82 ~ gaze_stqi_head.py:119-201)."""
    _set(params, f'{jb}/attention/qkv/kernel',
         _t(sd[f'{tb}.attention.attn.in_proj_weight']))
    _set(params, f'{jb}/attention/qkv/bias',
         np.asarray(sd[f'{tb}.attention.attn.in_proj_bias']))
    _linear(params, f'{jb}/attention/out',
            f'{tb}.attention.attn.out_proj', sd)
    _ln(params, f'{jb}/attention_norm', f'{tb}.attention_norm', sd)

    dc = f'{tb}.instance_interactive_conv'
    jdc = f'{jb}/instance_interactive_conv'
    _linear(params, f'{jdc}/dynamic_layer', f'{dc}.dynamic_layer', sd)
    _ln(params, f'{jdc}/norm_in', f'{dc}.norm_in', sd)
    _ln(params, f'{jdc}/norm_out', f'{dc}.norm_out', sd)
    _linear(params, f'{jdc}/fc_layer', f'{dc}.fc_layer', sd)
    _ln(params, f'{jdc}/fc_norm', f'{dc}.fc_norm', sd)
    _ln(params, f'{jb}/iic_norm',
        f'{tb}.instance_interactive_conv_norm', sd)

    _linear(params, f'{jb}/ffn_fc1', f'{tb}.ffn.layers.0.0', sd)
    _linear(params, f'{jb}/ffn_fc2', f'{tb}.ffn.layers.1', sd)
    _ln(params, f'{jb}/ffn_norm', f'{tb}.ffn_norm', sd)

    _mlp_tower(params, f'{jb}/cls_tower',
               [(f'{tb}.cls_fcs.{3 * i}', f'{tb}.cls_fcs.{3 * i + 1}')
                for i in range(num_cls_fcs)], sd)
    _mlp_tower(params, f'{jb}/reg_tower',
               [(f'{tb}.reg_fcs.{3 * i}', f'{tb}.reg_fcs.{3 * i + 1}')
                for i in range(num_reg_fcs)], sd)


def convert_msgshift_backbone(params, sd, prefix='backbone.'):
    """TeViT MsgShifT state_dict names -> backbone/* tree.

    Structure is read off the state dict itself (stage/layer counts, sr
    presence), matching the fork's module layout
    (mmdet/models/backbones/msgshift.py): per stage i,
    `layers.{i}.0` PatchEmbed (projection conv + norm), `layers.{i}.1.{l}`
    PVTEncoderLayers (norm1; attn.attn packed torch MHA; attn.sr conv +
    attn.norm when sr_ratio > 1; norm2; conv-FFN layers 0=fc1 1x1,
    1=depthwise 3x3, 4=fc2 1x1), `layers.{i}.2` after-stage norm; plus
    the learned `msg_tokens` (1, M, 3)."""
    _set(params, 'backbone/msg_tokens',
         np.asarray(sd[prefix + 'msg_tokens']))
    i = 0
    while f'{prefix}layers.{i}.0.projection.weight' in sd:
        pe = f'{prefix}layers.{i}.0'
        _set(params, f'backbone/patch_embed{i}/proj/kernel',
             _conv(sd[f'{pe}.projection.weight']))
        _set(params, f'backbone/patch_embed{i}/proj/bias',
             np.asarray(sd[f'{pe}.projection.bias']))
        _ln(params, f'backbone/patch_embed{i}/norm', f'{pe}.norm', sd)
        lid = 0
        while f'{prefix}layers.{i}.1.{lid}.norm1.weight' in sd:
            tl = f'{prefix}layers.{i}.1.{lid}'
            jl = f'backbone/stage{i}_layer{lid}'
            _ln(params, f'{jl}/norm1', f'{tl}.norm1', sd)
            _set(params, f'{jl}/attn/attn/qkv/kernel',
                 _t(sd[f'{tl}.attn.attn.in_proj_weight']))
            _set(params, f'{jl}/attn/attn/qkv/bias',
                 np.asarray(sd[f'{tl}.attn.attn.in_proj_bias']))
            _linear(params, f'{jl}/attn/attn/out',
                    f'{tl}.attn.attn.out_proj', sd)
            if f'{tl}.attn.sr.weight' in sd:
                _set(params, f'{jl}/attn/sr/kernel',
                     _conv(sd[f'{tl}.attn.sr.weight']))
                _set(params, f'{jl}/attn/sr/bias',
                     np.asarray(sd[f'{tl}.attn.sr.bias']))
                _ln(params, f'{jl}/attn/sr_norm', f'{tl}.attn.norm', sd)
            _ln(params, f'{jl}/norm2', f'{tl}.norm2', sd)
            for jname, tidx in (('fc1', 0), ('dw', 1), ('fc2', 4)):
                _set(params, f'{jl}/ffn/{jname}/kernel',
                     _conv(sd[f'{tl}.ffn.layers.{tidx}.weight']))
                _set(params, f'{jl}/ffn/{jname}/bias',
                     np.asarray(sd[f'{tl}.ffn.layers.{tidx}.bias']))
            lid += 1
        assert lid, f'msgshift stage {i} has no encoder layers'
        _ln(params, f'backbone/stage{i}_norm', f'{prefix}layers.{i}.2', sd)
        i += 1
    assert i, f'no msgshift stages found under {prefix!r}'


def convert_query_checkpoint_dict(sd: dict, num_stages: int = 6,
                                  with_blink: bool = True,
                                  num_cls_fcs: int = 1,
                                  num_reg_fcs: int = 3,
                                  backbone: str = 'resnet50') -> dict:
    """InstBlink / TeViT .pth state_dict -> query-detector variables.

    The reference ships no configs or checkpoints for these families, so
    the expected torch naming is read off the fork's module definitions:
    the generic DII-style heads (fc_cls -> num_classes, fc_reg -> 4 with
    cls_fcs/reg_fcs towers — the commented originals the rewritten
    stqi_head.py descends from), EmbeddingRPNHead proposals, and
    BlinkHead's `blink_fcs` 2x(bias-free Linear + LN) + `fc_blink`
    (blink_head.py:59-64 — bias-free Linears map exactly because flax
    Dense bias init is zeros). Accepts checkpoints that still carry the
    pre-rewrite `mask_head` naming: init_detector rewrites
    ('mask_head', 'blink_head') on load (apis/inference.py:46), and so
    does this converter. backbone='msgshift' reads the TeViT MsgShifT
    layout instead of resnet (convert_msgshift_backbone).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    sd = {k[len('module.'):] if k.startswith('module.') else k: v
          for k, v in sd.items()}
    sd = _TrackedDict({k.replace('mask_head', 'blink_head'): v
                       for k, v in sd.items()})

    if backbone == 'msgshift':
        convert_msgshift_backbone(params, sd)
    else:
        convert_backbone(params, stats, sd)
    for i in range(4):
        _set(params, f'neck/lateral_{i}/kernel',
             _conv(sd[f'neck.lateral_convs.{i}.conv.weight']))
        _set(params, f'neck/lateral_{i}/bias',
             np.asarray(sd[f'neck.lateral_convs.{i}.conv.bias']))
        _set(params, f'neck/fpn_{i}/kernel',
             _conv(sd[f'neck.fpn_convs.{i}.conv.weight']))
        _set(params, f'neck/fpn_{i}/bias',
             np.asarray(sd[f'neck.fpn_convs.{i}.conv.bias']))

    _set(params, 'init_proposal_bboxes',
         np.asarray(sd['rpn_head.init_proposal_bboxes.weight']))
    _set(params, 'init_proposal_features',
         np.asarray(sd['rpn_head.init_proposal_features.weight']))

    for s in range(num_stages):
        tb = f'roi_head.bbox_head.{s}'
        jb = f'bbox_head_{s}'
        _stage_common(params, sd, tb, jb, num_cls_fcs, num_reg_fcs)
        _linear(params, f'{jb}/fc_cls', f'{tb}.fc_cls', sd)
        _linear(params, f'{jb}/fc_reg', f'{tb}.fc_reg', sd)
        if with_blink:
            tg = f'roi_head.blink_head.{s}'
            jg = f'blink_head_{s}'
            _mlp_tower(params, f'{jg}/blink_tower',
                       [(f'{tg}.blink_fcs.{3 * i}',
                         f'{tg}.blink_fcs.{3 * i + 1}')
                        for i in range(2)], sd)
            _linear(params, f'{jg}/fc_blink', f'{tg}.fc_blink', sd)

    if with_blink:
        import warnings
        warnings.warn(
            "reference InstBlink checkpoints computed fc_blink(ReLU(x)) "
            "— the blink_fcs tower is DEAD in the fork's forward "
            "(blink_head.py:103-104). The tower weights are mapped "
            "anyway; to reproduce such a checkpoint's exact blink "
            "scores set model.blink_reference_semantics=true "
            "(QueryDetectorConfig). Checkpoints trained by THIS repo "
            "use the chained tower and need the default (False).")

    _warn_unexpected(sd, lambda k: k.endswith('num_batches_tracked'),
                     'convert_query_checkpoint_dict')
    return dict(params=params, stats=stats)


def convert_query_torch_checkpoint(path: str, variables: dict,
                                   num_stages: int = 6,
                                   with_blink: bool = True,
                                   num_cls_fcs: int = 1,
                                   num_reg_fcs: int = 3,
                                   backbone: str = 'resnet50') -> dict:
    """Load an InstBlink/TeViT torch .pth and merge into init variables."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    sd = ckpt.get('state_dict', ckpt)
    sd = {k: v.numpy() if hasattr(v, 'numpy') else v for k, v in sd.items()}
    conv = convert_query_checkpoint_dict(sd, num_stages, with_blink,
                                         num_cls_fcs, num_reg_fcs,
                                         backbone)
    out = {'params': _merge_strict(variables['params'], conv['params'],
                                   'convert_query_torch_checkpoint params')}
    if 'stats' in variables:
        out['stats'] = _merge_strict(variables['stats'], conv['stats'],
                                     'convert_query_torch_checkpoint stats')
    return out


def _merge(dst, src, path=''):
    """Merge converted arrays into the init tree, verifying shapes."""
    import jax.numpy as jnp
    out = {}
    for k, v in dst.items():
        p = f'{path}/{k}'
        if k in src:
            if isinstance(v, dict):
                out[k] = _merge(v, src[k], p)
            else:
                assert tuple(v.shape) == tuple(src[k].shape), \
                    f'{p}: init {v.shape} vs ckpt {src[k].shape}'
                out[k] = jnp.asarray(src[k], v.dtype)
        else:
            out[k] = v
    return out


def _unconsumed(dst, src, path=''):
    """Converted-tree leaf paths the init tree has no slot for — each one
    is a checkpoint tensor that would be SILENTLY dropped (leaving that
    layer at random init). Callers raise on any."""
    out = []
    for k, v in src.items():
        p = f'{path}/{k}'
        if k not in dst or isinstance(v, dict) != isinstance(dst.get(k),
                                                            dict):
            if isinstance(v, dict):
                out.extend(_unconsumed({}, v, p))
            else:
                out.append(p)
        elif isinstance(v, dict):
            out.extend(_unconsumed(dst[k], v, p))
    return out


def _merge_strict(dst, src, what):
    missing = _unconsumed(dst, src)
    if missing:
        raise ValueError(
            f'{what}: {len(missing)} converted tensors have no slot in '
            f'the model (would be silently dropped), e.g. {missing[:5]} '
            '— model config and checkpoint disagree')
    return _merge(dst, src)


def convert_torch_checkpoint(path: str, variables: dict,
                             num_stages: int = 4) -> dict:
    """Load a torch .pth and merge into freshly-initialised variables."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    sd = ckpt.get('state_dict', ckpt)
    sd = {k: v.numpy() if hasattr(v, 'numpy') else v for k, v in sd.items()}
    conv = convert_mcgaze_checkpoint_dict(sd, num_stages)
    return {
        'params': _merge_strict(variables['params'], conv['params'],
                                'convert_torch_checkpoint params'),
        'stats': _merge_strict(variables['stats'], conv['stats'],
                               'convert_torch_checkpoint stats'),
    }


def convert_torchvision_resnet(path_or_sd, variables: dict) -> dict:
    """torchvision resnet50 .pth -> backbone-only init (pretrained
    backbone as in the reference's init_cfg torchvision://resnet50)."""
    if isinstance(path_or_sd, str):
        import torch
        sd = torch.load(path_or_sd, map_location='cpu', weights_only=False)
        sd = sd.get('state_dict', sd)
        sd = {k: v.numpy() for k, v in sd.items()}
    else:
        sd = path_or_sd
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    convert_backbone(params, stats, sd, prefix='')
    return {
        'params': _merge_strict(variables['params'], params,
                                'convert_torchvision_resnet params'),
        'stats': _merge_strict(variables['stats'], stats,
                               'convert_torchvision_resnet stats'),
    }
