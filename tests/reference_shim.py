"""Execute the REFERENCE's actual model code in-process on CPU torch.

This is the `tests/test_track_eval_oracle.py` technique widened to the
model: only the *external* mmcv package (pip `mmcv-full`, not part of the
reference repo) is stubbed with minimal faithful torch bricks; every
mmdet file of the MCGaze model path is the reference's own source,
executed from /root/reference via a synthetic `mmdet` package whose
sub-packages carry real ``__path__`` entries into the reference tree.

Reference files EXECUTED (not replicated):
  mmdet/core/bbox/transforms.py            bbox2roi / cxcywh<->xyxy
  mmdet/core/bbox/builder.py               assigner/sampler/coder builders
  mmdet/core/bbox/coder/delta_xywh_bbox_coder.py
  mmdet/core/bbox/iou_calculators/*        bbox_overlaps (GIoU path)
  mmdet/core/bbox/assigners/assign_result.py
  mmdet/core/bbox/samplers/{base,pseudo}_sampler.py, sampling_result.py
  mmdet/models/builder.py                  registries + build_detector
  mmdet/models/losses/{utils,accuracy,focal_loss,iou_loss,smooth_l1_loss,
                       gaze_arccos_loss,gaze_temp_loss}.py
  mmdet/models/utils/{builder,res_layer,transformer}.py   (DynamicConv)
  mmdet/models/backbones/resnet.py
  mmdet/models/necks/fpn.py
  mmdet/models/roi_heads/roi_extractors/{base,single_level}_roi_extractor.py
  mmdet/models/roi_heads/bbox_heads/{bbox_head,gaze_stqi_head}.py
  mmdet/models/roi_heads/mask_heads/gaze_head.py
  mmdet/models/dense_heads/fixed_embedding_rpn_head.py
  mmdet/models/roi_heads/{base_roi_head,test_mixins,cascade_roi_head,
                          sparse_roi_head,multiclue_gaze_roi_head}.py
  mmdet/models/detectors/{base,two_stage,sparse_rcnn,queryinst,
                          multiclue_gaze}.py

Trust note (advisor round-4): these oracle tests execute Python from
/root/reference (public untrusted content) in the test runner's process.
That is the point of the technique — the reference's behavior, not a
replica, is the ground truth — and the tree is mounted read-only in this
environment; do NOT point REF at a writable/unreviewed checkout.

Stubbed (external deps, NOT reference logic): mmcv Registry/ConfigDict,
BaseModule, build_norm/conv/activation_layer, ConvModule, the
MultiheadAttention/FFN transformer bricks (thin wrappers over
torch.nn.MultiheadAttention / two Linears, the documented mmcv
semantics), RoIAlign (torchvision.ops.roi_align, aligned=True — the
same math mmcv-full ships), and never-called symbols (multiclass_nms,
mask_target, merge_aug_*, CUDA sigmoid_focal_loss: mmdet's FocalLoss
dispatches to its own py_sigmoid_focal_loss on CPU, focal_loss.py:160+).
"""
import copy
import importlib
import sys
import types

import torch
import torch.nn as nn

REF = '/root/reference'

_CACHE = {}


# ---------------------------------------------------------------------------
# addict-lite: mmcv.Config-style dicts with attribute access
# ---------------------------------------------------------------------------
class ConfigDict(dict):
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value

    def copy(self):
        return ConfigDict(self)


def to_config_dict(obj):
    if isinstance(obj, dict):
        return ConfigDict({k: to_config_dict(v) for k, v in obj.items()})
    if isinstance(obj, (list, tuple)):
        return type(obj)(to_config_dict(v) for v in obj)
    return obj


# ---------------------------------------------------------------------------
# mmcv.utils: Registry / build_from_cfg
# ---------------------------------------------------------------------------
def build_from_cfg(cfg, registry, default_args=None):
    args = dict(cfg)
    if default_args is not None:
        for name, value in default_args.items():
            args.setdefault(name, value)
    obj_type = args.pop('type')
    if isinstance(obj_type, str):
        obj_cls = registry.get(obj_type)
        if obj_cls is None:
            raise KeyError(f'{obj_type} is not registered in {registry.name}')
    else:
        obj_cls = obj_type
    return obj_cls(**args)


class Registry:
    def __init__(self, name, parent=None, build_func=None, scope=None):
        self.name = name
        self.parent = parent
        self._module_dict = {}
        if build_func is None:
            build_func = parent.build_func if parent else build_from_cfg
        self.build_func = build_func

    def __contains__(self, key):
        return self.get(key) is not None

    def get(self, key):
        if key in self._module_dict:
            return self._module_dict[key]
        if self.parent is not None:
            return self.parent.get(key)
        return None

    def build(self, cfg, *args, **kwargs):
        return self.build_func(cfg, self, *args, **kwargs)

    def register_module(self, name=None, force=False, module=None):
        if module is not None:
            self._module_dict[name or module.__name__] = module
            return module

        def _register(cls):
            self._module_dict[name or cls.__name__] = cls
            return cls

        return _register


# ---------------------------------------------------------------------------
# mmcv.runner: BaseModule family + fp16 decorators
# ---------------------------------------------------------------------------
class BaseModule(nn.Module):
    def __init__(self, init_cfg=None):
        super().__init__()
        self._is_init = False
        self.init_cfg = copy.deepcopy(init_cfg)

    def init_weights(self):
        for m in self.children():
            if hasattr(m, 'init_weights'):
                m.init_weights()
        self._is_init = True


class Sequential(BaseModule, nn.Sequential):
    def __init__(self, *args, init_cfg=None):
        BaseModule.__init__(self, init_cfg)
        nn.Sequential.__init__(self, *args)


class ModuleList(BaseModule, nn.ModuleList):
    def __init__(self, modules=None, init_cfg=None):
        BaseModule.__init__(self, init_cfg)
        nn.ModuleList.__init__(self, modules)


def _identity_decorator_factory(*dargs, **dkwargs):
    def deco(fn):
        return fn

    return deco


# ---------------------------------------------------------------------------
# mmcv.cnn bricks
# ---------------------------------------------------------------------------
def build_activation_layer(cfg):
    cfg = dict(cfg)
    t = cfg.pop('type')
    if t == 'ReLU':
        return nn.ReLU(**cfg)
    if t == 'GELU':
        return nn.GELU()
    raise KeyError(t)


def build_norm_layer(cfg, num_features, postfix=''):
    cfg = dict(cfg)
    t = cfg.pop('type')
    requires_grad = cfg.pop('requires_grad', True)
    if t == 'LN':
        layer = nn.LayerNorm(num_features, **cfg)
        name = 'ln' + str(postfix)
    elif t in ('BN', 'BN2d', 'SyncBN'):
        layer = nn.BatchNorm2d(num_features, **cfg)
        name = 'bn' + str(postfix)
    else:
        raise KeyError(t)
    for p in layer.parameters():
        p.requires_grad = requires_grad
    return name, layer


def build_conv_layer(cfg, *args, **kwargs):
    if cfg is not None:
        cfg = dict(cfg)
        t = cfg.pop('type')
        assert t == 'Conv2d', t
        kwargs.update(cfg)
    return nn.Conv2d(*args, **kwargs)


def build_plugin_layer(cfg, *args, **kwargs):  # pragma: no cover
    raise NotImplementedError('plugins are not on the MCGaze path')


def bias_init_with_prob(prior_prob):
    import math

    return float(-math.log((1 - prior_prob) / prior_prob))


def xavier_init(module, gain=1, bias=0, distribution='normal'):
    if hasattr(module, 'weight') and module.weight is not None:
        if distribution == 'uniform':
            nn.init.xavier_uniform_(module.weight, gain=gain)
        else:
            nn.init.xavier_normal_(module.weight, gain=gain)
    if hasattr(module, 'bias') and module.bias is not None:
        nn.init.constant_(module.bias, bias)


class ConvModule(BaseModule):
    """conv + optional norm + optional act, mmcv naming (.conv / .bn)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias='auto', conv_cfg=None,
                 norm_cfg=None, act_cfg=dict(type='ReLU'), inplace=True,
                 order=('conv', 'norm', 'act'), init_cfg=None, **kwargs):
        super().__init__(init_cfg)
        self.with_norm = norm_cfg is not None
        self.with_activation = act_cfg is not None
        if bias == 'auto':
            bias = not self.with_norm
        self.conv = build_conv_layer(
            conv_cfg, in_channels, out_channels, kernel_size, stride=stride,
            padding=padding, dilation=dilation, groups=groups, bias=bias)
        self.order = order
        if self.with_norm:
            self.norm_name, norm = build_norm_layer(norm_cfg, out_channels)
            self.add_module(self.norm_name, norm)
        else:
            self.norm_name = None
        if self.with_activation:
            act = dict(act_cfg)
            act.setdefault('inplace', inplace)
            self.activate = build_activation_layer(act)

    @property
    def norm(self):
        return getattr(self, self.norm_name) if self.norm_name else None

    def forward(self, x, activate=True, norm=True):
        for layer in self.order:
            if layer == 'conv':
                x = self.conv(x)
            elif layer == 'norm' and norm and self.with_norm:
                x = self.norm(x)
            elif layer == 'act' and activate and self.with_activation:
                x = self.activate(x)
        return x


class MultiheadAttention(BaseModule):
    """mmcv.cnn.bricks.transformer.MultiheadAttention: thin wrapper over
    torch.nn.MultiheadAttention that defaults key/value/identity to the
    query and RETURNS identity + attn_out (residual inside the brick)."""

    def __init__(self, embed_dims, num_heads, attn_drop=0., proj_drop=0.,
                 dropout_layer=dict(type='Dropout', drop_prob=0.),
                 init_cfg=None, batch_first=False, **kwargs):
        super().__init__(init_cfg)
        self.embed_dims = embed_dims
        self.num_heads = num_heads
        self.batch_first = batch_first
        self.attn = nn.MultiheadAttention(embed_dims, num_heads, attn_drop,
                                          **kwargs)
        self.proj_drop = nn.Dropout(proj_drop)
        drop = dict(dropout_layer or {}).get('drop_prob', 0.)
        self.dropout_layer = nn.Dropout(drop) if drop else nn.Identity()

    def forward(self, query, key=None, value=None, identity=None,
                query_pos=None, key_pos=None, attn_mask=None,
                key_padding_mask=None, **kwargs):
        if key is None:
            key = query
        if value is None:
            value = key
        if identity is None:
            identity = query
        if query_pos is not None:
            query = query + query_pos
        if key_pos is not None:
            key = key + key_pos
        if self.batch_first:
            query, key, value = (x.transpose(0, 1) for x in
                                 (query, key, value))
        out = self.attn(query=query, key=key, value=value,
                        attn_mask=attn_mask,
                        key_padding_mask=key_padding_mask)[0]
        if self.batch_first:
            out = out.transpose(0, 1)
        return identity + self.dropout_layer(self.proj_drop(out))


class FFN(BaseModule):
    """mmcv FFN: (num_fcs-1) x [Linear->act->drop] -> Linear -> drop,
    residual add (add_identity default True)."""

    def __init__(self, embed_dims=256, feedforward_channels=1024, num_fcs=2,
                 act_cfg=dict(type='ReLU', inplace=True), ffn_drop=0.,
                 dropout_layer=None, add_identity=True, init_cfg=None,
                 **kwargs):
        super().__init__(init_cfg)
        if 'dropout' in kwargs:            # deprecated alias mmcv keeps
            ffn_drop = kwargs.pop('dropout')
        layers = []
        in_channels = embed_dims
        for _ in range(num_fcs - 1):
            layers.append(
                nn.Sequential(nn.Linear(in_channels, feedforward_channels),
                              build_activation_layer(act_cfg),
                              nn.Dropout(ffn_drop)))
            in_channels = feedforward_channels
        layers.append(nn.Linear(feedforward_channels, embed_dims))
        layers.append(nn.Dropout(ffn_drop))
        self.layers = nn.Sequential(*layers)
        drop = dict(dropout_layer or {}).get('drop_prob', 0.)
        self.dropout_layer = nn.Dropout(drop) if drop else nn.Identity()
        self.add_identity = add_identity

    def forward(self, x, identity=None):
        out = self.layers(x)
        if not self.add_identity:
            return self.dropout_layer(out)
        if identity is None:
            identity = x
        return identity + self.dropout_layer(out)


def _bilinear_gather(feat, y, x, valid):
    """feat (N, C, H, W); y/x/valid (R, P) sample coords for rois mapped
    to batch index via caller-provided flat feature. Exact CUDA-kernel
    border semantics: out-of-[-1, dim] samples are zero; coords clamp to
    >= 0; indices at the top edge collapse (y_low == y_high == H-1)."""
    N, C, H, W = feat.shape
    y = y.clamp(min=0.0)
    x = x.clamp(min=0.0)
    y_low = y.floor().long().clamp(max=H - 1)
    x_low = x.floor().long().clamp(max=W - 1)
    top = y_low >= H - 1
    left = x_low >= W - 1
    y = torch.where(top, y_low.to(y.dtype), y)
    x = torch.where(left, x_low.to(x.dtype), x)
    y_high = torch.where(top, y_low, y_low + 1)
    x_high = torch.where(left, x_low, x_low + 1)
    ly, lx = y - y_low, x - x_low
    hy, hx = 1.0 - ly, 1.0 - lx
    return valid, y_low, y_high, x_low, x_high, ly, lx, hy, hx


class RoIAlign(nn.Module):
    """mmcv.ops.RoIAlign surface (aligned=True, avg pool), implemented as
    a vectorized exact port of the aligned bilinear-average kernel math.
    Cross-checked against tests/test_roi_align.py's scalar golden in
    test_reference_model_oracle.py."""

    def __init__(self, output_size, spatial_scale=1.0, sampling_ratio=0,
                 pool_mode='avg', aligned=True, use_torchvision=False):
        super().__init__()
        assert pool_mode == 'avg' and aligned and sampling_ratio > 0
        if isinstance(output_size, int):
            output_size = (output_size, output_size)
        self.output_size = tuple(output_size)
        self.spatial_scale = float(spatial_scale)
        self.sampling_ratio = int(sampling_ratio)
        self.aligned = aligned

    def forward(self, input, rois):
        input = input.float()
        rois = rois.float()
        N, C, H, W = input.shape
        R = rois.shape[0]
        oh, ow = self.output_size
        s = self.sampling_ratio
        if R == 0:
            return input.new_zeros(0, C, oh, ow)
        batch_idx = rois[:, 0].long()
        x1 = rois[:, 1] * self.spatial_scale - 0.5
        y1 = rois[:, 2] * self.spatial_scale - 0.5
        x2 = rois[:, 3] * self.spatial_scale - 0.5
        y2 = rois[:, 4] * self.spatial_scale - 0.5
        bw = (x2 - x1) / ow
        bh = (y2 - y1) / oh
        ii = torch.arange(oh, dtype=torch.float32)
        jj = torch.arange(ow, dtype=torch.float32)
        ss = (torch.arange(s, dtype=torch.float32) + 0.5) / s
        # (R, oh, s) and (R, ow, s) sample coordinates
        ys = y1[:, None, None] + (ii[None, :, None] + ss[None, None, :]) \
            * bh[:, None, None]
        xs = x1[:, None, None] + (jj[None, :, None] + ss[None, None, :]) \
            * bw[:, None, None]
        # broadcast to full (R, oh, s, ow, s) grids
        y = ys[:, :, :, None, None].expand(R, oh, s, ow, s).reshape(R, -1)
        x = xs[:, None, None, :, :].expand(R, oh, s, ow, s).reshape(R, -1)
        valid = ((y >= -1.0) & (y <= float(H)) &
                 (x >= -1.0) & (x <= float(W)))
        valid, y_low, y_high, x_low, x_high, ly, lx, hy, hx = \
            _bilinear_gather(input, y, x, valid)
        flat = input.permute(0, 2, 3, 1).reshape(N * H * W, C)
        base = batch_idx[:, None] * (H * W)

        def g(yi, xi):
            return flat[(base + yi * W + xi).reshape(-1)].reshape(
                R, -1, C)

        val = (g(y_low, x_low) * (hy * hx)[..., None] +
               g(y_low, x_high) * (hy * lx)[..., None] +
               g(y_high, x_low) * (ly * hx)[..., None] +
               g(y_high, x_high) * (ly * lx)[..., None])
        val = val * valid[..., None]
        val = val.reshape(R, oh, s, ow, s, C).mean(dim=(2, 4))
        return val.permute(0, 3, 1, 2).contiguous()


def _never_called(name):
    def fn(*args, **kwargs):  # pragma: no cover
        raise RuntimeError(f'{name} is not on the MCGaze eval path')

    fn.__name__ = name
    return fn


def to_2tuple(x):
    return tuple(x) if isinstance(x, (list, tuple)) else (x, x)


# ---------------------------------------------------------------------------
# synthetic package machinery
# ---------------------------------------------------------------------------
def _pkg(name, path=None):
    mod = types.ModuleType(name)
    mod.__package__ = name
    if path is not None:
        mod.__path__ = [path]
    sys.modules[name] = mod
    parent, _, child = name.rpartition('.')
    if parent and parent in sys.modules:
        setattr(sys.modules[parent], child, mod)
    return mod


def _imp(name):
    """Import a real reference file as a proper submodule."""
    return importlib.import_module(name)


def _export(module, target, names):
    for n in names:
        setattr(target, n, getattr(module, n))


def _install_mmcv():
    mmcv = _pkg('mmcv')
    mmcv.jit = _identity_decorator_factory
    mmcv.Config = ConfigDict
    mmcv.ConfigDict = ConfigDict

    utils = _pkg('mmcv.utils')
    utils.Registry = Registry
    utils.build_from_cfg = build_from_cfg
    utils.to_2tuple = to_2tuple
    utils.ConfigDict = ConfigDict
    mmcv.utils = utils

    cnn = _pkg('mmcv.cnn')
    cnn.MODELS = Registry('model')
    _export(sys.modules[__name__], cnn,
            ['build_activation_layer', 'build_norm_layer',
             'build_conv_layer', 'build_plugin_layer', 'ConvModule',
             'bias_init_with_prob', 'xavier_init'])
    cnn.constant_init = lambda m, val, bias=0: None
    cnn.normal_init = lambda m, mean=0, std=1, bias=0: None
    cnn.kaiming_init = lambda m, **kw: None
    cnn.trunc_normal_init = lambda m, **kw: None
    cnn.Conv2d = nn.Conv2d
    cnn.build_upsample_layer = _never_called('build_upsample_layer')
    cnn_utils = _pkg('mmcv.cnn.utils')
    weight_init = _pkg('mmcv.cnn.utils.weight_init')
    weight_init.trunc_normal_ = torch.nn.init.trunc_normal_

    bricks = _pkg('mmcv.cnn.bricks')
    brick_reg = _pkg('mmcv.cnn.bricks.registry')
    for rn in ('TRANSFORMER_LAYER', 'TRANSFORMER_LAYER_SEQUENCE',
               'ATTENTION', 'FEEDFORWARD_NETWORK', 'POSITIONAL_ENCODING',
               'DROPOUT_LAYERS', 'NORM_LAYERS', 'ACTIVATION_LAYERS',
               'CONV_LAYERS', 'PLUGIN_LAYERS'):
        setattr(brick_reg, rn, Registry(rn.lower()))

    drop_mod = _pkg('mmcv.cnn.bricks.drop')

    class DropPath(nn.Module):
        """mmcv.cnn.bricks.drop.DropPath (stochastic depth): per-sample
        bernoulli(keep) mask over dim 0, kept samples scaled 1/keep;
        identity at eval or drop_prob 0."""

        def __init__(self, drop_prob=0.1):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0. or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            return x * mask / keep

    def build_dropout(cfg, **default_args):
        if cfg is None:
            return nn.Identity()
        cfg = dict(cfg)
        kind = cfg.pop('type')
        if kind == 'DropPath':
            return DropPath(**cfg)
        assert kind == 'Dropout', kind
        return nn.Dropout(cfg.get('drop_prob', 0.))

    drop_mod.DropPath = DropPath
    drop_mod.build_dropout = build_dropout

    transformer = _pkg('mmcv.cnn.bricks.transformer')
    transformer.MultiheadAttention = MultiheadAttention
    transformer.FFN = FFN
    transformer.build_dropout = build_dropout

    class BaseTransformerLayer(BaseModule):
        pass

    class TransformerLayerSequence(BaseModule):
        pass

    transformer.BaseTransformerLayer = BaseTransformerLayer
    transformer.TransformerLayerSequence = TransformerLayerSequence
    transformer.build_transformer_layer_sequence = _never_called(
        'build_transformer_layer_sequence')

    class MultiScaleDeformableAttention(BaseModule):  # never instantiated
        pass

    transformer.MultiScaleDeformableAttention = MultiScaleDeformableAttention

    runner = _pkg('mmcv.runner')
    runner.BaseModule = BaseModule
    runner.ModuleList = ModuleList
    runner.Sequential = Sequential
    runner.auto_fp16 = _identity_decorator_factory
    runner.force_fp32 = _identity_decorator_factory
    runner._load_checkpoint = _never_called('_load_checkpoint')
    runner.load_state_dict = _never_called('mmcv load_state_dict')
    base_module = _pkg('mmcv.runner.base_module')
    base_module.BaseModule = BaseModule
    base_module.ModuleList = ModuleList
    base_module.Sequential = Sequential

    ops = _pkg('mmcv.ops')
    ops.RoIAlign = RoIAlign
    ops.sigmoid_focal_loss = _never_called('cuda sigmoid_focal_loss')
    ops.nms = _never_called('nms')
    msda = _pkg('mmcv.ops.multi_scale_deform_attn')
    msda.MultiScaleDeformableAttention = MultiScaleDeformableAttention
    mmcv.ops = ops


def _multi_apply(func, *args, **kwargs):
    """mmdet.core.utils.misc.multi_apply (framework glue, 4 lines)."""
    import functools

    pfunc = functools.partial(func, **kwargs) if kwargs else func
    map_results = map(pfunc, *args)
    return tuple(map(list, zip(*map_results)))


def _reduce_mean(tensor):
    """mmdet.models.dense_heads.atss_head.reduce_mean (dist glue)."""
    import torch.distributed as dist

    if not (dist.is_available() and dist.is_initialized()):
        return tensor
    tensor = tensor.clone()
    dist.all_reduce(tensor.div_(dist.get_world_size()),
                    op=dist.ReduceOp.SUM)
    return tensor


def install():
    """Install the shim and execute the reference model files.

    Returns a namespace exposing the executed reference modules/classes.
    Idempotent (cached); installs into sys.modules for the process — no
    other test in this suite imports mmdet/mmcv, and a pre-existing real
    mmdet would make this whole shim unnecessary.
    """
    if 'ns' in _CACHE:
        return _CACHE['ns']
    _install_mmcv()

    m = REF + '/mmdet'
    mmdet = _pkg('mmdet', m)
    _pkg('mmdet.utils', m + '/utils')
    core = _pkg('mmdet.core', m + '/core')
    _pkg('mmdet.core.bbox', m + '/core/bbox')
    _pkg('mmdet.core.bbox.iou_calculators', m + '/core/bbox/iou_calculators')
    _pkg('mmdet.core.bbox.coder', m + '/core/bbox/coder')
    _pkg('mmdet.core.bbox.assigners', m + '/core/bbox/assigners')
    _pkg('mmdet.core.bbox.samplers', m + '/core/bbox/samplers')
    vis = _pkg('mmdet.core.visualization')
    vis.imshow_det_bboxes = _never_called('imshow_det_bboxes')
    mask = _pkg('mmdet.core.mask')
    structures = _pkg('mmdet.core.mask.structures')
    structures.BitmapMasks = type('BitmapMasks', (), {})
    structures.PolygonMasks = type('PolygonMasks', (), {})
    mask.structures = structures
    models = _pkg('mmdet.models', m + '/models')
    _pkg('mmdet.models.losses', m + '/models/losses')
    _pkg('mmdet.models.utils', m + '/models/utils')
    _pkg('mmdet.models.backbones', m + '/models/backbones')
    _pkg('mmdet.models.necks', m + '/models/necks')
    _pkg('mmdet.models.dense_heads', m + '/models/dense_heads')
    _pkg('mmdet.models.roi_heads', m + '/models/roi_heads')
    _pkg('mmdet.models.roi_heads.bbox_heads',
         m + '/models/roi_heads/bbox_heads')
    _pkg('mmdet.models.roi_heads.mask_heads',
         m + '/models/roi_heads/mask_heads')
    _pkg('mmdet.models.roi_heads.roi_extractors',
         m + '/models/roi_heads/roi_extractors')
    _pkg('mmdet.models.detectors', m + '/models/detectors')

    # glue the executed files import from mmdet.core / mmdet.models
    core.multi_apply = _multi_apply
    core.mask_target = _never_called('mask_target')
    core.multiclass_nms = _never_called('multiclass_nms')
    core.merge_aug_bboxes = _never_called('merge_aug_bboxes')
    core.merge_aug_masks = _never_called('merge_aug_masks')
    core.merge_aug_proposals = _never_called('merge_aug_proposals')

    # --- execute real reference files, dependency order ---
    _imp('mmdet.utils.util_mixins')

    transforms = _imp('mmdet.core.bbox.transforms')
    _export(transforms, core,
            ['bbox2roi', 'roi2bbox', 'bbox2result', 'bbox_cxcywh_to_xyxy',
             'bbox_xyxy_to_cxcywh', 'bbox_mapping', 'bbox_mapping_back',
             'bbox_flip'])
    # relative `from ...core import bbox_cxcywh_to_xyxy` resolves through
    # the package module, which _export covered above.

    bbox_builder = _imp('mmdet.core.bbox.builder')
    _export(bbox_builder, core,
            ['build_assigner', 'build_sampler', 'build_bbox_coder'])
    iou2d = _imp('mmdet.core.bbox.iou_calculators.iou2d_calculator')
    core.bbox_overlaps = iou2d.bbox_overlaps
    sys.modules['mmdet.core.bbox.iou_calculators'].bbox_overlaps = \
        iou2d.bbox_overlaps
    _imp('mmdet.core.bbox.coder.base_bbox_coder')
    delta_coder = _imp('mmdet.core.bbox.coder.delta_xywh_bbox_coder')
    _imp('mmdet.core.bbox.assigners.base_assigner')
    assign_result = _imp('mmdet.core.bbox.assigners.assign_result')
    sys.modules['mmdet.core.bbox.assigners'].AssignResult = \
        assign_result.AssignResult
    core.AssignResult = assign_result.AssignResult
    _imp('mmdet.core.bbox.samplers.sampling_result')
    _imp('mmdet.core.bbox.samplers.base_sampler')
    pseudo = _imp('mmdet.core.bbox.samplers.pseudo_sampler')
    sys.modules['mmdet.core.bbox.samplers'].PseudoSampler = \
        pseudo.PseudoSampler
    core.PseudoSampler = pseudo.PseudoSampler
    # the train-side assigner (match_costs package imports for real via
    # mmdet.core.bbox.__path__)
    fixed_assigner = _imp('mmdet.core.bbox.assigners.gaze_fixed_assigner')

    models_builder = _imp('mmdet.models.builder')
    _export(models_builder, models,
            ['BACKBONES', 'DETECTORS', 'HEADS', 'LOSSES', 'NECKS',
             'ROI_EXTRACTORS', 'build_backbone', 'build_detector',
             'build_head', 'build_loss', 'build_neck',
             'build_roi_extractor'])

    _imp('mmdet.models.losses.utils')
    accuracy_mod = _imp('mmdet.models.losses.accuracy')
    sys.modules['mmdet.models.losses'].accuracy = accuracy_mod.accuracy
    for lf in ('focal_loss', 'iou_loss', 'smooth_l1_loss',
               'gaze_arccos_loss', 'gaze_temp_loss', 'gaze_cos_loss',
               'gaze_pinball_loss'):
        _imp(f'mmdet.models.losses.{lf}')

    utils_builder = _imp('mmdet.models.utils.builder')
    res_layer = _imp('mmdet.models.utils.res_layer')
    mu = sys.modules['mmdet.models.utils']
    mu.build_transformer = utils_builder.build_transformer
    mu.build_linear_layer = utils_builder.build_linear_layer
    mu.ResLayer = res_layer.ResLayer
    ref_transformer = _imp('mmdet.models.utils.transformer')

    # reduce_mean lives in atss_head.py whose import drags in the anchor
    # machinery; it is 4 lines of dist glue (synthetic above)
    atss = _pkg('mmdet.models.dense_heads.atss_head')
    atss.reduce_mean = _reduce_mean

    resnet = _imp('mmdet.models.backbones.resnet')
    fpn = _imp('mmdet.models.necks.fpn')
    _imp('mmdet.models.roi_heads.roi_extractors.base_roi_extractor')
    single_roi = _imp(
        'mmdet.models.roi_heads.roi_extractors.single_level_roi_extractor')
    bbox_head = _imp('mmdet.models.roi_heads.bbox_heads.bbox_head')
    sys.modules['mmdet.models.roi_heads.bbox_heads'].BBoxHead = \
        bbox_head.BBoxHead
    gaze_stqi = _imp('mmdet.models.roi_heads.bbox_heads.gaze_stqi_head')
    gaze_head = _imp('mmdet.models.roi_heads.mask_heads.gaze_head')
    rpn = _imp('mmdet.models.dense_heads.fixed_embedding_rpn_head')
    _imp('mmdet.models.roi_heads.base_roi_head')
    _imp('mmdet.models.roi_heads.test_mixins')
    _imp('mmdet.models.roi_heads.cascade_roi_head')
    _imp('mmdet.models.roi_heads.sparse_roi_head')
    roi_head = _imp('mmdet.models.roi_heads.multiclue_gaze_roi_head')
    _imp('mmdet.models.detectors.base')
    _imp('mmdet.models.detectors.two_stage')
    _imp('mmdet.models.detectors.sparse_rcnn')
    _imp('mmdet.models.detectors.queryinst')
    detector = _imp('mmdet.models.detectors.multiclue_gaze')

    # --- TeViT / InstBlink family (the fork's sibling models) ---
    import logging

    mmdet.digit_version = lambda s: tuple(
        int(p) for p in s.split('.') if p.isdigit())
    mmdet.mmcv_version = mmdet.digit_version('1.5.0')   # >= 1.3.17 path
    sys.modules['mmdet.utils'].get_root_logger = (
        lambda *a, **k: logging.getLogger('mmdet'))
    ckpt_convert = _imp('mmdet.models.utils.ckpt_convert')
    mu.pvt_convert = ckpt_convert.pvt_convert
    mu.nchw_to_nlc = ref_transformer.nchw_to_nlc
    mu.nlc_to_nchw = ref_transformer.nlc_to_nchw
    msgshift = _imp('mmdet.models.backbones.msgshift')
    dii = _imp('mmdet.models.roi_heads.bbox_heads.dii_head')
    sys.modules['mmdet.models.roi_heads.bbox_heads'].DIIHead = dii.DIIHead
    stqi = _imp('mmdet.models.roi_heads.bbox_heads.stqi_head')
    blink = _imp('mmdet.models.roi_heads.mask_heads.blink_head')
    instblink_roi = _imp('mmdet.models.roi_heads.instblink_roi_head')
    tevit_roi = _imp('mmdet.models.roi_heads.tevit_roi_head')
    tevit_det = _imp('mmdet.models.detectors.tevit')
    instblink_det = _imp('mmdet.models.detectors.instblink')

    ns = types.SimpleNamespace(
        MsgShifTBase=msgshift.MsgShifTBase,
        MsgShifT=msgshift.MsgShifT,
        DIIHead=dii.DIIHead,
        STQIHead=stqi.STQIHead,
        BlinkHead=blink.BlinkHead,
        InstBlinkRoIHead=instblink_roi.InstBlinkRoIHead,
        TeViTRoIHead=tevit_roi.TeViTRoIHead,
        TeViT=tevit_det.TeViT,
        InstBlink=instblink_det.InstBlink,
        build_detector=models_builder.build_detector,
        build_loss=models_builder.build_loss,
        DynamicConv=ref_transformer.DynamicConv,
        DeltaXYWHBBoxCoder=delta_coder.DeltaXYWHBBoxCoder,
        ResNet=resnet.ResNet,
        FPN=fpn.FPN,
        SingleRoIExtractor=single_roi.SingleRoIExtractor,
        BBoxHead=bbox_head.BBoxHead,
        GazeSTQIHead=gaze_stqi.GazeSTQIHead,
        GazeHead=gaze_head.GazeHead,
        FixedEmbeddingRPNHead=rpn.FixedEmbeddingRPNHead,
        MultiClueGazeROIHead=roi_head.MultiClueGazeROIHead,
        MultiClueGaze=detector.MultiClueGaze,
        FixedAssigner=fixed_assigner.FixedAssigner,
        losses=sys.modules['mmdet.models.losses'],
        ConfigDict=ConfigDict,
        to_config_dict=to_config_dict,
    )
    _CACHE['ns'] = ns
    return ns


def build_reference_gaze_model(cfg_path=None, train=False):
    """Build the reference MultiClueGaze detector from the UNMODIFIED
    reference config. ``train=False`` drops train_cfg like init_detector
    (apis/inference.py:39-42); ``train=True`` keeps it, building the real
    FixedAssigner/PseudoSampler per stage (cascade_roi_head.py:100-110)."""
    from mcgaze_tpu.utils.config import load_legacy_dict

    ns = install()
    cfg_path = cfg_path or (
        REF + '/configs/multiclue_gaze/multiclue_gaze_r50_gaze360.py')
    raw = load_legacy_dict(cfg_path)
    model_cfg = to_config_dict(raw['model'])
    model_cfg.pop('type')
    model_cfg.pop('pretrained', None)
    model_cfg['backbone'].pop('init_cfg', None)
    if not train:
        model_cfg['train_cfg'] = None
    model = ns.MultiClueGaze(**model_cfg)
    if train:
        # real training mode: exercises ResNet.train()'s norm_eval +
        # frozen-stage overrides (resnet.py); dropout is 0 throughout
        model.train()
    else:
        model.eval()
    return model
