"""Execute the REFERENCE's actual DATA PIPELINE + DATASET + EVAL DRIVER
code in-process on CPU.

Extends tests/reference_shim.py (which executes the reference's model
files) with the pieces needed to run, unmodified:

  mmdet/datasets/pipelines/__init__.py      (real package import)
    compose.py, loading.py (LoadImageFromFile/LoadAnnotations),
    transforms.py (CenterCrop/Resize/RandomFlip+gaze_flip/Normalize/Pad),
    formatting.py (DefaultFormatBundle/Collect), auto_augment.py,
    instaboost.py, test_time_aug.py
  mmdet/datasets/builder.py                 (DATASETS/PIPELINES registries)
  mmdet/datasets/samplers/*                 (real package import)
  mmdet/datasets/custom.py                  (CustomDataset)
  mmdet/datasets/mpeblink_api.py            (MPEblink COCO-vid API)
  mmdet/datasets/gaze360.py                 (Gaze360Dataset: window
                                             padding, isfix latch,
                                             prepare_train_clip stacking)
  mmdet/datasets/utils.py                   (replace_ImageToTensor)
  mmdet/apis/inference.py                   (init_detector)
  tools/test_gaze360_gaze.py                (the full eval driver script)

Stubbed here (EXTERNAL deps only, faithful mmcv-full semantics, never
reference logic):
  mmcv.image: imfrombytes/imresize/imrescale/rescale_size/imflip/
              imnormalize/impad/impad_to_multiple (cv2-backed, the exact
              rounding + float64 cv2 arithmetic mmcv ships)
  mmcv.fileio.FileClient (disk backend), mmcv.load/dump/list_from_file
  mmcv.parallel: DataContainer, collate (pad-to-max + stack per
              samples_per_gpu chunk), scatter (single CPU device)
  mmcv.Config.fromfile (backed by mcgaze_tpu.utils.config.load_legacy_dict
              — itself tested against the reference configs), DictAction
  mmcv.runner: load_checkpoint (torch.load + revise_keys + non-strict
              load_state_dict), get_dist_info, hooks.HOOKS/Hook
  mmcv.cnn.utils.flops_counter (no-op counters), mmcv.cnn.VGG
  pycocotools.mask (never called: no mask annotations in scope)
  terminaltables.AsciiTable (never called: CustomDataset.evaluate only)
"""
import importlib
import importlib.util
import os.path as osp
import re
import sys
import types

import cv2
import numpy as np
import torch
import torch.nn.functional as F

from tests import reference_shim
from tests.reference_shim import (ConfigDict, Registry, _imp, _never_called,
                                  _pkg, to_config_dict)

REF = reference_shim.REF

_CACHE = {}


# ---------------------------------------------------------------------------
# mmcv.image — faithful cv2-backed implementations (mmcv-full semantics)
# ---------------------------------------------------------------------------
_CV2_INTERP = {
    'nearest': cv2.INTER_NEAREST,
    'bilinear': cv2.INTER_LINEAR,
    'bicubic': cv2.INTER_CUBIC,
    'area': cv2.INTER_AREA,
    'lanczos': cv2.INTER_LANCZOS4,
}


def imfrombytes(content, flag='color', channel_order='bgr', backend=None):
    img_np = np.frombuffer(content, np.uint8)
    cv2_flag = {'color': cv2.IMREAD_COLOR, 'grayscale':
                cv2.IMREAD_GRAYSCALE, 'unchanged': cv2.IMREAD_UNCHANGED
                }[flag]
    img = cv2.imdecode(img_np, cv2_flag)
    if flag == 'color' and channel_order == 'rgb':
        cv2.cvtColor(img, cv2.COLOR_BGR2RGB, img)
    return img


def imresize(img, size, return_scale=False, interpolation='bilinear',
             out=None, backend='cv2'):
    """size is (w, h) — mmcv/image/geometric.py convention."""
    h, w = img.shape[:2]
    resized = cv2.resize(img, size, dst=out,
                         interpolation=_CV2_INTERP[interpolation])
    if not return_scale:
        return resized
    return resized, size[0] / w, size[1] / h


def _scale_size(size, scale):
    """size (w, h) * scale, +0.5 rounding (mmcv _scale_size)."""
    w, h = size
    return int(w * float(scale) + 0.5), int(h * float(scale) + 0.5)


def rescale_size(old_size, scale, return_scale=False):
    """old_size is (w, h); scale is float or (long, short) tuple."""
    w, h = old_size
    if isinstance(scale, (float, int)):
        scale_factor = scale
    elif isinstance(scale, tuple):
        max_long_edge = max(scale)
        max_short_edge = min(scale)
        scale_factor = min(max_long_edge / max(h, w),
                           max_short_edge / min(h, w))
    else:
        raise TypeError(f'Scale must be number or tuple, got {type(scale)}')
    new_size = _scale_size((w, h), scale_factor)
    if return_scale:
        return new_size, scale_factor
    return new_size


def imrescale(img, scale, return_scale=False, interpolation='bilinear',
              backend='cv2'):
    h, w = img.shape[:2]
    new_size, scale_factor = rescale_size((w, h), scale, return_scale=True)
    rescaled = imresize(img, new_size, interpolation=interpolation,
                        backend=backend)
    if return_scale:
        return rescaled, scale_factor
    return rescaled


def imflip(img, direction='horizontal'):
    assert direction in ('horizontal', 'vertical', 'diagonal')
    if direction == 'horizontal':
        return np.flip(img, axis=1)
    if direction == 'vertical':
        return np.flip(img, axis=0)
    return np.flip(img, axis=(0, 1))


def imnormalize(img, mean, std, to_rgb=True):
    img = img.copy().astype(np.float32)
    # mmcv imnormalize_: float64 mean/std through cv2 in-place ops
    mean = np.float64(mean.reshape(1, -1))
    stdinv = 1 / np.float64(std.reshape(1, -1))
    if to_rgb:
        cv2.cvtColor(img, cv2.COLOR_BGR2RGB, img)
    cv2.subtract(img, mean, img)
    cv2.multiply(img, stdinv, img)
    return img


def impad(img, *, shape=None, padding=None, pad_val=0,
          padding_mode='constant'):
    assert (shape is not None) ^ (padding is not None)
    if shape is not None:
        width = max(shape[1] - img.shape[1], 0)
        height = max(shape[0] - img.shape[0], 0)
        padding = (0, 0, width, height)   # (left, top, right, bottom)
    if isinstance(pad_val, tuple):
        assert len(pad_val) == img.shape[-1]
    assert padding_mode == 'constant'
    return cv2.copyMakeBorder(img, padding[1], padding[3], padding[0],
                              padding[2], cv2.BORDER_CONSTANT,
                              value=pad_val)


def impad_to_multiple(img, divisor, pad_val=0):
    pad_h = int(np.ceil(img.shape[0] / divisor)) * divisor
    pad_w = int(np.ceil(img.shape[1] / divisor)) * divisor
    return impad(img, shape=(pad_h, pad_w), pad_val=pad_val)


# ---------------------------------------------------------------------------
# mmcv.parallel — DataContainer / collate / scatter
# ---------------------------------------------------------------------------
class DataContainer:
    def __init__(self, data, stack=False, padding_value=0, cpu_only=False,
                 pad_dims=2):
        self._data = data
        self._cpu_only = cpu_only
        self._stack = stack
        self._padding_value = padding_value
        assert pad_dims in (None, 1, 2, 3)
        self._pad_dims = pad_dims

    data = property(lambda self: self._data)
    cpu_only = property(lambda self: self._cpu_only)
    stack = property(lambda self: self._stack)
    padding_value = property(lambda self: self._padding_value)
    pad_dims = property(lambda self: self._pad_dims)

    def __repr__(self):
        return f'DataContainer({self._data!r})'


def collate(batch, samples_per_gpu=1):
    """mmcv.parallel.collate: DataContainer-aware batching.

    stack=True DCs are padded (bottom/right over the last pad_dims dims,
    padding_value) to the chunk max shape and torch.stack'ed per
    samples_per_gpu chunk.
    """
    from collections.abc import Mapping, Sequence
    if isinstance(batch[0], DataContainer):
        stacked = []
        if batch[0].cpu_only:
            for i in range(0, len(batch), samples_per_gpu):
                stacked.append(
                    [s.data for s in batch[i:i + samples_per_gpu]])
            return DataContainer(stacked, batch[0].stack,
                                 batch[0].padding_value, cpu_only=True)
        if batch[0].stack:
            for i in range(0, len(batch), samples_per_gpu):
                chunk = batch[i:i + samples_per_gpu]
                assert isinstance(chunk[0].data, torch.Tensor)
                if chunk[0].pad_dims is not None:
                    ndim = chunk[0].data.dim()
                    pad_dims = chunk[0].pad_dims
                    max_shape = [0] * pad_dims
                    for dim in range(1, pad_dims + 1):
                        max_shape[dim - 1] = max(
                            s.data.size(-dim) for s in chunk)
                    padded = []
                    for s in chunk:
                        pad = [0] * pad_dims * 2
                        for dim in range(1, pad_dims + 1):
                            pad[2 * dim - 1] = (max_shape[dim - 1] -
                                                s.data.size(-dim))
                        padded.append(
                            F.pad(s.data, pad, value=s.padding_value))
                    stacked.append(torch.stack(padded))
                    del ndim
                else:
                    stacked.append(
                        torch.stack([s.data for s in chunk]))
            return DataContainer(stacked, batch[0].stack,
                                 batch[0].padding_value)
        for i in range(0, len(batch), samples_per_gpu):
            stacked.append([s.data for s in batch[i:i + samples_per_gpu]])
        return DataContainer(stacked, batch[0].stack,
                             batch[0].padding_value)
    if isinstance(batch[0], Mapping):
        return {k: collate([d[k] for d in batch], samples_per_gpu)
                for k in batch[0]}
    if isinstance(batch[0], Sequence) and not isinstance(batch[0], str):
        transposed = zip(*batch)
        return [collate(list(s), samples_per_gpu) for s in transposed]
    from torch.utils.data.dataloader import default_collate
    return default_collate(batch)


def scatter(inputs, target_devices):
    """Single-device CPU scatter: per device i, pick the i-th chunk of
    every per-GPU list and move tensors to the (cpu) device."""
    def move(x, dev):
        if isinstance(x, torch.Tensor):
            return x.to('cpu' if str(dev).startswith('cpu') else dev)
        return x

    outs = []
    for i, dev in enumerate(target_devices):
        if isinstance(inputs, dict):
            outs.append({k: [move(v[i], dev)] if isinstance(v, list)
                         else move(v, dev) for k, v in inputs.items()})
        else:
            outs.append(move(inputs, dev))
    return outs


# ---------------------------------------------------------------------------
# mmcv.Config — fromfile backed by the repo's legacy-config resolver
# ---------------------------------------------------------------------------
class Config(ConfigDict):
    @staticmethod
    def fromfile(path):
        from mcgaze_tpu.utils.config import load_legacy_dict
        return Config(to_config_dict(load_legacy_dict(path)))

    def get(self, key, default=None):
        return dict.get(self, key, default)

    def merge_from_dict(self, options):
        for full_key, v in options.items():
            d = self
            keys = full_key.split('.')
            for k in keys[:-1]:
                d = d.setdefault(k, ConfigDict())
            d[keys[-1]] = v


# ---------------------------------------------------------------------------
# mmcv.runner.load_checkpoint — torch.load + revise_keys + non-strict load
# ---------------------------------------------------------------------------
def load_checkpoint(model, filename, map_location=None, strict=False,
                    logger=None, revise_keys=[(r'^module\.', '')]):
    checkpoint = torch.load(filename, map_location=map_location,
                            weights_only=False)
    state_dict = checkpoint.get('state_dict', checkpoint)
    for p, r in revise_keys:
        state_dict = {re.sub(p, r, k): v for k, v in state_dict.items()}
    model.load_state_dict(state_dict, strict=strict)
    return checkpoint


def _dump(obj, file=None, file_format=None, **kwargs):
    import json
    if hasattr(file, 'write'):
        json.dump(obj, file)
    else:
        json.dump(obj, open(file, 'w'))


def _load(file, file_format=None, **kwargs):
    import json
    return json.load(open(file))


class DictAction:  # argparse glue; the oracle bypasses parse_args
    pass


def _augment_mmcv():
    """Add the data-path externals to the base shim's mmcv."""
    mmcv = sys.modules['mmcv']
    mmcv.Config = Config
    for fn in (imfrombytes, imresize, imrescale, rescale_size, imflip,
               imnormalize, impad, impad_to_multiple):
        setattr(mmcv, fn.__name__, fn)
    mmcv.use_backend = lambda *a, **k: None
    mmcv.is_str = lambda x: isinstance(x, str)

    def is_list_of(seq, expected_type):
        return isinstance(seq, list) and all(
            isinstance(s, expected_type) for s in seq)

    mmcv.is_list_of = is_list_of
    mmcv.utils.is_str = mmcv.is_str
    mmcv.utils.is_list_of = is_list_of
    mmcv.load = _load
    mmcv.dump = _dump
    mmcv.list_from_file = lambda f: [
        line.rstrip('\n') for line in open(f)]
    mmcv.DictAction = DictAction
    mmcv.utils.print_log = lambda msg, *a, **k: None

    def digit_version(version_str):
        return tuple(int(p) for p in re.findall(r'\d+', version_str)[:3])

    mmcv.utils.TORCH_VERSION = torch.__version__
    mmcv.utils.digit_version = digit_version

    fileio = _pkg('mmcv.fileio')

    class FileClient:
        def __init__(self, backend='disk', **kwargs):
            assert backend == 'disk', backend

        def get(self, filepath):
            with open(filepath, 'rb') as f:
                return f.read()

        def get_text(self, filepath):
            with open(filepath) as f:
                return f.read()

    fileio.FileClient = FileClient
    mmcv.FileClient = FileClient

    parallel = _pkg('mmcv.parallel')
    parallel.DataContainer = DataContainer
    parallel.collate = collate
    parallel.scatter = scatter
    parallel.MMDataParallel = _never_called('MMDataParallel')
    parallel.MMDistributedDataParallel = _never_called(
        'MMDistributedDataParallel')

    runner = sys.modules['mmcv.runner']
    runner.load_checkpoint = load_checkpoint
    runner.get_dist_info = lambda: (0, 1)
    hooks = _pkg('mmcv.runner.hooks')
    hooks.HOOKS = Registry('hook')

    class Hook:
        pass

    hooks.Hook = Hook

    cnn = sys.modules['mmcv.cnn']

    class VGG:   # imported by mmdet/datasets/utils.py, never instantiated
        pass

    cnn.VGG = VGG
    flops = _pkg('mmcv.cnn.utils.flops_counter')

    def add_flops_counting_methods(model):
        model.start_flops_count = lambda: None
        model.stop_flops_count = lambda: None
        return model

    flops.add_flops_counting_methods = add_flops_counting_methods
    flops.flops_to_string = lambda *a, **k: '0 GFLOPs'
    flops.params_to_string = lambda *a, **k: '0 M'

    class RoIPool(torch.nn.Module):   # imported by apis/inference.py
        pass

    sys.modules['mmcv.ops'].RoIPool = RoIPool


def install_data():
    """Execute the reference's dataset/pipeline/apis files. Idempotent."""
    if 'ns' in _CACHE:
        return _CACHE['ns']
    base = reference_shim.install()
    _augment_mmcv()

    # --- external never-called stubs ---
    pyco = _pkg('pycocotools')
    pyco_mask = _pkg('pycocotools.mask')
    for fn in ('frPyObjects', 'decode', 'encode', 'area', 'toBbox',
               'merge', 'iou'):
        setattr(pyco_mask, fn, _never_called(f'pycocotools.mask.{fn}'))
    if 'terminaltables' not in sys.modules:
        tt = _pkg('terminaltables')

        class AsciiTable:
            def __init__(self, *a, **k):
                self.table = ''
                self.inner_footing_row_border = False

        tt.AsciiTable = AsciiTable

    # --- mmdet.core additions the data files import ---
    core = sys.modules['mmdet.core']
    sys.modules['mmdet.core.bbox'].bbox_overlaps = core.bbox_overlaps
    core_utils = _pkg('mmdet.core.utils')
    core_utils.sync_random_seed = lambda seed=None, device=None: (
        seed if seed is not None else 0)

    def find_inside_bboxes(bboxes, img_h, img_w):
        return ((bboxes[..., 0] < img_w) & (bboxes[..., 2] > 0)
                & (bboxes[..., 1] < img_h) & (bboxes[..., 3] > 0))

    core.find_inside_bboxes = find_inside_bboxes
    structures = sys.modules['mmdet.core.mask.structures']
    core.BitmapMasks = structures.BitmapMasks
    core.PolygonMasks = structures.PolygonMasks
    core.eval_map = _never_called('eval_map')
    core.eval_recalls = _never_called('eval_recalls')
    core.get_classes = lambda name: ['person_face']
    evaluation = _pkg('mmdet.core.evaluation',
                      REF + '/mmdet/core/evaluation')
    _imp('mmdet.core.evaluation.bbox_overlaps')   # real numpy file
    evaluation.eval_map = core.eval_map
    evaluation.eval_recalls = core.eval_recalls

    mmdet_utils = sys.modules['mmdet.utils']
    mmdet_utils.log_img_scale = lambda *a, **k: None

    # --- the real datasets package files ---
    datasets = _pkg('mmdet.datasets', REF + '/mmdet/datasets')
    # pipelines + samplers import as REAL sub-packages (their actual
    # __init__.py files execute, pulling every transform/sampler file)
    _imp('mmdet.datasets.samplers')
    builder = _imp('mmdet.datasets.builder')
    pipelines = _imp('mmdet.datasets.pipelines')
    custom = _imp('mmdet.datasets.custom')
    mpeblink_api = _imp('mmdet.datasets.mpeblink_api')
    datasets.builder = builder
    datasets.custom = custom
    datasets.DATASETS = builder.DATASETS
    datasets.PIPELINES = builder.PIPELINES
    datasets.CustomDataset = custom.CustomDataset
    gaze360 = _imp('mmdet.datasets.gaze360')
    datasets.Gaze360Dataset = gaze360.Gaze360Dataset

    # replace_ImageToTensor (datasets/utils.py) needs dummy model heads
    dense_heads = sys.modules['mmdet.models.dense_heads']
    for name in ('GARPNHead', 'RPNHead'):
        if not hasattr(dense_heads, name):
            setattr(dense_heads, name, type(name, (), {}))
    mask_heads = sys.modules['mmdet.models.roi_heads.mask_heads']
    if not hasattr(mask_heads, 'FusedSemanticHead'):
        mask_heads.FusedSemanticHead = type('FusedSemanticHead', (), {})
    ds_utils = _imp('mmdet.datasets.utils')
    datasets.replace_ImageToTensor = ds_utils.replace_ImageToTensor

    # blink_sampled.py imports the external youtubevos cocoapi
    # (pycocotools.ytvos.YTVOS); the reference VENDORS the same API as
    # mpeblink_api.MPEblink, so that is the faithful stand-in
    ytvos_mod = _pkg('pycocotools.ytvos')
    ytvos_mod.YTVOS = mpeblink_api.MPEblink
    blink_sampled = _imp('mmdet.datasets.blink_sampled')
    datasets.YoutubeVISDataset_Sampled = \
        blink_sampled.YoutubeVISDataset_Sampled

    # --- mmdet.apis.init_detector (real file) ---
    _pkg('mmdet.apis', REF + '/mmdet/apis')
    inference = _imp('mmdet.apis.inference')
    sys.modules['mmdet.apis'].init_detector = inference.init_detector

    ns = types.SimpleNamespace(
        base=base,
        Gaze360Dataset=gaze360.Gaze360Dataset,
        CustomDataset=custom.CustomDataset,
        MPEblink=mpeblink_api.MPEblink,
        YoutubeVISDataset_Sampled=blink_sampled.YoutubeVISDataset_Sampled,
        Compose=pipelines.Compose,
        PIPELINES=builder.PIPELINES,
        DATASETS=builder.DATASETS,
        DataContainer=DataContainer,
        collate=collate,
        scatter=scatter,
        Config=Config,
        init_detector=inference.init_detector,
        replace_ImageToTensor=ds_utils.replace_ImageToTensor,
    )
    _CACHE['ns'] = ns
    return ns


def load_reference_eval_driver():
    """Import the reference's tools/test_gaze360_gaze.py as a module
    (shim installed), exposing its main(args)."""
    install_data()
    if 'driver' in _CACHE:
        return _CACHE['driver']
    spec = importlib.util.spec_from_file_location(
        'ref_tools_test_gaze360_gaze',
        osp.join(REF, 'tools', 'test_gaze360_gaze.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _CACHE['driver'] = mod
    return mod
