"""YOLOv5 head detector (demo component), TPU-native inference.

The reference demo vendors a full YOLOv5 fork and runs `crowdhuman_yolov5m.pt`
to produce per-frame head boxes (`MCGaze_demo/head_det.py`,
`MCGaze_demo/yolo_head/detect.py:137-167`; labels `cls x1 y1 x2 y2` in
original-image pixels, class 1 = head). This module rebuilds the exact
network family described by the vendored `models/yolov5m.yaml` —
Focus stem, C3 stages, SPP, PANet neck, 3-level anchor Detect head, SiLU —
as static-shape flax modules (NHWC), plus:

  * anchor decode as pure jnp (sigmoid grid decode, yolov5 v4 semantics),
  * class-aware NMS with STATIC shapes (top-k + O(K^2) suppression matrix)
    that runs under jit — no dynamic-shape torchvision NMS,
  * a torch state_dict -> flax converter keyed on the yaml layer indices.

Layer indexing follows the yaml: layers 0..9 backbone, 10..23 neck,
24 Detect; skip connections cat([-1, 6]) etc. are wired explicitly below.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

DEFAULT_ANCHORS = (
    ((10, 13), (16, 30), (33, 23)),       # P3/8
    ((30, 61), (62, 45), (59, 119)),      # P4/16
    ((116, 90), (156, 198), (373, 326)),  # P5/32
)
STRIDES = (8, 16, 32)


@dataclasses.dataclass(frozen=True)
class YoloConfig:
    num_classes: int = 2            # crowdhuman: 0=person, 1=head
    depth_multiple: float = 0.67    # yolov5m
    width_multiple: float = 0.75
    anchors: Tuple = DEFAULT_ANCHORS
    img_size: int = 640
    dtype: str = 'float32'

    def width(self, c: int) -> int:
        return int(math.ceil(c * self.width_multiple / 8) * 8)

    def depth(self, n: int) -> int:
        return max(round(n * self.depth_multiple), 1) if n > 1 else n


class ConvBlock(nn.Module):
    """Conv + BN + SiLU (yolo_head/models/common.py:29-38)."""
    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    (self.stride, self.stride),
                    padding=[(p, p), (p, p)], use_bias=False,
                    dtype=self.dtype, name='conv')(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         momentum=0.97, dtype=self.dtype, name='bn')(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ConvBlock(self.features, 1, dtype=self.dtype, name='cv1')(x)
        y = ConvBlock(self.features, 3, dtype=self.dtype, name='cv2')(y)
        return x + y if self.shortcut and x.shape[-1] == self.features else y


class C3(nn.Module):
    """CSP bottleneck with 3 convs (common.py C3)."""
    features: int
    n: int = 1
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_ = self.features // 2
        a = ConvBlock(c_, 1, dtype=self.dtype, name='cv1')(x)
        b = ConvBlock(c_, 1, dtype=self.dtype, name='cv2')(x)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, dtype=self.dtype,
                           name=f'm{i}')(a)
        return ConvBlock(self.features, 1, dtype=self.dtype,
                         name='cv3')(jnp.concatenate([a, b], -1))


class SPP(nn.Module):
    """Spatial pyramid pooling, kernels (5, 9, 13)."""
    features: int
    kernels: Sequence[int] = (5, 9, 13)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_ = x.shape[-1] // 2
        x = ConvBlock(c_, 1, dtype=self.dtype, name='cv1')(x)
        pools = [x] + [
            nn.max_pool(x, (k, k), strides=(1, 1),
                        padding=[(k // 2, k // 2)] * 2)
            for k in self.kernels]
        return ConvBlock(self.features, 1, dtype=self.dtype,
                         name='cv2')(jnp.concatenate(pools, -1))


class Focus(nn.Module):
    """Space-to-depth stem: 2x2 pixel de-interleave then 3x3 conv."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.concatenate([x[:, ::2, ::2], x[:, 1::2, ::2],
                             x[:, ::2, 1::2], x[:, 1::2, 1::2]], -1)
        return ConvBlock(self.features, 3, dtype=self.dtype, name='conv')(x)


def _upsample2(x):
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), 'nearest')


class YoloV5(nn.Module):
    """Backbone + PANet; returns raw per-level Detect maps."""
    cfg: YoloConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        w, d = cfg.width, cfg.depth
        # backbone (yaml layers 0-9)
        x = Focus(w(64), dtype=dt, name='l0')(x)
        x = ConvBlock(w(128), 3, 2, dtype=dt, name='l1')(x)
        x = C3(w(128), d(3), dtype=dt, name='l2')(x)
        x = ConvBlock(w(256), 3, 2, dtype=dt, name='l3')(x)
        p3 = C3(w(256), d(9), dtype=dt, name='l4')(x)
        x = ConvBlock(w(512), 3, 2, dtype=dt, name='l5')(p3)
        p4 = C3(w(512), d(9), dtype=dt, name='l6')(x)
        x = ConvBlock(w(1024), 3, 2, dtype=dt, name='l7')(p4)
        x = SPP(w(1024), dtype=dt, name='l8')(x)
        x = C3(w(1024), d(3), False, dtype=dt, name='l9')(x)
        # neck (yaml layers 10-23)
        t10 = ConvBlock(w(512), 1, 1, dtype=dt, name='l10')(x)
        x = jnp.concatenate([_upsample2(t10), p4], -1)          # 11, 12
        x = C3(w(512), d(3), False, dtype=dt, name='l13')(x)
        t14 = ConvBlock(w(256), 1, 1, dtype=dt, name='l14')(x)
        x = jnp.concatenate([_upsample2(t14), p3], -1)          # 15, 16
        o17 = C3(w(256), d(3), False, dtype=dt, name='l17')(x)
        x = ConvBlock(w(256), 3, 2, dtype=dt, name='l18')(o17)
        x = jnp.concatenate([x, t14], -1)                       # 19
        o20 = C3(w(512), d(3), False, dtype=dt, name='l20')(x)
        x = ConvBlock(w(512), 3, 2, dtype=dt, name='l21')(o20)
        x = jnp.concatenate([x, t10], -1)                       # 22
        o23 = C3(w(1024), d(3), False, dtype=dt, name='l23')(x)
        # Detect head (yaml layer 24): 1x1 conv per level
        na = len(cfg.anchors[0])
        no = cfg.num_classes + 5
        outs = []
        for i, feat in enumerate((o17, o20, o23)):
            outs.append(nn.Conv(na * no, (1, 1), dtype=dt,
                                name=f'det{i}')(feat))
        return outs


def decode_predictions(cfg: YoloConfig, level_maps: Sequence[jnp.ndarray]):
    """Raw maps -> (N, total_anchors, 5+nc) [xc, yc, w, h, obj, cls...]
    in input-image pixels (yolov5 v4 decode: xy=(2s-0.5+grid)*stride,
    wh=(2s)^2*anchor)."""
    no = cfg.num_classes + 5
    na = len(cfg.anchors[0])
    outs = []
    for li, fmap in enumerate(level_maps):
        n, h, w, _ = fmap.shape
        stride = STRIDES[li]
        p = fmap.reshape(n, h, w, na, no)
        p = jax.nn.sigmoid(p.astype(jnp.float32))
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32),
                              indexing='ij')
        grid = jnp.stack([gx, gy], -1)[None, :, :, None]    # (1,H,W,1,2)
        anchors = jnp.asarray(cfg.anchors[li],
                              jnp.float32)[None, None, None]  # (1,1,1,na,2)
        xy = (p[..., :2] * 2.0 - 0.5 + grid) * stride
        wh = (p[..., 2:4] * 2.0) ** 2 * anchors
        out = jnp.concatenate([xy, wh, p[..., 4:]], -1)
        outs.append(out.reshape(n, h * w * na, no))
    return jnp.concatenate(outs, axis=1)


def nms_static(boxes_xyxy, scores, iou_thres=0.45, max_det=300):
    """Static-shape class-agnostic NMS under jit.

    boxes (A, 4), scores (A,) -> (keep_boxes (max_det, 4),
    keep_scores (max_det,), keep_idx (max_det,)); suppressed entries have
    score 0. Strategy: top-k to max_det candidates, then an O(K^2)
    greedy suppression computed with a scan over the score-sorted list —
    all shapes static, all ops MXU/VPU friendly.
    """
    k = min(max_det, boxes_xyxy.shape[0])
    scores_k, idx = jax.lax.top_k(scores, k)
    bx = boxes_xyxy[idx]
    area = jnp.maximum(bx[:, 2] - bx[:, 0], 0) * \
        jnp.maximum(bx[:, 3] - bx[:, 1], 0)
    lt = jnp.maximum(bx[:, None, :2], bx[None, :, :2])
    rb = jnp.minimum(bx[:, None, 2:], bx[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    iou = inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-9)
    overlaps = iou > iou_thres

    def body(keep, i):
        # keep[i] survives iff no higher-scored kept box overlaps it
        sup = jnp.any(overlaps[i] & keep & (jnp.arange(k) < i))
        keep = keep.at[i].set(~sup)
        return keep, None

    keep, _ = jax.lax.scan(body, jnp.zeros((k,), bool), jnp.arange(k))
    return bx, jnp.where(keep, scores_k, 0.0), idx


def postprocess(cfg: YoloConfig, preds, conf_thres=0.25, iou_thres=0.45,
                max_det=300):
    """(A, 5+nc) single image -> per-class NMS'd detections.

    Returns (boxes (max_det, 4) xyxy, scores (max_det,), classes (max_det,))
    with zero score marking empty slots. Class-aware NMS via the yolov5
    coordinate-offset trick (offset boxes by class * 4096).
    """
    xy, wh = preds[:, :2], preds[:, 2:4]
    boxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], -1)
    cls_scores = preds[:, 5:] * preds[:, 4:5]     # obj * cls conf
    best_cls = jnp.argmax(cls_scores, -1)
    best_score = jnp.max(cls_scores, -1)
    best_score = jnp.where(best_score >= conf_thres, best_score, 0.0)
    off_boxes = boxes + (best_cls.astype(jnp.float32) * 4096.0)[:, None]
    kb, ks, ki = nms_static(off_boxes, best_score, iou_thres, max_det)
    return boxes[ki], ks, best_cls[ki]


def letterbox(img: np.ndarray, size: int = 640, pad_value: int = 114):
    """Aspect-preserving resize onto a size x size canvas (stride-32 padded
    like the reference's dataloader). Returns (canvas, scale, (dx, dy))."""
    import cv2
    h, w = img.shape[:2]
    r = min(size / h, size / w)
    nh, nw = int(round(h * r)), int(round(w * r))
    resized = cv2.resize(img, (nw, nh),
                         interpolation=cv2.INTER_LINEAR)
    canvas = np.full((size, size, 3), pad_value, np.uint8)
    dy, dx = (size - nh) // 2, (size - nw) // 2
    canvas[dy:dy + nh, dx:dx + nw] = resized
    return canvas, r, (dx, dy)


class HeadDetector:
    """End-to-end frame -> head boxes, one jit per canvas size."""

    def __init__(self, variables, cfg: YoloConfig = YoloConfig(),
                 conf_thres: float = 0.25, iou_thres: float = 0.45,
                 max_det: int = 300):
        self.cfg = cfg
        self.variables = variables
        model = YoloV5(cfg)

        @jax.jit
        def _run(variables, imgs):
            maps = model.apply(variables, imgs)
            preds = decode_predictions(cfg, maps)
            return jax.vmap(
                lambda p: postprocess(cfg, p, conf_thres, iou_thres,
                                      max_det))(preds)

        self._run = _run

    def __call__(self, frames_bgr: Sequence[np.ndarray],
                 head_class: int = 1):
        """frames (BGR uint8) -> list of (M, 5) [x1,y1,x2,y2,score] head
        boxes in original-image pixels."""
        size = self.cfg.img_size
        canvases, metas = [], []
        for f in frames_bgr:
            canvas, r, (dx, dy) = letterbox(f[..., ::-1], size)
            canvases.append(canvas.astype(np.float32) / 255.0)
            metas.append((r, dx, dy, f.shape[1], f.shape[0]))
        boxes, scores, classes = self._run(self.variables,
                                           jnp.stack(canvases))
        boxes, scores, classes = map(np.asarray, (boxes, scores, classes))
        out = []
        for i, (r, dx, dy, w, h) in enumerate(metas):
            m = (scores[i] > 0) & (classes[i] == head_class)
            b = boxes[i][m]
            b[:, [0, 2]] = np.clip((b[:, [0, 2]] - dx) / r, 0, w)
            b[:, [1, 3]] = np.clip((b[:, [1, 3]] - dy) / r, 0, h)
            out.append(np.concatenate([b, scores[i][m, None]], -1))
        return out


def init_yolo(cfg: YoloConfig, rng):
    model = YoloV5(cfg)
    x = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32)
    import jax
    return model, jax.jit(model.init)(rng, x)


# ---------------------------------------------------------------- converter

def convert_torch_yolo(state_dict: Dict[str, Any],
                       cfg: YoloConfig) -> Dict[str, Any]:
    """torch state_dict ('model.{i}.' layer names) -> flax variables.

    Accepts both bare and 'model.'-prefixed key styles (yolov5 ckpts store
    the EMA model under ckpt['model']; pass its .state_dict()).
    """
    import torch

    def get(name):
        for k in (name, 'model.' + name):
            if k in state_dict:
                t = state_dict[k]
                return np.asarray(t.detach().cpu().numpy()
                                  if torch.is_tensor(t) else t)
        raise KeyError(name)

    def conv_kernel(name):
        return get(name).transpose(2, 3, 1, 0)      # OIHW -> HWIO

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def conv_block(flax_path, torch_prefix):
        put(params, flax_path + ['conv', 'kernel'],
            conv_kernel(torch_prefix + '.conv.weight'))
        put(params, flax_path + ['bn', 'scale'],
            get(torch_prefix + '.bn.weight'))
        put(params, flax_path + ['bn', 'bias'],
            get(torch_prefix + '.bn.bias'))
        put(stats, flax_path + ['bn', 'mean'],
            get(torch_prefix + '.bn.running_mean'))
        put(stats, flax_path + ['bn', 'var'],
            get(torch_prefix + '.bn.running_var'))

    def c3(flax_name, idx, n):
        for cv in ('cv1', 'cv2', 'cv3'):
            conv_block([flax_name, cv], f'model.{idx}.{cv}')
        for j in range(n):
            for cv in ('cv1', 'cv2'):
                conv_block([flax_name, f'm{j}', cv],
                           f'model.{idx}.m.{j}.{cv}')

    d = cfg.depth
    conv_block(['l0', 'conv'], 'model.0.conv')      # Focus
    conv_block(['l1'], 'model.1')
    c3('l2', 2, d(3))
    conv_block(['l3'], 'model.3')
    c3('l4', 4, d(9))
    conv_block(['l5'], 'model.5')
    c3('l6', 6, d(9))
    conv_block(['l7'], 'model.7')
    for cv in ('cv1', 'cv2'):                       # SPP
        conv_block(['l8', cv], f'model.8.{cv}')
    c3('l9', 9, d(3))
    conv_block(['l10'], 'model.10')
    c3('l13', 13, d(3))
    conv_block(['l14'], 'model.14')
    c3('l17', 17, d(3))
    conv_block(['l18'], 'model.18')
    c3('l20', 20, d(3))
    conv_block(['l21'], 'model.21')
    c3('l23', 23, d(3))
    for i in range(3):                              # Detect convs
        put(params, [f'det{i}', 'kernel'],
            conv_kernel(f'model.24.m.{i}.weight'))
        put(params, [f'det{i}', 'bias'], get(f'model.24.m.{i}.bias'))
    return {'params': params, 'batch_stats': stats}
