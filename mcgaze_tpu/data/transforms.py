"""Clip-consistent image/box/gaze transforms (host-side numpy + cv2).

Re-implements the reference pipeline for the two shipped settings
(configs/_base_/datasets/gaze360.py:9-36, configs/multiclue_gaze/
multiclue_gaze_r50_l2cs.py:14-41):

  gaze360 train: CenterCrop(0.68, relative_range) -> Resize(224 keep_ratio)
                 -> Flip(0.5) -> Normalize(ImageNet) -> Pad(/32)
  l2cs train:    Resize(448 keep_ratio) -> Flip(0.5) -> Normalize -> Pad

The reference latches random parameters across a clip with the `isfix`
flag hack (gaze360.py:360-367, transforms.py:1132-1144); here clip-level
determinism is explicit: `ClipParams` is sampled ONCE per clip and applied
to every frame.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import cv2
import numpy as np

IMAGENET_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
IMAGENET_STD = np.array([58.395, 57.12, 57.375], np.float32)


@dataclasses.dataclass
class ClipParams:
    """Per-clip random augmentation parameters (sampled once per clip)."""
    crop_ratio: Optional[float] = None   # in [crop_size, 1]; None = no crop
    flip: bool = False


def sample_clip_params(rng: np.random.RandomState, crop_size: float | None,
                       flip_ratio: float) -> ClipParams:
    """crop_size: relative_range lower bound (e.g. 0.68) or None.

    The reference samples ONE ratio shared by h and w
    (transforms.py:1128-1130 'rand(1)', deliberately not rand(2))."""
    ratio = None
    if crop_size is not None:
        ratio = float(crop_size + rng.rand() * (1.0 - crop_size))
    flip = bool(rng.rand() < flip_ratio)
    return ClipParams(crop_ratio=ratio, flip=flip)


def crop_offsets(h: int, w: int, ratio: float):
    """(ch, cw, off_h, off_w) of the deterministic centre crop
    (reference CenterCrop: size = int(dim*ratio + 0.5), offset =
    int(margin/2 + 0.5), transforms.py:1022-1043)."""
    ch = int(h * ratio + 0.5)
    cw = int(w * ratio + 0.5)
    off_h = int(max(h - ch, 0) / 2 + 0.5)
    off_w = int(max(w - cw, 0) / 2 + 0.5)
    return ch, cw, off_h, off_w


def crop_box_geometry(boxes: np.ndarray, valid: np.ndarray,
                      off_w: int, off_h: int, cw: int, ch: int):
    """Shared GT arithmetic of the centre crop: shift boxes into the
    crop, clip, apply the corrupted-sample repair (face/eyes pushed out
    -> copy the head box, reference transforms.py:1063-1073), and decide
    keep/reject. Single home for this logic — center_crop (pixel path)
    and process_frame_geometry (native-loader path) both call it.

    Returns (boxes, valid, ok); ok False = the crop killed every GT
    (reference returns None -> caller resamples)."""
    boxes = boxes - np.array([off_w, off_h, off_w, off_h], np.float32)
    boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, cw)
    boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, ch)
    alive = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
    valid = valid.copy()
    n_gt = int(valid.sum())
    ok = True
    if n_gt == 3:
        if not alive[list(np.where(valid > 0)[0])].all():
            boxes[0] = boxes[2]
            boxes[1] = boxes[2]
            alive[:] = True
    elif n_gt == 1 and not alive[2]:
        ok = False
    ok = ok and (bool((alive & (valid > 0)).any()) or n_gt == 0)
    valid = valid * alive.astype(np.float32)
    boxes = boxes * valid[:, None]
    return boxes, valid, ok


def center_crop(img: np.ndarray, ratio: float,
                boxes: np.ndarray | None = None,
                valid: np.ndarray | None = None):
    """Deterministic center crop to (h*ratio, w*ratio) (+0.5 rounding).

    boxes: (3, 4) xyxy slot layout or None; valid: (3,) mask.
    Returns (img, boxes, valid, ok).
    """
    h, w = img.shape[:2]
    ch, cw, off_h, off_w = crop_offsets(h, w, ratio)
    img = img[off_h:off_h + ch, off_w:off_w + cw]
    if boxes is None:
        return img, None, None, True
    nh, nw = img.shape[:2]
    boxes, valid, ok = crop_box_geometry(boxes, valid, off_w, off_h,
                                         nw, nh)
    return img, boxes, valid, ok


def rescale_size(h: int, w: int, scale: Tuple[int, int]) -> Tuple[int, int]:
    """mmcv.rescale_size: fit (h, w) into `scale` keeping aspect ratio."""
    max_long, max_short = max(scale), min(scale)
    f = min(max_long / max(h, w), max_short / min(h, w))
    return int(w * f + 0.5), int(h * f + 0.5)  # (new_w, new_h)


def resize_keep_ratio(img: np.ndarray, scale: Tuple[int, int],
                      boxes: np.ndarray | None = None):
    """Returns (img, boxes, scale_factor (4,) [wf, hf, wf, hf])."""
    h, w = img.shape[:2]
    new_w, new_h = rescale_size(h, w, scale)
    img = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    sf = np.array([new_w / w, new_h / h, new_w / w, new_h / h], np.float32)
    if boxes is not None:
        boxes = boxes * sf
        boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, new_w)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, new_h)
    return img, boxes, sf


def hflip(img: np.ndarray, boxes: np.ndarray | None,
          gazes: np.ndarray | None):
    """Horizontal flip of image/boxes + gaze x-negation
    (reference RandomFlip.gaze_flip, transforms.py:432-458)."""
    img = img[:, ::-1]
    w = img.shape[1]
    if boxes is not None:
        flipped = boxes.copy()
        flipped[:, 0] = w - boxes[:, 2]
        flipped[:, 2] = w - boxes[:, 0]
        boxes = flipped
    if gazes is not None:
        gazes = gazes.copy()
        gazes[:, 0] = -gazes[:, 0]
    return img, boxes, gazes


def normalize(img: np.ndarray) -> np.ndarray:
    return (img.astype(np.float32) - IMAGENET_MEAN) / IMAGENET_STD


def pad_to_canvas(img: np.ndarray, canvas: Tuple[int, int]) -> np.ndarray:
    """Zero-pad bottom/right to a FIXED canvas (TPU static shapes; the
    reference pads to /32 then to batch max — a fixed canvas is the
    superset and keeps every compiled shape identical)."""
    h, w = img.shape[:2]
    out = np.zeros((canvas[0], canvas[1], img.shape[2]), img.dtype)
    out[:h, :w] = img
    return out


def process_frame_geometry(orig_hw: Tuple[int, int],
                           params: ClipParams,
                           scale: Tuple[int, int],
                           boxes: np.ndarray | None = None,
                           valid: np.ndarray | None = None,
                           gazes: np.ndarray | None = None):
    """Box/gaze/shape arithmetic of process_frame WITHOUT touching pixels.

    Lets the native C++ loader (native/clip_loader.cpp) own the image work
    while Python owns GT geometry — and lets the crop-rejection resample
    happen BEFORE any decode (the reference decodes first and throws the
    work away, gaze360.py:343-358).

    Returns dict(img_shape, whwh, scale_factor, boxes, valid, gazes, ok).
    """
    h, w = orig_hw
    ok = True
    if params.crop_ratio is not None:
        ch, cw, off_h, off_w = crop_offsets(h, w, params.crop_ratio)
        if boxes is not None:
            boxes, valid, ok = crop_box_geometry(boxes, valid, off_w,
                                                 off_h, cw, ch)
        h, w = ch, cw
    new_w, new_h = rescale_size(h, w, scale)
    sf = np.array([new_w / w, new_h / h, new_w / w, new_h / h], np.float32)
    if boxes is not None:
        boxes = boxes * sf
        boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, new_w)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, new_h)
    if params.flip:
        if boxes is not None:
            flipped = boxes.copy()
            flipped[:, 0] = new_w - boxes[:, 2]
            flipped[:, 2] = new_w - boxes[:, 0]
            boxes = flipped
        if gazes is not None:
            gazes = gazes.copy()
            gazes[:, 0] = -gazes[:, 0]
    return dict(img_shape=(new_h, new_w),
                whwh=np.array([new_w, new_h, new_w, new_h], np.float32),
                scale_factor=sf, boxes=boxes, valid=valid, gazes=gazes,
                ok=ok)


def process_frame(img: np.ndarray,
                  params: ClipParams,
                  scale: Tuple[int, int],
                  canvas: Tuple[int, int],
                  boxes: np.ndarray | None = None,
                  valid: np.ndarray | None = None,
                  gazes: np.ndarray | None = None):
    """Full per-frame pipeline. img: HxWx3 RGB uint8.

    Returns dict(img (canvas,3) float32, img_shape (h, w) after resize,
    whwh (4,), boxes, valid, gazes, ok).
    """
    ok = True
    if params.crop_ratio is not None:
        img, boxes, valid, ok = center_crop(img, params.crop_ratio, boxes,
                                            valid)
    img, boxes, sf = resize_keep_ratio(img, scale, boxes)
    if params.flip:
        img, boxes, gazes = hflip(img, boxes, gazes)
    h, w = img.shape[:2]
    img = pad_to_canvas(normalize(img), canvas)
    return dict(img=img, img_shape=(h, w),
                whwh=np.array([w, h, w, h], np.float32),
                scale_factor=sf, boxes=boxes, valid=valid, gazes=gazes,
                ok=ok)
