"""Training-data parity: the REFERENCE's executed dataset + aug pipeline
vs this repo's data layer, on the same fabricated tree with matched
random draws.

What executes from /root/reference (via tests/reference_data_shim.py):
  Gaze360Dataset.prepare_train_clip      (gaze360.py:319-380: window
      padding over annotated frames, the isfix latch, per-key stacking)
  LoadImageFromFile / LoadAnnotations    (pipelines/loading.py)
  CenterCrop relative_range              (pipelines/transforms.py:953-1160,
      incl. the face/eyes corrupted-sample repair :1063-1073)
  Resize keep_ratio / RandomFlip+gaze_flip (:432-516) / Normalize / Pad
  DefaultFormatBundle / Collect          (pipelines/formatting.py)

The randomness contract: the reference draws ONE np.random.rand(1) for
the clip's crop ratio (latched by isfix) and ONE np.random.choice for
the flip; the oracle scripts those two draws and feeds the same values
to our Gaze360ClipDataset's RNG, then asserts per-frame image tensors,
boxes, gazes and valid masks are equal.
"""
import json
import os.path as osp

import numpy as np
import pytest
import torch

from mcgaze_tpu.data.dataset import DataConfig, Gaze360ClipDataset
from tests.test_data_and_driver import H, W, make_dataset

pytestmark = pytest.mark.filterwarnings('ignore::UserWarning')


class ScriptedRng:
    """Stands in for both numpy.random module calls (reference side) and
    our dataset's RandomState: every rand() pops the next scripted draw."""

    def __init__(self, draws):
        self.draws = list(draws)
        self.calls = 0

    def rand(self, *shape):
        self.calls += 1
        v = self.draws.pop(0)
        if shape:
            return np.full(shape, v)
        return v


def _build_reference_dataset(ann_file, img_prefix, clip_length=7):
    from tests.reference_data_shim import install_data
    ns = install_data()
    train_pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True, with_gaze=True,
             with_id=True),
        dict(type='CenterCrop', crop_size=(0.68, 0.68),
             crop_type='relative_range'),
        dict(type='Resize', img_scale=(224, 224), keep_ratio=True),
        dict(type='RandomFlip', flip_ratio=0.5),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375], to_rgb=True),
        dict(type='Pad', size_divisor=32),
        dict(type='DefaultFormatBundle'),
        dict(type='Collect',
             keys=['img', 'gt_bboxes', 'gt_labels', 'gt_gazes', 'gt_ids']),
    ]
    return ns.Gaze360Dataset(ann_file=ann_file, pipeline=train_pipeline,
                             clip_length=clip_length, img_prefix=img_prefix)


@pytest.fixture(scope='module')
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('refdata'))
    ann, prefix = make_dataset(root, num_videos=2, length=12,
                               head_only_frames=(3,))
    return ann, prefix


@pytest.fixture(scope='module')
def ref_ds(tree):
    ann, prefix = tree
    return _build_reference_dataset(ann, prefix)


def _ours(tree, use_native):
    ann, prefix = tree
    cfg = DataConfig(ann_file=ann, img_prefix=prefix, clip_length=7,
                     scale=(224, 224), canvas=(224, 224), crop_size=0.68,
                     flip_ratio=0.5, ship_uint8=False)
    return Gaze360ClipDataset(cfg, use_native=use_native)


def _run_reference_clip(ref_ds, idx, ratio_draw, flip, monkeypatch):
    """One executed-reference prepare_train_clip with scripted randomness.

    Returns (data dict of DataContainers, n_rand_calls, n_choice_calls)."""
    rng = ScriptedRng([ratio_draw])
    choices = []

    def scripted_choice(options, p=None):
        choices.append(list(options))
        # RandomFlip's direction_list is [direction..., None]
        return 'horizontal' if flip else None

    monkeypatch.setattr(np.random, 'rand', rng.rand)
    monkeypatch.setattr(np.random, 'choice', scripted_choice)
    data = ref_ds.prepare_train_clip(idx)
    return data, rng.calls, len(choices)


def _run_our_clip(ds, idx, ratio_draw, flip):
    # sample_clip_params draws rand() for ratio then rand() for flip
    ds.rng = ScriptedRng([ratio_draw, 0.2 if flip else 0.9])
    return ds.get_clip(idx)


def _assert_clip_equal(ref_data, ours, head_only_frames=()):
    T = ours['imgs'].shape[0]
    ref_imgs = ref_data['img'].data            # (T, 3, Hp, Wp) CHW
    assert ref_imgs.shape[0] == T
    for t in range(T):
        h, w = int(ours['img_whwh'][t, 1]), int(ours['img_whwh'][t, 0])
        ref_img = ref_imgs[t].permute(1, 2, 0).numpy()
        # reference pads to /32 of the resized shape; ours to the fixed
        # canvas — content region must match, padding is zero in both
        assert ref_img.shape[0] >= h and ref_img.shape[1] >= w
        np.testing.assert_allclose(ours['imgs'][t, :h, :w],
                                   ref_img[:h, :w], atol=2e-4,
                                   err_msg=f'frame {t} pixels')
        assert np.abs(ref_img[h:]).max(initial=0.0) == 0.0
        assert np.abs(ours['imgs'][t, h:]).max(initial=0.0) == 0.0

        ref_boxes = ref_data['gt_bboxes'].data[t].numpy()
        ref_gazes = ref_data['gt_gazes'].data[t].numpy()
        valid = ours['gt_valid'][t] > 0
        if ref_boxes.shape[0] == 3:
            assert valid.all()
            np.testing.assert_allclose(ours['gt_boxes'][t], ref_boxes,
                                       atol=1e-3, err_msg=f'frame {t} boxes')
            np.testing.assert_allclose(ours['gt_gazes'][t], ref_gazes,
                                       atol=1e-6, err_msg=f'frame {t} gazes')
        else:
            # head-only frame: single GT row = the head slot
            assert ref_boxes.shape[0] == 1
            assert list(valid) == [False, False, True]
            np.testing.assert_allclose(ours['gt_boxes'][t, 2], ref_boxes[0],
                                       atol=1e-3)
            np.testing.assert_allclose(ours['gt_gazes'][t, 2], ref_gazes[0],
                                       atol=1e-6)
        # labels are all class 0 (person_face)
        assert (ref_data['gt_labels'].data[t].numpy() == 0).all()


@pytest.mark.parametrize('idx,ratio_draw,flip', [
    (0, 0.5, False),    # video start: window padded with first frame
    (5, 0.0, True),     # mid-video + flip, crop at the 0.68 lower bound
    (8, 0.99, False),   # near-full crop
    (14, 0.3, True),    # second video (window crosses head-only frame 3)
])
def test_train_clip_matches_reference(tree, ref_ds, idx, ratio_draw, flip,
                                      monkeypatch):
    ours_ds = _ours(tree, use_native=None)
    # index parity: both datasets enumerate (video, annotated-frame) pairs
    assert len(ref_ds.data_infos) == len(ours_ds.index)
    ref_data, n_rand, n_choice = _run_reference_clip(
        ref_ds, idx, ratio_draw, flip, monkeypatch)
    # the isfix latch: ONE crop draw + ONE flip draw for all 7 frames
    assert n_rand == 1 and n_choice == 1
    ours = _run_our_clip(_ours(tree, use_native=None), idx, ratio_draw, flip)
    assert ours is not None
    _assert_clip_equal(ref_data, ours)


def test_window_padding_matches_reference(tree, ref_ds, monkeypatch):
    """End-of-video windows, and a quirk this oracle DISCOVERED by
    executing the reference: prepare_train_clip unlatches isfix after the
    FIRST occurrence of the last window index (gaze360.py:365-367
    `elif _ == valid_idxs[-1]`), so the duplicated trailing pad frames
    each re-draw crop ratio AND flip. Our dataset deliberately keeps one
    ClipParams for the whole clip (clip-consistent aug); scripting every
    reference draw to the same value makes the two equal while the call
    counts pin the quirk. See PARITY.md."""
    ours_ds = _ours(tree, use_native=None)
    last = len(ours_ds.index) - 1
    # window = [L-4, L-3, L-2, L-1, L-1, L-1, L-1]: 1 latched draw + 3
    # re-draws for the trailing duplicates
    rng = ScriptedRng([0.5] * 4)
    n_choice = [0]

    def scripted_choice(options, p=None):
        n_choice[0] += 1
        return None   # never flip

    monkeypatch.setattr(np.random, 'rand', rng.rand)
    monkeypatch.setattr(np.random, 'choice', scripted_choice)
    ref_data = ref_ds.prepare_train_clip(last)
    assert rng.calls == 4 and n_choice[0] == 4   # the quirk, pinned
    ours = _run_our_clip(_ours(tree, use_native=None), last, 0.5, False)
    _assert_clip_equal(ref_data, ours)
    # the final window duplicates the last annotated frame
    imgs = ref_data['img'].data.numpy()
    assert np.array_equal(imgs[-1], imgs[-2])


def test_face_eyes_repair_matches_reference(tmp_path, monkeypatch):
    """The corrupted-sample repair (transforms.py:1063-1073): when the
    centre crop pushes face/eyes out but the head survives, BOTH stacks
    copy the head box into the face and eyes slots."""
    import cv2
    root = str(tmp_path)
    rng = np.random.RandomState(3)
    names = []
    for f in range(7):
        name = f'001/{f:05d}.png'
        p = osp.join(root, 'frames', name)
        import os
        os.makedirs(osp.dirname(p), exist_ok=True)
        cv2.imwrite(p, rng.randint(0, 255, (H, W, 3), np.uint8))
        names.append(name)
    gaze = rng.randn(7, 3)
    gaze /= np.linalg.norm(gaze, axis=1, keepdims=True)
    # face/eyes tracks live in the top-left corner (killed by a 0.68
    # centre crop of the 64x48 frame); head covers the centre (survives)
    tracks = dict(face=[0, 0, 5, 4], eyes=[1, 1, 4, 2],
                  head=[14, 10, 36, 28])
    data = dict(
        videos=[dict(id=1, width=W, height=H, length=7, file_names=names)],
        annotations=[dict(id=i + 1, video_id=1, category_id=1,
                          bboxes=[list(tracks[c])] * 7, gaze=gaze.tolist())
                     for i, c in enumerate(('face', 'eyes', 'head'))],
        categories=[dict(id=1, name='person_face')])
    ann = osp.join(root, 'ann.json')
    json.dump(data, open(ann, 'w'))

    ref_ds = _build_reference_dataset(ann, osp.join(root, 'frames/'))
    ref_data, _, _ = _run_reference_clip(ref_ds, 3, 0.0, False, monkeypatch)
    cfg = DataConfig(ann_file=ann, img_prefix=osp.join(root, 'frames/'),
                     clip_length=7, scale=(224, 224), canvas=(224, 224),
                     crop_size=0.68, flip_ratio=0.5, ship_uint8=False)
    ds = Gaze360ClipDataset(cfg, use_native=None)
    ours = _run_our_clip(ds, 3, 0.0, False)
    assert ours is not None
    _assert_clip_equal(ref_data, ours)
    for t in range(7):
        boxes = ref_data['gt_bboxes'].data[t].numpy()
        assert boxes.shape[0] == 3
        # the repair fired: face == eyes == head
        np.testing.assert_array_equal(boxes[0], boxes[2])
        np.testing.assert_array_equal(boxes[1], boxes[2])


def test_geometry_path_matches_reference_boxes(tree, ref_ds, monkeypatch):
    """The decode-free geometry path (_clip_geometry, used by the native
    C++ loader) produces the same GT arithmetic as the executed
    reference pipeline."""
    from mcgaze_tpu.data import transforms as T
    ours_ds = _ours(tree, use_native=None)
    ref_data, _, _ = _run_reference_clip(ref_ds, 5, 0.25, True, monkeypatch)
    params = T.ClipParams(crop_ratio=0.68 + 0.25 * 0.32, flip=True)
    geo = ours_ds._clip_geometry(5, params)
    assert geo is not None
    for t in range(7):
        ref_boxes = ref_data['gt_bboxes'].data[t].numpy()
        valid = geo['gt_valid'][t] > 0
        ours_rows = geo['gt_boxes'][t][valid]
        np.testing.assert_allclose(ours_rows, ref_boxes, atol=1e-3)
        ref_gazes = ref_data['gt_gazes'].data[t].numpy()
        np.testing.assert_allclose(geo['gt_gazes'][t][valid], ref_gazes,
                                   atol=1e-6)
