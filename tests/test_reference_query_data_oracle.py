"""The query family's dataset executed from the reference:
MPEblinkDataset.prepare_train_clip (interval-2 windows, first/last
padding, isfix latch) + _parse_ann_info (None-box dropping, blink
labels) vs our InstBlinkClipDataset, on the same fabricated tree.

Also pins a reference DEFECT this oracle discovered: the shipped
mpeblink train pipeline (configs/_base_/datasets/mpeblink.py:17-21)
passes `with_blink=True` to a LoadAnnotations that has no such
parameter in this tree (pipelines/loading.py:228-238 — the gaze fork's
copy carries `with_gaze` instead, and `_load_blinks` is defined at
:297 but never called), so the family's training pipeline as shipped
CANNOT be constructed: blink labels only exist at the _parse_ann_info
level. Our InstBlinkClipDataset reads them from the annotation directly
(`_track_gt`), which this oracle verifies against the executed
_parse_ann_info.
"""
import numpy as np
import pytest

from mcgaze_tpu.data.instblink_dataset import (InstBlinkClipDataset,
                                               InstBlinkDataConfig)
from tests.test_instblink_data import tiny_mpeblink  # noqa: F401


def _ref_dataset(ann, prefix, clip_length=5):
    from tests.reference_data_shim import install_data
    install_data()
    import importlib
    mpeblink = importlib.import_module('mmdet.datasets.mpeblink')
    # the blink-less pipeline (see module docstring for why the shipped
    # with_blink=True pipeline cannot build); Resize at the fixture's
    # own size keeps the pixel path trivial and the GT math exercised
    pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True, with_gaze=False,
             with_id=True),
        dict(type='Resize', img_scale=[(48, 36)], keep_ratio=True),
        dict(type='RandomFlip', flip_ratio=0.5),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375], to_rgb=True),
        dict(type='Pad', size_divisor=32),
        dict(type='DefaultFormatBundle'),
        dict(type='Collect',
             keys=['img', 'gt_bboxes', 'gt_labels', 'gt_ids']),
    ]
    return mpeblink.MPEblinkDataset(ann_file=ann, pipeline=pipeline,
                                    clip_length=clip_length,
                                    img_prefix=prefix)


def _ours(ann, prefix, ship_uint8=False):
    cfg = InstBlinkDataConfig(ann_file=ann, img_prefix=prefix,
                              clip_length=5, scale=(48, 36),
                              canvas=(64, 64), batch_size=2,
                              max_instances=3, ship_uint8=ship_uint8)
    return InstBlinkClipDataset(cfg)


def test_shipped_blink_pipeline_cannot_build(tiny_mpeblink):  # noqa: F811
    """Executable proof of the mirror's defect: building the SHIPPED
    mpeblink train pipeline raises (LoadAnnotations has no with_blink)."""
    from tests.reference_data_shim import install_data
    ns = install_data()
    with pytest.raises(TypeError, match='with_blink'):
        ns.Compose([dict(type='LoadAnnotations', with_bbox=True,
                         with_blink=True, with_id=True)])


def test_interval2_window_matches_reference(tiny_mpeblink):  # noqa: F811
    ann, prefix = tiny_mpeblink
    ref = _ref_dataset(ann, prefix)
    ours = _ours(ann, prefix)
    assert len(ref.data_infos) == len(ours.index)
    # compare the window arithmetic itself across every index: the
    # reference materialises it inside prepare_train_clip; replaying the
    # same arithmetic on data_infos is how its own body computes it
    for idx in range(len(ours.index)):
        vid_id, frame = ours.index[idx]
        vid_idx, frame_id = ref.data_infos[idx]
        assert ref.vid_infos[vid_idx]['id'] == vid_id
        assert frame_id == frame


@pytest.mark.parametrize('idx,flip', [(0, False), (5, True), (17, False)])
def test_train_clip_matches_reference(tiny_mpeblink, idx, flip,  # noqa: F811
                                      monkeypatch):
    ann, prefix = tiny_mpeblink
    ref = _ref_dataset(ann, prefix)
    ours = _ours(ann, prefix)

    n_choice = [0]

    def scripted_choice(options, p=None):
        n_choice[0] += 1
        return 'horizontal' if flip else None

    monkeypatch.setattr(np.random, 'choice', scripted_choice)
    data = ref.prepare_train_clip(idx)
    assert n_choice[0] >= 1          # flip drawn once, latched by isfix

    ours.rng = type('R', (), {'rand': lambda self:
                              0.2 if flip else 0.9})()
    clip = ours.get_clip(idx)

    t = clip['imgs'].shape[0]
    ref_imgs = data['img'].data          # (T, 3, Hp, Wp)
    assert ref_imgs.shape[0] == t
    for fi in range(t):
        h, w = int(clip['whwh'][fi, 1]), int(clip['whwh'][fi, 0])
        ref_img = ref_imgs[fi].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(clip['imgs'][fi, :h, :w],
                                   ref_img[:h, :w], atol=2e-4,
                                   err_msg=f'frame {fi} pixels')
        # reference drops None-box instances per frame; ours keeps
        # slots with a present mask — the surviving rows must match
        ref_boxes = data['gt_bboxes'].data[fi].numpy()
        ref_ids = np.asarray(data['gt_ids'].data[fi])
        present = clip['gt_present'][:, fi].astype(bool)
        our_rows = clip['gt_boxes'][present, fi]
        # reference rows are in annotation order; our slots are in
        # annotation order too — align via the instance ids
        order = np.argsort(ref_ids)
        np.testing.assert_allclose(our_rows, ref_boxes[order], atol=1e-3,
                                   err_msg=f'frame {fi} boxes')
        assert (data['gt_labels'].data[fi].numpy() == 0).all()


def test_blink_labels_match_parse_ann_info(tiny_mpeblink):  # noqa: F811
    """_parse_ann_info is the only executed-reference place blink labels
    exist (the pipeline defect above); our _track_gt must agree with it
    frame by frame for present instances."""
    ann, prefix = tiny_mpeblink
    ref = _ref_dataset(ann, prefix)
    ours = _ours(ann, prefix)
    for idx in (0, 7, 12, 21):
        vid_id, frame = ours.index[idx]
        parsed = ref.get_ann_info(idx)
        clip = ours._clip_frames(vid_id, frame)
        fi = clip.index(frame)
        boxes, labels, present, valid, blinks = ours._track_gt(
            vid_id, clip)
        pres = present[:, fi].astype(bool)
        np.testing.assert_array_equal(
            blinks[pres, fi].astype(np.int64), parsed['blinks'])
        np.testing.assert_allclose(boxes[pres, fi], parsed['bboxes'],
                                   atol=1e-5)


def test_blink_sampled_index_matches_reference(tiny_mpeblink):  # noqa: F811
    """blink_sampled oversampling (blink_sampled.py:146-161, indexed via
    :273): the executed YoutubeVISDataset_Sampled restricts the training
    index to frames where some instance is mid-blink; our
    InstBlinkDataConfig.blink_sampled must select the same (video,
    frame) set."""
    from tests.reference_data_shim import install_data
    ns = install_data()
    ann, prefix = tiny_mpeblink
    pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True, with_gaze=False,
             with_id=True),
        dict(type='Resize', img_scale=[(48, 36)], keep_ratio=True),
        dict(type='RandomFlip', flip_ratio=0.5),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375], to_rgb=True),
        dict(type='Pad', size_divisor=32),
        dict(type='DefaultFormatBundle'),
        dict(type='Collect',
             keys=['img', 'gt_bboxes', 'gt_labels', 'gt_ids']),
    ]
    ref = ns.YoutubeVISDataset_Sampled(ann_file=ann, pipeline=pipeline,
                                       clip_length=5, img_prefix=prefix)
    ref_pairs = [(ref.vid_infos[v]['id'], f)
                 for (v, f) in (ref.data_infos[i]
                                for i in ref.sampled_data_infos)]

    ours = InstBlinkClipDataset(InstBlinkDataConfig(
        ann_file=ann, img_prefix=prefix, clip_length=5, scale=(48, 36),
        canvas=(64, 64), batch_size=2, max_instances=3,
        blink_sampled=True))
    assert ours.index == ref_pairs
