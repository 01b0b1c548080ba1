"""MPEblink dataset loader + InstBlink video driver semantics.

Pins: clip windowing at frame_interval=2 with first/last padding
(reference mpeblink.py:272-293), slot-layout GT with per-frame presence,
clip-latched flip, blink_sampled index restriction
(blink_sampled.py:150-160), and the driver's cross-clip track linking
(FaceLinker semantics, face_linker_calculator.py).
"""
import json
import os.path as osp

import cv2
import numpy as np
import pytest

from mcgaze_tpu.data.instblink_dataset import (InstBlinkClipDataset,
                                               InstBlinkDataConfig)
from mcgaze_tpu.evaluation.instblink_driver import (InstBlinkEvalConfig,
                                                    InstBlinkVideoEvaluator,
                                                    clip_windows)


@pytest.fixture(scope='module')
def tiny_mpeblink(tmp_path_factory):
    root = tmp_path_factory.mktemp('mpeblink')
    frames_dir = root / 'rawframes'
    f, h, w = 12, 48, 64
    videos, annotations = [], []
    rng = np.random.RandomState(0)
    for vid in (1, 2):
        names = []
        for fi in range(f):
            name = f'v{vid}/{fi:05d}.png'
            p = frames_dir / name
            p.parent.mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(p), rng.randint(0, 255, (h, w, 3), np.uint8))
            names.append(name)
        videos.append(dict(id=vid, height=h, width=w, length=f,
                           file_names=names))
        for inst in range(2):
            bboxes = []
            blinks_binary = []
            for fi in range(f):
                if inst == 1 and fi in (0, 5):
                    bboxes.append(None)       # occluded frames
                    # frame 5: mid-blink WHILE occluded — the
                    # blink_sampled corner where the reference counts
                    # the blink from an instance whose bbox is None
                    blinks_binary.append(1 if fi == 5 else 0)
                else:
                    bboxes.append([5 + inst * 20, 5, 15, 20])
                    blinks_binary.append(1 if 3 <= fi <= 4 else 0)
            annotations.append(dict(
                id=(vid - 1) * 2 + inst + 1, video_id=vid, category_id=1,
                bboxes=bboxes, blinks_binary=blinks_binary,
                blinks=[[3, 4]]))
    ann = dict(videos=videos, annotations=annotations,
               categories=[dict(id=1, name='person_face')])
    ann_path = root / 'train.json'
    ann_path.write_text(json.dumps(ann))
    return str(ann_path), str(frames_dir) + '/'


def _cfg(ann, prefix, **kw):
    base = dict(ann_file=ann, img_prefix=prefix, clip_length=5,
                scale=(64, 48), canvas=(64, 64), batch_size=2,
                max_instances=3)
    base.update(kw)
    return InstBlinkDataConfig(**base)


def test_clip_window_interval_and_padding(tiny_mpeblink):
    ds = InstBlinkClipDataset(_cfg(*tiny_mpeblink))
    # centre frame 6 in a 12-frame video: [2, 4, 6, 8, 10]
    assert ds._clip_frames(1, 6) == [2, 4, 6, 8, 10]
    # centre 1: pre frames would be -1, -3 -> padded with first frame 0
    assert ds._clip_frames(1, 1) == [0, 0, 1, 3, 5]
    # centre 11 (last): post padded with last frame
    assert ds._clip_frames(1, 11) == [7, 9, 11, 11, 11]


def test_clip_gt_layout_and_presence(tiny_mpeblink):
    ds = InstBlinkClipDataset(_cfg(*tiny_mpeblink), seed=0)
    # locate index entry for (vid 1, frame 2)
    idx = ds.index.index((1, 2))
    clip = ds._clip_frames(1, 2)
    assert clip == [0, 0, 2, 4, 6]
    out = ds.get_clip(idx)
    assert out['imgs'].shape == (5, 64, 64, 3)
    assert out['gt_boxes'].shape == (3, 5, 4)
    assert out['inst_valid'].tolist() == [True, True, False]
    # instance 1 (slot 1) absent at frame 0 -> present False there
    assert out['gt_present'][1].tolist() == [False, False, True, True, True]
    assert out['gt_present'][0].all()
    # blink frames 3..4: clip frame index 3 is video frame 4 -> blink=1
    assert out['gt_blinks'][0, 3] == 1.0
    assert out['gt_blinks'][0, 0] == 0.0


def test_flip_latched_per_clip(tiny_mpeblink):
    ann, prefix = tiny_mpeblink
    ds_f = InstBlinkClipDataset(_cfg(ann, prefix, flip_ratio=1.0), seed=1)
    ds_n = InstBlinkClipDataset(_cfg(ann, prefix, flip_ratio=0.0), seed=1)
    idx = ds_f.index.index((1, 6))
    a = ds_f.get_clip(idx)
    b = ds_n.get_clip(idx)
    w = b['whwh'][0, 0]
    # flipped boxes: x1' = W - x2, consistent across every clip frame
    got = a['gt_boxes'][0, :, 0]
    want = w - b['gt_boxes'][0, :, 2]
    np.testing.assert_allclose(got, want, atol=1e-4)
    np.testing.assert_allclose(a['imgs'][0], b['imgs'][0, :, ::-1],
                               atol=1e-5)


def test_blink_sampled_restricts_index(tiny_mpeblink):
    ann, prefix = tiny_mpeblink
    full = InstBlinkClipDataset(_cfg(ann, prefix))
    sampled = InstBlinkClipDataset(_cfg(ann, prefix, blink_sampled=True))
    assert len(sampled) < len(full)
    for vid, fr in sampled.index:
        # frames 3-4: both instances blink; frame 5: instance 1 blinks
        # WHILE occluded (bbox None) — the reference counts it
        # (blink_sampled.py:146-161; instance visibility only gated the
        # earlier _filter_imgs pass)
        assert fr in (3, 4, 5)
    assert any(fr == 5 for _vid, fr in sampled.index)


def test_batches_shapes(tiny_mpeblink):
    ds = InstBlinkClipDataset(_cfg(*tiny_mpeblink))
    batch = next(ds.batches(batch_size=2, seed=0))
    assert batch['imgs'].shape == (10, 64, 64, 3)
    assert batch['whwh'].shape == (10, 4)
    assert batch['gt_boxes'].shape == (2, 3, 5, 4)
    assert batch['gt_present'].shape == (2, 3, 5)
    assert batch['gt_blinks'].shape == (2, 3, 5)
    assert batch['inst_valid'].shape == (2, 3)


def test_clip_windows_cover_video():
    for f, t, s in [(30, 11, 8), (11, 11, 8), (5, 11, 8), (23, 7, 4)]:
        wins = clip_windows(f, min(t, f), s)
        covered = set()
        for start, _ov in wins:
            covered.update(range(start, start + min(t, f)))
        assert covered == set(range(f)), (f, t, s)
        # overlap bookkeeping consistent with starts
        for i in range(1, len(wins)):
            assert wins[i][1] == min(t, f) - (wins[i][0] - wins[i - 1][0])


def test_driver_links_tracks_across_clips():
    """Two clips whose top-k track ORDER permutes between clips: the
    FaceLinker cost (mean IoU over the overlap frames) must re-identify
    them, so the stitched video tracks stay spatially coherent."""
    t, k, f = 5, 2, 7
    box_a = np.asarray([10, 10, 30, 30], np.float32)    # track A, static
    box_b = np.asarray([60, 60, 90, 90], np.float32)    # track B, static

    def forward(imgs, whwh):
        frames = imgs.shape[0]
        start = forward.calls
        forward.calls += 1
        boxes = np.zeros((frames, k, 4), np.float32)
        if start == 0:                  # clip 1: slot0=A, slot1=B
            boxes[:, 0] = box_a
            boxes[:, 1] = box_b
        else:                           # clip 2: PERMUTED slot0=B, slot1=A
            boxes[:, 0] = box_b
            boxes[:, 1] = box_a
        blink = np.zeros((frames, k), np.float32)
        blink[:, 0] = 0.9 if start == 0 else 0.1
        blink[:, 1] = 0.1 if start == 0 else 0.9
        return dict(scores=np.asarray([0.9, 0.8], np.float32),
                    labels=np.zeros((k,), np.int64),
                    boxes=boxes, blink=blink)

    forward.calls = 0
    cfg = InstBlinkEvalConfig(clip_length=t, overlap=3, max_per_img=k,
                              score_threshold=0.0)
    ev = InstBlinkVideoEvaluator(forward, cfg)
    whwh = np.tile(np.asarray([[100., 100., 100., 100.]], np.float32),
                   (f, 1))
    sfs = np.ones((f, 4), np.float32)
    results = ev.run_video(np.zeros((f, 8, 8, 3), np.float32), whwh, sfs, 7)
    assert len(results) == 2
    # each output track must be spatially constant (A stayed A)
    for r in results:
        xs = np.asarray([b[0] for b in r['bboxes'] if b])
        assert np.allclose(xs, xs[0], atol=1e-4), xs
    # blink scores follow the linked identity: track A ~0.9 everywhere
    r_a = min(results, key=lambda r: r['bboxes'][0][0])
    assert all(s > 0.5 for s in r_a['blink_scores'])
    assert r_a['blinks_converted'][0][:2] == (0, f - 1)
    assert r_a['video_id'] == 7 and r_a['category_id'] == 1
