"""Data pipeline + eval driver integration on a synthetic COCO-VID dataset
(fabricated on disk, mirroring the shipped train/test.json layout with
face/eyes/head instance tracks)."""
import json
import os.path as osp

import cv2
import numpy as np
import pytest

from mcgaze_tpu.data.dataset import DataConfig, Gaze360ClipDataset
from mcgaze_tpu.evaluation.driver import (EvalConfig, VideoGazeEvaluator,
                                          clip_slices)

W, H = 64, 48


def make_dataset(root, num_videos=2, length=12, head_only_frames=(3,)):
    videos, annotations = [], []
    rng = np.random.RandomState(0)
    ann_id = 1
    for vid in range(1, num_videos + 1):
        names = []
        for f in range(length):
            name = f'{vid:03d}/{f:05d}.png'
            path = osp.join(root, 'frames', name)
            import os
            os.makedirs(osp.dirname(path), exist_ok=True)
            img = rng.randint(0, 255, (H, W, 3), np.uint8)
            cv2.imwrite(path, img)
            names.append(name)
        videos.append(dict(id=vid, width=W, height=H, length=length,
                           file_names=names))
        # three instance tracks: face, eyes, head
        gaze = rng.randn(length, 3)
        gaze /= np.linalg.norm(gaze, axis=1, keepdims=True)
        boxes = dict(
            face=[[20, 10, 20, 14]] * length,
            eyes=[[22, 14, 16, 5]] * length,
            head=[[14, 4, 32, 30]] * length,
        )
        for clue in ('face', 'eyes', 'head'):
            bbs = [list(b) for b in boxes[clue]]
            for f in head_only_frames:
                if clue != 'head':
                    bbs[f] = None
            annotations.append(dict(
                id=ann_id, video_id=vid, category_id=1,
                bboxes=bbs, gaze=gaze.tolist()))
            ann_id += 1
    data = dict(videos=videos, annotations=annotations,
                categories=[dict(id=1, name='person_face')])
    ann_path = osp.join(root, 'train.json')
    json.dump(data, open(ann_path, 'w'))
    return ann_path, osp.join(root, 'frames/')


@pytest.fixture(scope='module')
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('gaze360'))
    ann, prefix = make_dataset(root)
    cfg = DataConfig(ann_file=ann, img_prefix=prefix, clip_length=7,
                     scale=(32, 32), canvas=(32, 32), crop_size=0.68,
                     flip_ratio=0.5, batch_size=2)
    return Gaze360ClipDataset(cfg), ann, prefix


def test_index_and_clip_window(synth):
    ds, _, _ = synth
    assert len(ds) == 24  # every frame has the head track
    # centre frame 0: window pads left with the first annotated frame
    clip = ds._clip_frames(1, 0)
    assert len(clip) == 7
    assert clip == [0, 0, 0, 0, 1, 2, 3]
    clip = ds._clip_frames(1, 11)
    assert clip == [8, 9, 10, 11, 11, 11, 11]
    clip = ds._clip_frames(1, 6)
    assert clip == [3, 4, 5, 6, 7, 8, 9]


def test_clip_gt_layout(synth):
    ds, _, _ = synth
    clip = None
    while clip is None:
        clip = ds.get_clip(0)  # (vid 1, frame 0)
    assert clip['imgs'].shape == (7, 32, 32, 3)
    assert clip['gt_valid'].shape == (7, 3)
    # frame 3 of video 1 is head-only: find its position in the window of
    # some clip containing it
    idx3 = ds.index.index((1, 3))
    c = None
    while c is None:
        c = ds.get_clip(idx3)
    window = ds._clip_frames(1, 3)
    pos = window.index(3)
    np.testing.assert_array_equal(c['gt_valid'][pos], [0, 0, 1])
    # and gaze lives in slot 2 for that frame
    assert np.linalg.norm(c['gt_gazes'][pos, 2]) > 0.5
    assert np.linalg.norm(c['gt_gazes'][pos, 0]) == 0.0


def test_batches_shapes(synth):
    ds, _, _ = synth
    batch = next(ds.batches(batch_size=2, seed=1))
    assert batch['imgs'].shape == (2, 7, 32, 32, 3)
    assert batch['gt_boxes'].shape == (2, 7, 3, 4)
    assert np.isfinite(batch['imgs']).all()
    # boxes must live inside the canvas
    assert batch['gt_boxes'].max() <= 32.0 + 1e-5


def test_clip_slices_match_reference_math():
    # L=12, clip 7 stride 4: 3 clips, last right-aligned with overlap 6
    assert clip_slices(12, 7, 4) == [(0, 7, 0), (4, 7, 3), (5, 7, 6)]
    # exact multiple: L=15 -> (15-7)%4==0 -> last overlap = 3
    assert clip_slices(15, 7, 4) == [(0, 7, 0), (4, 7, 3), (8, 7, 3)]
    assert clip_slices(5, 7, 4) == [(0, 5, 0)]


def test_driver_stitching_identity():
    """A forward that encodes the global frame id in its outputs must come
    back per-frame aligned after stitching."""
    cfg = EvalConfig(scale=(32, 32), canvas=(32, 32), crop_ratio=None,
                     clip_batch=3)
    frames = [np.full((H, W, 3), i, np.uint8) for i in range(12)]

    def forward(imgs, whwh, t):
        k = imgs.shape[0]
        # recover the frame id stamped into the (normalised) pixels
        from mcgaze_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
        pix = imgs[:, 0, 0, 0] * IMAGENET_STD[0] + IMAGENET_MEAN[0]
        fid = np.round(pix).astype(np.float32)
        boxes = np.zeros((k, 3, 4), np.float32)
        boxes[:, :, 0] = 1.0
        boxes[:, :, 2] = 2.0
        boxes[:, :, 1] = 1.0
        boxes[:, :, 3] = 2.0
        scores = np.ones((k, 3), np.float32)
        g = np.stack([fid, np.zeros(k, np.float32),
                      -np.ones(k, np.float32)], -1)
        gaze = dict(fusion=g, face=g, eyes=g, head=g)
        return boxes, scores, gaze

    ev = VideoGazeEvaluator(forward, cfg)
    res = ev.run_video(frames, video_id=7)
    assert res['video_id'] == 7
    fus = np.asarray(res['fusion_gazes'])
    assert fus.shape == (12, 3)
    # stitched x-component must equal the frame id everywhere (overlap
    # regions average identical values)
    np.testing.assert_allclose(fus[:, 0], np.arange(12), atol=1e-4)
    # boxes above threshold survive, converted to xywh
    assert res['head_bboxes'][0] is not None
    assert len(res['head_bboxes']) == 12


def test_driver_zeroes_low_score_boxes():
    cfg = EvalConfig(scale=(32, 32), canvas=(32, 32), crop_ratio=None)
    frames = [np.zeros((H, W, 3), np.uint8) for _ in range(7)]

    def forward(imgs, whwh, t):
        k = imgs.shape[0]
        boxes = np.full((k, 3, 4), 5.0, np.float32)
        scores = np.full((k, 3), 0.1, np.float32)  # all below threshold
        g = np.tile(np.array([[0., 0., -1.]], np.float32), (k, 1))
        return boxes, scores, dict(fusion=g, face=g, eyes=g, head=g)

    res = VideoGazeEvaluator(forward, cfg).run_video(frames, 1)
    assert all(b is None for b in res['face_bboxes'])
    assert res['face_score'][0] == pytest.approx(0.1)


def test_run_video_from_paths_matches_run_video(synth, tmp_path):
    """Native-decode eval entry must produce identical results to the
    in-memory frame path (same crop/resize/pad via the shared OpenCV)."""
    _, ann, prefix = synth
    import json as _json
    video = _json.load(open(ann))['videos'][0]
    paths = [osp.join(prefix, n) for n in video['file_names']]
    frames = [cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
              for p in paths]

    cfg = EvalConfig(scale=(32, 32), canvas=(32, 32), crop_ratio=0.84,
                     clip_batch=2)

    def forward(imgs, whwh, t):
        k = imgs.shape[0]
        boxes = np.tile(np.asarray([[2., 2., 8., 8.]], np.float32),
                        (k, 3, 1)).reshape(k, 3, 4)
        scores = np.full((k, 3), 0.9, np.float32)
        g = imgs.mean(axis=(1, 2))          # content-dependent
        g = g / np.linalg.norm(g, axis=-1, keepdims=True)
        return boxes, scores, dict(fusion=g, face=g, eyes=g, head=g)

    ev = VideoGazeEvaluator(forward, cfg)
    a = ev.run_video(frames, video['id'])
    b = ev.run_video_from_paths(paths, video['id'])
    np.testing.assert_allclose(np.asarray(a['fusion_gazes']),
                               np.asarray(b['fusion_gazes']), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray([x or [0] * 4 for x in a['head_bboxes']]),
        np.asarray([x or [0] * 4 for x in b['head_bboxes']]), atol=1e-4)


def test_dataset_rejects_gaze_only_annotations(tmp_path):
    """Clear error (not KeyError) when the JSON lacks box tracks
    (review finding: documented prepare->train flow gap)."""
    import json as _json
    data = dict(videos=[dict(id=1, width=8, height=6, length=1,
                             file_names=['1/0.png'])],
                categories=[dict(id=1, name='person_face')],
                annotations=[dict(id=1, video_id=1, category_id=1,
                                  gaze=[[0, 0, -1]])])
    ann = tmp_path / 'gaze_only.json'
    ann.write_text(_json.dumps(data))
    cfg = DataConfig(ann_file=str(ann), img_prefix=str(tmp_path))
    with pytest.raises(ValueError, match='bboxes'):
        Gaze360ClipDataset(cfg, use_native=False)


def test_crop_ratios_modes():
    from mcgaze_tpu.evaluation.driver import crop_ratios
    fixed = crop_ratios(EvalConfig(crop_ratio=0.84), 5, video_id=3)
    assert fixed == [0.84] * 5
    cfg = EvalConfig(crop_mode='reference', crop_size=0.68, crop_seed=11)
    a = crop_ratios(cfg, 40, video_id=3)
    b = crop_ratios(cfg, 40, video_id=3)
    c = crop_ratios(cfg, 40, video_id=4)
    assert a == b                      # seeded: reproducible
    assert a != c                      # per-video streams differ
    arr = np.asarray(a)
    assert (arr >= 0.68).all() and (arr < 1.0).all()
    assert len(set(a)) > 30            # per-FRAME sampling, not per-clip
    assert crop_ratios(EvalConfig(crop_ratio=None), 5, 0) is None
    # crop disabled + reference mode is contradictory -> explicit error
    with pytest.raises(ValueError, match='contradictory'):
        crop_ratios(EvalConfig(crop_ratio=None, crop_mode='reference'),
                    5, 0)


def test_reference_crop_mode_runs_and_differs():
    """reference crop mode must flow through run_video end-to-end and
    produce different preprocessed pixels than fixed mode."""
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (H, W, 3), np.uint8) for _ in range(8)]
    seen = {}

    def forward_for(tag):
        def forward(imgs, whwh, t):
            k = imgs.shape[0]
            seen.setdefault(tag, []).append(np.asarray(imgs).copy())
            g = np.tile(np.array([[0., 0., -1.]], np.float32), (k, 1))
            return (np.full((k, 3, 4), 5.0, np.float32),
                    np.ones((k, 3), np.float32),
                    dict(fusion=g, face=g, eyes=g, head=g))
        return forward

    base = dict(scale=(32, 32), canvas=(32, 32))
    r1 = VideoGazeEvaluator(forward_for('fix'),
                            EvalConfig(crop_ratio=0.84, **base)).run_video(
                                frames, 1)
    r2 = VideoGazeEvaluator(forward_for('ref'),
                            EvalConfig(crop_ratio=0.84,
                                       crop_mode='reference',
                                       **base)).run_video(frames, 1)
    assert len(r1['fusion_gazes']) == len(r2['fusion_gazes']) == 8
    assert not np.array_equal(seen['fix'][0], seen['ref'][0])


def test_forward_clip_batches_are_pow2_padded():
    """13 frames -> 3 clips; the forward must see a single padded batch of
    4 clips (one compiled shape per pow2 bucket) with unchanged results."""
    cfg = EvalConfig(scale=(32, 32), canvas=(32, 32), crop_ratio=None)
    frames = [np.full((H, W, 3), i, np.uint8) for i in range(13)]
    batch_ks = []

    def forward(imgs, whwh, t):
        k = imgs.shape[0] // t
        batch_ks.append(k)
        from mcgaze_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
        pix = imgs[:, 0, 0, 0] * IMAGENET_STD[0] + IMAGENET_MEAN[0]
        fid = np.round(pix).astype(np.float32)
        kk = imgs.shape[0]
        g = np.stack([fid, np.zeros(kk, np.float32),
                      -np.ones(kk, np.float32)], -1)
        return (np.full((kk, 3, 4), 5.0, np.float32),
                np.ones((kk, 3), np.float32),
                dict(fusion=g, face=g, eyes=g, head=g))

    res = VideoGazeEvaluator(forward, cfg).run_video(frames, 1)
    assert batch_ks == [4]             # 3 clips padded to 4
    fus = np.asarray(res['fusion_gazes'])
    np.testing.assert_allclose(fus[:, 0], np.arange(13), atol=1e-4)


def test_dedup_forward_matches_plain_driver_path():
    """EvalConfig.dedup_frames routes each chunk's UNIQUE frame window +
    gather indices through forward.dedup; results must match the plain
    duplicated-clip path on a real (tiny) model, including the
    right-aligned tail chunk and pow2 clip padding."""
    from mcgaze_tpu.evaluation.forward import bind_forward, \
        make_eval_forward
    from mcgaze_tpu.models.mcgaze import ModelConfig

    cfg = ModelConfig(clip_length=7, backbone_depth=26, num_stages=2,
                      stage_loss_weights=(1.0, 1.0), ffn_channels=256)
    _m, variables, fwd, fwd_dedup = make_eval_forward(cfg, canvas=(32, 32))
    forward = bind_forward(fwd, variables, fwd_dedup)
    assert hasattr(forward, 'dedup')

    rng = np.random.RandomState(3)
    # 18 frames -> clips at 0, 4, 8, 11 (right-aligned tail): spans both
    # a full pow2 chunk and a padded tail chunk at clip_batch=2
    frames = [rng.randint(0, 255, (H, W, 3), np.uint8) for _ in range(18)]
    base = dict(scale=(32, 32), canvas=(32, 32), crop_ratio=0.84,
                clip_batch=2)
    r_plain = VideoGazeEvaluator(
        forward, EvalConfig(dedup_frames=False, **base)).run_video(
            frames, 1)
    r_dedup = VideoGazeEvaluator(
        forward, EvalConfig(dedup_frames=True, **base)).run_video(
            frames, 1)
    np.testing.assert_allclose(
        np.asarray(r_plain['fusion_gazes'], np.float64),
        np.asarray(r_dedup['fusion_gazes'], np.float64), atol=1e-5)
    for clue in ('face', 'eyes', 'head'):
        np.testing.assert_allclose(
            np.asarray(r_plain[f'{clue}_gazes'], np.float64),
            np.asarray(r_dedup[f'{clue}_gazes'], np.float64), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(r_plain[f'{clue}_score'], np.float64),
            np.asarray(r_dedup[f'{clue}_score'], np.float64), atol=1e-5)
        for b1, b2 in zip(r_plain[f'{clue}_bboxes'],
                          r_dedup[f'{clue}_bboxes']):
            if b1 is None or b2 is None:
                assert b1 == b2
            else:
                np.testing.assert_allclose(b1, b2, atol=1e-3)


def test_run_videos_pipelined_matches_serial(synth):
    """The decode-ahead pipeline (run_videos_from_paths) must yield
    exactly the per-video results of serial run_video_from_paths, in
    input order."""
    _, ann, prefix = synth
    all_videos = json.load(open(ann))['videos']

    cfg = EvalConfig(scale=(32, 32), canvas=(32, 32), crop_ratio=0.84,
                     clip_batch=2)

    def forward(imgs, whwh, t):
        k = imgs.shape[0]
        boxes = np.tile(np.asarray([[2., 2., 8., 8.]], np.float32),
                        (k, 3, 1)).reshape(k, 3, 4)
        scores = np.full((k, 3), 0.9, np.float32)
        g = imgs.mean(axis=(1, 2))          # content-dependent
        g = g / np.linalg.norm(g, axis=-1, keepdims=True)
        return boxes, scores, dict(fusion=g, face=g, eyes=g, head=g)

    ev = VideoGazeEvaluator(forward, cfg)
    pairs = [(v['id'], [osp.join(prefix, n) for n in v['file_names']])
             for v in all_videos]
    serial = [ev.run_video_from_paths(paths, vid) for vid, paths in pairs]
    piped = list(ev.run_videos_from_paths(iter(pairs)))
    assert [r['video_id'] for r in piped] == [v['id'] for v in all_videos]
    for a, b in zip(serial, piped):
        assert a == b


def test_run_videos_pipeline_propagates_decode_errors(synth):
    _, ann, prefix = synth
    video = json.load(open(ann))['videos'][0]
    cfg = EvalConfig(scale=(32, 32), canvas=(32, 32), crop_ratio=0.84)

    def forward(imgs, whwh, t):
        k = imgs.shape[0]
        g = np.tile(np.asarray([[0., 0., -1.]], np.float32), (k, 1))
        return (np.zeros((k, 3, 4), np.float32),
                np.ones((k, 3), np.float32),
                dict(fusion=g, face=g, eyes=g, head=g))

    ev = VideoGazeEvaluator(forward, cfg)
    good = [osp.join(prefix, n) for n in video['file_names']]
    bad = good[:3] + [osp.join(prefix, 'missing/00042.png')] + good[4:]
    with pytest.raises(Exception):
        list(ev.run_videos_from_paths([(1, good), (2, bad)]))


def test_short_video_below_clip_length():
    """A video shorter than clip_length forwards as one truncated clip
    (reference clip_slices: L <= clip_len -> single (0, L) slice) and
    stitches to per-frame outputs without padding artifacts."""
    cfg = EvalConfig(scale=(32, 32), canvas=(32, 32), crop_ratio=None,
                     clip_batch=4)
    frames = [np.full((H, W, 3), i * 10, np.uint8) for i in range(4)]

    def forward(imgs, whwh, t):
        assert t == 4                       # truncated clip length
        k = imgs.shape[0]
        boxes = np.tile(np.asarray([[1., 1., 2., 2.]], np.float32),
                        (k, 3, 1)).reshape(k, 3, 4)
        scores = np.ones((k, 3), np.float32)
        g = np.tile(np.asarray([[0., 0., -1.]], np.float32), (k, 1))
        return boxes, scores, dict(fusion=g, face=g, eyes=g, head=g)

    res = VideoGazeEvaluator(forward, cfg).run_video(frames, 3)
    assert len(res['fusion_gazes']) == 4
    assert len(res['head_bboxes']) == 4
    assert all(b is not None for b in res['head_bboxes'])


def test_even_clip_length_rejected(synth):
    """clip_length must be odd (centre-frame window); an even value used
    to emit t+1 frames and crash with IndexError deep in get_clip."""
    _, ann, prefix = synth
    cfg = DataConfig(ann_file=ann, img_prefix=prefix, clip_length=6,
                     scale=(32, 32), canvas=(32, 32), batch_size=1)
    ds = Gaze360ClipDataset(cfg, seed=0)
    with pytest.raises(ValueError, match='odd'):
        ds.get_clip(0)


def test_multi_device_eval_matches_single_device(tmp_path):
    """Round-robin eval over all 8 virtual devices must produce exactly
    the single-device results, in input order, with >1 device actually
    receiving work (the single-process analogue of the reference's
    one-process-per-GPU eval, apis/test.py:81-135)."""
    import jax

    from mcgaze_tpu.evaluation.forward import bind_forward, make_eval_forward
    from mcgaze_tpu.models.mcgaze import ModelConfig

    root = str(tmp_path)
    ann, prefix = make_dataset(root, num_videos=5, length=12)
    all_videos = json.load(open(ann))['videos']
    pairs = [(v['id'], [osp.join(prefix, n) for n in v['file_names']])
             for v in all_videos]

    mc = ModelConfig(backbone_depth=26, num_stages=2,
                     stage_loss_weights=(1.0, 1.0), ffn_channels=256)
    _m, variables, fwd, fwd_dedup = make_eval_forward(mc, canvas=(32, 32))
    cfg = EvalConfig(scale=(32, 32), canvas=(32, 32), crop_ratio=0.84,
                     clip_batch=2)

    def spy(forward, seen):
        def f(imgs, whwh, t):
            seen.update(getattr(imgs, 'devices', set)())
            return forward(imgs, whwh, t)
        f.accepts_uint8 = forward.accepts_uint8
        dd = forward.dedup

        def d(frames, sel, whwh_u, t):
            seen.update(getattr(frames, 'devices', set)())
            return dd(frames, sel, whwh_u, t)
        f.dedup = d
        return f

    devices = jax.local_devices()
    assert len(devices) == 8

    seen_one, seen_all = set(), set()
    ev1 = VideoGazeEvaluator(
        spy(bind_forward(fwd, variables, fwd_dedup), seen_one), cfg)
    single = list(ev1.run_videos_from_paths(iter(pairs),
                                            devices=[devices[0]]))
    ev8 = VideoGazeEvaluator(
        spy(bind_forward(fwd, variables, fwd_dedup), seen_all), cfg)
    multi = list(ev8.run_videos_from_paths(iter(pairs)))

    assert seen_one == {devices[0]}
    assert len(seen_all) == 5           # one device per video, 5 videos
    assert [r['video_id'] for r in multi] == [v['id'] for v in all_videos]
    assert multi == single
