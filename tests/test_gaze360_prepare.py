"""Data-prep engine tests: video segmentation, l2cs frame dropping, JSON
schema, rawframe renumbering/resizing (reference reorganizer semantics)."""
import json
import os
import os.path as osp

import numpy as np
import pytest

from mcgaze_tpu.data.gaze360_prepare import (FrameRecord, build_coco_vid_json,
                                             parse_split_txt, prepare_split,
                                             resolve_records, segment_videos)


def _rec(recording, person, frame, detectable=True):
    return FrameRecord(
        rel_path=f'{recording}/head/{person:06d}/{frame:06d}.jpg',
        gaze=(0.0, 0.0, -1.0), recording=recording, person=person,
        frame=frame, face_detectable=detectable)


def test_segment_splits_on_discontinuity():
    recs = ([_rec('rec_a', 1, f) for f in (1, 2, 3)] +
            [_rec('rec_a', 1, 7)] +            # frame gap
            [_rec('rec_a', 2, 8)] +            # person change
            [_rec('rec_b', 2, 9)])             # recording change
    vids = segment_videos(recs, drop_undetectable=False)
    assert [len(v) for v in vids] == [3, 1, 1, 1]


def test_segment_l2cs_drops_and_splits():
    recs = [_rec('r', 1, f, detectable=f not in (3, 4)) for f in range(1, 8)]
    vids = segment_videos(recs, drop_undetectable=True)
    # frames 1,2 | (3,4 dropped) | 5,6,7
    assert [[r.frame for r in v] for v in vids] == [[1, 2], [5, 6, 7]]


def test_json_schema_single_person_tracks():
    entries = [dict(height=4, width=6, length=2,
                    file_names=['1/00000.png', '1/00001.png'], id=1,
                    gazes=[[0, 0, -1], [0, 1, 0]])]
    data = build_coco_vid_json(entries)
    assert data['categories'][0]['name'] == 'person_face'
    v, a = data['videos'][0], data['annotations'][0]
    assert v['id'] == a['video_id'] == a['id'] == 1
    assert a['category_id'] == 1 and a['length'] == 1
    assert a['gaze'] == [[0, 0, -1], [0, 1, 0]]
    assert 'gazes' not in v


def test_prepare_split_end_to_end(tmp_path):
    cv2 = pytest.importorskip('cv2')
    imgs = tmp_path / 'imgs'
    # video 1: frames 1-3 at 8x6 then a 10x6 frame (must be resized to
    # first-frame resolution); video 2 after a frame gap.
    rows = []
    rng = np.random.RandomState(0)
    for frame, shape in [(1, (6, 8)), (2, (6, 8)), (3, (6, 10)), (9, (6, 8))]:
        rel = f'rec_x/head/000001/{frame:06d}.jpg'
        p = imgs / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(p), rng.randint(0, 255, (*shape, 3), np.uint8))
        rows.append(f'{rel} 0.1 0.2 -0.9\n')
    txt = tmp_path / 'train.txt'
    txt.write_text(''.join(rows))

    out_root = str(tmp_path / 'out')
    data = prepare_split(str(imgs), str(txt), out_root, 'train',
                         setting='gaze360', workers=2)
    assert [v['length'] for v in data['videos']] == [3, 1]
    assert data['videos'][0]['id'] == 1 and data['videos'][1]['id'] == 2
    # renumbered from 00000, png, resolution unified to first frame
    f0 = osp.join(out_root, 'train_rawframes', '1', '00002.png')
    assert osp.exists(f0)
    assert cv2.imread(f0).shape[:2] == (6, 8)
    on_disk = json.load(
        open(osp.join(out_root, 'annotations', 'train.json')))
    assert on_disk['videos'] == data['videos']
    assert len(on_disk['annotations'][0]['gaze']) == 3


def test_parse_split_txt_sorted(tmp_path):
    txt = tmp_path / 's.txt'
    txt.write_text('b/head/000001/000002.jpg 0 0 -1\n'
                   'a/head/000001/000001.jpg 0 1 0\n')
    entries = parse_split_txt(str(txt))
    assert entries[0][0].startswith('a/')
    recs = resolve_records(entries)
    assert recs[0].recording == 'a' and recs[0].frame == 1
