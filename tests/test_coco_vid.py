"""CocoVid query surface (cocoapi/MPEblink-style getAnnIds/getVidIds/...)."""
import json

import pytest

from mcgaze_tpu.data.coco_vid import CocoVid


@pytest.fixture(scope='module')
def api(tmp_path_factory):
    d = tmp_path_factory.mktemp('cv')
    data = dict(
        videos=[dict(id=1, width=8, height=6, length=2,
                     file_names=['1/0.png', '1/1.png']),
                dict(id=2, width=8, height=6, length=1,
                     file_names=['2/0.png'])],
        categories=[dict(id=1, name='person_face'),
                    dict(id=2, name='other')],
        annotations=[
            dict(id=3, video_id=1, category_id=1, bboxes=[None, None],
                 gaze=[[0, 0, -1]] * 2),
            dict(id=1, video_id=1, category_id=2, bboxes=[None, None],
                 gaze=[[0, 0, -1]] * 2),
            dict(id=2, video_id=2, category_id=1, bboxes=[None],
                 gaze=[[0, 0, -1]]),
        ])
    p = d / 'ann.json'
    p.write_text(json.dumps(data))
    return CocoVid(str(p))


def test_get_ann_ids_filters(api):
    assert api.getAnnIds() == [1, 2, 3]
    assert api.getAnnIds(vidIds=1) == [1, 3]
    assert api.getAnnIds(vidIds=[1], catIds=[1]) == [3]
    assert api.getAnnIds(catIds=2) == [1]


def test_get_vid_ids(api):
    assert api.getVidIds() == [1, 2]
    assert api.getVidIds(catIds=[2]) == [1]
    assert api.getVidIds(vidIds=[2], catIds=[1]) == [2]


def test_get_cat_ids_and_loaders(api):
    assert api.getCatIds() == [1, 2]
    assert api.getCatIds(catNms=['person_face']) == [1]
    assert api.loadVids(1)[0]['length'] == 2
    assert [a['id'] for a in api.loadAnns([3, 1])] == [3, 1]
    assert api.loadCats(2)[0]['name'] == 'other'
    assert len(api.loadAnns()) == 3


def test_anns_of_video_ordered_by_id(api):
    assert [a['id'] for a in api.anns_of_video(1)] == [1, 3]
