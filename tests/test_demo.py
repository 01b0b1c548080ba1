"""Demo pipeline logic: label parsing, constant-person-count segmentation,
square crops, arrow rendering (reference MCGaze_demo/demo.ipynb cells 1,4,5)."""
import numpy as np
import pytest

from demo.gaze_demo import (draw_gaze, group_segments, read_labels,
                            square_crop)


def test_read_labels_sorted_and_filtered(tmp_path):
    p = tmp_path / '0.txt'
    p.write_text('0 5 5 20 20\n'       # person class -> ignored
                 '1 50 10 80 40\n'
                 '1 10 10 40 40\n')
    boxes = read_labels(str(p))
    assert boxes == [[10, 10, 40, 40], [50, 10, 80, 40]]
    assert read_labels(str(tmp_path / 'missing.txt')) == []


def test_group_segments_constant_person_count():
    frame_boxes = [
        [[0, 0, 1, 1]],                      # 1 person
        [[0, 0, 1, 1]],
        [[0, 0, 1, 1], [5, 0, 6, 1]],        # 2 persons -> new segment
        [[0, 0, 1, 1], [5, 0, 6, 1]],
        [],                                   # 0 persons -> new segment
    ]
    segs = group_segments(frame_boxes)
    assert [len(s['frame_id']) for s in segs] == [2, 2, 1]
    assert [len(s['persons']) for s in segs] == [1, 2, 0]
    assert segs[1]['persons'][1] == [[5, 0, 6, 1], [5, 0, 6, 1]]


def test_square_crop_center_and_clamp():
    img = np.arange(100 * 100 * 3, dtype=np.uint8).reshape(100, 100, 3)
    crop = square_crop(img, (40, 40, 60, 60), margin=0.8)
    # center (50,50), l = 0.8*20 = 16 -> 32x32
    assert crop.shape == (32, 32, 3)
    np.testing.assert_array_equal(crop, img[34:66, 34:66])
    # near-border crop clamps instead of wrapping
    crop = square_crop(img, (0, 0, 20, 20), margin=1.0)
    assert crop.shape == (30, 30, 3)


def test_draw_gaze_paints_pixels():
    pytest.importorskip('cv2')
    img = np.zeros((100, 100, 3), np.uint8)
    draw_gaze(img, (30, 30, 70, 70), np.asarray([0.0, -1.0, 0.0]))
    assert img.sum() > 0                      # arrow rendered
