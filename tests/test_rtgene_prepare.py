"""RT-GENE converter goldens.

No cross-execution oracle is possible here (the reference's
tools/dataset_converters/rtgene/convert.py hard-imports
facenet_pytorch+CUDA, absent in this environment), so the deterministic
conversion math is golden-tested against the reference formulas
directly (convert.py:22-26 gaze, :48-56 label parsing, :88-94 boxes)
and the CLI is exercised end-to-end on a fabricated RT-GENE tree with
precomputed detections.
"""
import json
import os
import os.path as osp
import re
import subprocess
import sys

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

from mcgaze_tpu.data import rtgene_prepare as R  # noqa: E402


def test_gaze_to_3d_matches_reference_formula():
    rng = np.random.RandomState(0)
    for _ in range(20):
        phi, theta = rng.uniform(-1.2, 1.2, 2)
        got = R.gaze_to_3d(phi, theta)
        # convert.py:22-26 verbatim
        exp = [-np.cos(theta) * np.sin(phi), -np.sin(theta),
               -np.cos(theta) * np.cos(phi)]
        np.testing.assert_allclose(got, exp, rtol=0, atol=1e-12)
        assert abs(np.linalg.norm(got) - 1.0) < 1e-9


def test_parse_labels_token_indices(tmp_path):
    # the exact line shape the reference's re.split indexing assumes:
    # "id, [h_phi, h_theta], [g_phi, g_theta]" -> tokens 9/11 = gaze
    p = tmp_path / 'label_combined.txt'
    p.write_text('4, [0.042150, 0.146170], [0.300000, -0.250000]\n'
                 '7, [0.100000, 0.200000], [-0.700000, 0.100000]\n')
    labels = R.parse_labels(str(p))
    assert set(labels) == {'4', '7'}
    np.testing.assert_allclose(labels['4'], R.gaze_to_3d(0.3, -0.25))
    np.testing.assert_allclose(labels['7'], R.gaze_to_3d(-0.7, 0.1))
    # cross-check the tokenization itself against the reference split
    toks = re.split(r'\[| |,|\]',
                    '4, [0.042150, 0.146170], [0.300000, -0.250000]')
    assert (float(toks[9]), float(toks[11])) == (0.3, -0.25)


def test_eye_and_face_box_formulas():
    lm = np.array([[40.7, 50.2], [70.1, 48.9], [55, 60], [45, 75],
                   [65, 75]], np.float32)
    # convert.py:91-94
    assert R.eye_box_from_landmarks(lm) == [
        int(40.7 - 30), int(min(50.2, 48.9) - 18),
        int(70.1 - 40.7 + 60), 36]
    assert R.face_box_xywh([10.9, 12.1, 90.8, 101.2]) == [
        10, 12, int(90.8 - 10.9), int(101.2 - 12.1)]


def _make_tree(root, subjects, n_frames, rng):
    import cv2
    detections = {}
    for subj in subjects:
        sdir = osp.join(root, subj + '_glasses')
        fdir = osp.join(sdir, 'inpainted', 'face_after_inpainting')
        os.makedirs(fdir)
        lines = []
        for i in range(n_frames):
            cv2.imwrite(osp.join(fdir, f'{i:06d}.png'),
                        rng.randint(0, 255, (224, 224, 3), np.uint8))
            if i == 1:      # frame 1: no label -> must be skipped
                continue
            phi, theta = rng.uniform(-1, 1, 2)
            lines.append(f'{i}, [0.1, 0.2], [{phi:.6f}, {theta:.6f}]\n')
            if i == 2:      # frame 2: labelled but no detection
                continue
            detections[f'{subj}/{i}'] = {
                'box': [20.0 + i, 25.0, 90.0, 100.0],
                'landmarks': [[40.0, 50.0], [70.0, 49.0], [55, 60],
                              [45, 75], [65, 75]]}
        with open(osp.join(sdir, 'label_combined.txt'), 'w') as f:
            f.writelines(lines)
    return detections


def test_convert_cli_end_to_end(tmp_path):
    import cv2
    rng = np.random.RandomState(3)
    root = str(tmp_path / 'raw')
    out = str(tmp_path / 'conv')
    subjects = R.TEST_FOLDS[1]                  # s001 s002 s008 s010
    n = 5
    dets = _make_tree(root, subjects, n, rng)
    det_path = str(tmp_path / 'dets.json')
    with open(det_path, 'w') as f:
        json.dump(dets, f)

    r = subprocess.run(
        [sys.executable,
         osp.join(REPO, 'tools/dataset_converters/rtgene/convert.py'),
         '--root', root, '--out', out, '--detections', det_path,
         '--folds', 'test1'],
        capture_output=True, text=True, timeout=300,
        env=dict(os.environ, JAX_PLATFORMS='cpu'))
    assert r.returncode == 0, r.stdout + r.stderr

    with open(osp.join(out, 'annotations', 'test1.json')) as f:
        js = json.load(f)
    assert [c['name'] for c in js['categories']] == [
        'person_face', 'eye', 'head']
    assert len(js['videos']) == len(subjects)
    assert len(js['annotations']) == 3 * len(subjects)
    kept = n - 2                                # frames 1 and 2 dropped
    for vid_entry, subj in zip(js['videos'], subjects):
        assert vid_entry['length'] == kept
        assert vid_entry['height'] == vid_entry['width'] == 224
        # frames renumbered from 0 under the int subject dir
        assert vid_entry['file_names'][0] == osp.join(
            str(int(subj[1:4])), '000000.png')
        img = cv2.imread(osp.join(out, vid_entry['file_names'][0]))
        assert img.shape == (112, 112, 3)
    by_vid = {}
    for a in js['annotations']:
        by_vid.setdefault(a['video_id'], []).append(a)
    for vid_id, anns in by_vid.items():
        assert [a['category_id'] for a in anns] == [1, 2, 3]
        face, eye, head = anns
        assert face['gaze'] == eye['gaze'] == head['gaze']
        assert len(face['gaze']) == kept
        assert all(b == [0, 0, 224, 224] for b in head['bboxes'])
        assert eye['bboxes'][0] == R.eye_box_from_landmarks(
            np.array([[40.0, 50.0], [70.0, 49.0], [55, 60], [45, 75],
                      [65, 75]]))
        # detection ran on the resized 112px image coords as given
        assert face['bboxes'][0][0] >= 20
    # annotation ids sequential from 1
    assert [a['id'] for a in js['annotations']] == list(
        range(1, 3 * len(subjects) + 1))

    # the 3-track layout feeds the training dataset: all three clue
    # slots (face/eyes/head) come out valid, like the l2cs-style JSONs
    from mcgaze_tpu.data.dataset import DataConfig, Gaze360ClipDataset
    ds = Gaze360ClipDataset(DataConfig(
        ann_file=osp.join(out, 'annotations', 'test1.json'),
        img_prefix=out, clip_length=3, crop_size=None, batch_size=2,
        scale=(112, 112), canvas=(112, 112)))
    assert len(ds) == len(subjects) * kept
    clip = ds.get_clip(0)
    assert clip['gt_valid'].shape[-1] == 3 and clip['gt_valid'].all()
    assert np.isfinite(clip['imgs']).all()
