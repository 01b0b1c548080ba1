"""MPEblink raw-frames builder vs the reference script, cross-executed.

Fabricates a tiny MPEblink video release (mp4 + annote.json per video,
multi-person tracks, occluded None-bbox frames, blink events), runs the
REFERENCE's tools/dataset_converters/mpeblink_build_raw_frames_dataset.py
verbatim as a subprocess on one copy and our CLI on another, and asserts
pixel-identical rawframe trees and semantically identical JSONs.
"""
import json
import os
import os.path as osp
import shutil
import subprocess
import sys

import numpy as np
import pytest

REF = '/root/reference'
REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not osp.isdir(osp.join(REF, 'tools')),
    reason='reference checkout not available')


def run_cli(argv, cwd=None):
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    r = subprocess.run([sys.executable] + argv, cwd=cwd, env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    return r.stdout


def _write_video(path, rng, n_frames, w=64, h=48):
    import cv2
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'), 5,
                         (w, h))
    assert vw.isOpened()
    for _ in range(n_frames):
        vw.write(rng.randint(0, 255, (h, w, 3), np.uint8))
    vw.release()


def _track(rng, length, occluded=(), events=()):
    bbox, landmark = [], []
    for i in range(length):
        if i in occluded:
            bbox.append(None)
            landmark.append(None)
        else:
            x, y = float(rng.uniform(0, 20)), float(rng.uniform(0, 15))
            bbox.append([x, y, float(rng.uniform(5, 30)),
                         float(rng.uniform(5, 20))])
            landmark.append([[float(rng.uniform(0, 64)),
                              float(rng.uniform(0, 48))]
                             for _ in range(68)])
    return {'bbox': bbox, 'landmark': landmark,
            'blink': [list(e) for e in events]}


def make_release(root, rng):
    spec = {'train': {1: 9, 3: 7}, 'test': {2: 6}}
    for split, vids in spec.items():
        for vid, n in vids.items():
            vdir = osp.join(root, split, str(vid))
            os.makedirs(vdir)
            _write_video(osp.join(vdir, 'video.mp4'), rng, n)
            ann = {'height': 48, 'width': 64, 'length': n,
                   'person_0': _track(rng, n, occluded=(0, n - 2),
                                      events=((2, 4), (n - 2, n - 1))),
                   'person_1': _track(rng, n, events=((1, 1),))}
            with open(osp.join(vdir, 'annote.json'), 'w') as f:
                json.dump(ann, f)
    return spec


def _png_tree(root):
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith('.png'):
                p = osp.join(dirpath, f)
                out[osp.relpath(p, root)] = p
    return out


def test_builder_matches_reference_script(tmp_path):
    import cv2
    rng = np.random.RandomState(7)
    master = str(tmp_path / 'master')
    spec = make_release(master, rng)
    ref_root = str(tmp_path / 'ref')
    our_root = str(tmp_path / 'ours')
    shutil.copytree(master, ref_root)
    shutil.copytree(master, our_root)

    run_cli([osp.join(REF, 'tools/dataset_converters/'
                           'mpeblink_build_raw_frames_dataset.py'),
             '--root', ref_root])
    run_cli([osp.join(REPO, 'tools/dataset_converters/'
                            'mpeblink_build_raw_frames_dataset.py'),
             '--root', our_root, '--workers', '3'])

    for split in spec:
        ref_tree = _png_tree(osp.join(ref_root, f'{split}_rawframes'))
        our_tree = _png_tree(osp.join(our_root, f'{split}_rawframes'))
        assert set(our_tree) == set(ref_tree) and ref_tree, split
        for rel in ref_tree:
            a = cv2.imread(ref_tree[rel])
            b = cv2.imread(our_tree[rel])
            assert a.shape == b.shape == (360, 640, 3), (split, rel)
            np.testing.assert_array_equal(a, b, err_msg=f'{split}/{rel}')

        with open(osp.join(ref_root, 'annotations',
                           f'{split}.json')) as f:
            ref_js = json.load(f)
        with open(osp.join(our_root, 'annotations',
                           f'{split}.json')) as f:
            our_js = json.load(f)
        # info carries a run timestamp in the reference; compare the
        # data-bearing sections exactly (scaling arithmetic is the same
        # python float ops, so equality is exact, not approximate)
        for key in ('videos', 'categories', 'annotations'):
            assert our_js[key] == ref_js[key], (split, key)
        assert len(ref_js['annotations']) == 2 * len(ref_js['videos'])


def test_output_feeds_dataset(tmp_path):
    """The builder's JSON + rawframes drive InstBlinkClipDataset."""
    rng = np.random.RandomState(11)
    root = str(tmp_path / 'rel')
    make_release(root, rng)
    from mcgaze_tpu.data.mpeblink_prepare import prepare
    stats = prepare(root, workers=2)
    assert stats['train'].videos == 2 and stats['test'].videos == 1

    from mcgaze_tpu.data.instblink_dataset import (
        InstBlinkClipDataset, InstBlinkDataConfig)
    cfg = InstBlinkDataConfig(
        ann_file=osp.join(root, 'annotations', 'train.json'),
        img_prefix=osp.join(root, 'train_rawframes'),
        clip_length=3, max_instances=4, batch_size=2)
    ds = InstBlinkClipDataset(cfg, seed=0)
    assert len(ds) > 0
    sample = ds.get_clip(0)
    assert sample['imgs'].shape[0] == 3
    assert np.isfinite(sample['imgs']).all()
    assert sample['inst_valid'].any()
    # occluded frame 0 of person_0 must not be marked present
    assert not sample['gt_present'].all()
