"""End-to-end InstBlink CLI chain: train on a fabricated MPEblink
dataset -> checkpoint -> video inference + track/blink AP scoring.

Exercises tools/train_instblink.py and tools/test_instblink.py as
subprocesses — the family's counterpart of the gaze train->eval chain
tests. The reference has NO video-level inference for these models
(mpeblink.py:334 raises NotImplementedError), so this chain is
capability the rebuild adds on top of reference parity.
"""
import json
import os
import subprocess
import sys

import cv2
import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_CFG = """
from mcgaze_tpu.data.instblink_dataset import InstBlinkDataConfig
from mcgaze_tpu.evaluation.instblink_driver import InstBlinkEvalConfig
from mcgaze_tpu.models.query_detector import QueryDetectorConfig
from mcgaze_tpu.train.loop import OptimConfig

model = QueryDetectorConfig(
    num_stages=2, clip_length=3, num_queries=10, num_classes=1,
    channels=32, ffn_channels=64, num_heads=4, dyn_feat_channels=16,
    with_blink=True, max_per_img=4, max_instances=3, roi_impl='mm')
optim = OptimConfig(lr=1e-4, max_iters=2, warmup_iters=1, lr_steps=(2,))
data_train = InstBlinkDataConfig(
    ann_file='{root}/train.json', img_prefix='{root}/rawframes/',
    clip_length=3, scale=(64, 48), canvas=(64, 64), batch_size=2,
    max_instances=3)
data_test = InstBlinkDataConfig(
    ann_file='{root}/train.json', img_prefix='{root}/rawframes/',
    clip_length=3, scale=(64, 48), canvas=(64, 64), max_instances=3,
    flip_ratio=0.0, keep_ratio=False)
eval_cfg = InstBlinkEvalConfig(clip_length=3, overlap=1, max_per_img=4,
                               score_threshold=0.0)
work_dir = '{root}/work'
"""


def _fabricate(root):
    frames, h, w = 8, 48, 64
    rng = np.random.RandomState(0)
    videos, annotations = [], []
    for vid in (1, 2):
        names = []
        d = root / f'rawframes/v{vid}'
        d.mkdir(parents=True, exist_ok=True)
        for fi in range(frames):
            name = f'v{vid}/{fi:05d}.png'
            cv2.imwrite(str(root / 'rawframes' / name),
                        rng.randint(0, 255, (h, w, 3), np.uint8))
            names.append(name)
        videos.append(dict(id=vid, height=h, width=w, length=frames,
                           file_names=names))
        for inst in range(2):
            bb = [None if (inst == 1 and fi == 0)
                  else [5 + inst * 25, 5, 15, 20] for fi in range(frames)]
            annotations.append(dict(
                id=(vid - 1) * 2 + inst + 1, video_id=vid, category_id=1,
                bboxes=bb,
                blinks_binary=[1 if 3 <= fi <= 4 else 0
                               for fi in range(frames)],
                blinks=[[3, 4]]))
    (root / 'train.json').write_text(json.dumps(dict(
        videos=videos, annotations=annotations,
        categories=[dict(id=1, name='person_face')])))


def _run(args, cwd):
    env = dict(os.environ, JAX_PLATFORMS='cpu',
               PYTHONPATH=REPO + os.pathsep + os.environ.get('PYTHONPATH',
                                                             ''))
    return subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=560)


def test_train_then_eval_chain(tmp_path):
    _fabricate(tmp_path)
    cfg = tmp_path / 'tiny_cfg.py'
    cfg.write_text(TINY_CFG.format(root=tmp_path))

    r = _run([f'{REPO}/tools/train_instblink.py', str(cfg),
              '--max-iters', '2', '--log-interval', '1'], cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert 'loss' in r.stdout and 'nan' not in r.stdout.lower()

    r = _run([f'{REPO}/tools/test_instblink.py', str(cfg),
              f'{tmp_path}/work/ckpt_2', '--out',
              f'{tmp_path}/results.json', '--eval'], cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert 'track mAP' in r.stdout and 'blink action AP' in r.stdout
    inline_scores = [ln for ln in r.stdout.splitlines()
                     if 'track mAP' in ln or 'blink action' in ln]

    # offline re-score of the saved results: no checkpoint, same APs
    r2 = _run([f'{REPO}/tools/test_instblink.py', str(cfg),
               '--eval-only', f'{tmp_path}/results.json'], cwd=tmp_path)
    assert r2.returncode == 0, r2.stderr[-2000:]
    offline_scores = [ln for ln in r2.stdout.splitlines()
                      if 'track mAP' in ln or 'blink action' in ln]
    assert offline_scores == inline_scores

    results = json.loads((tmp_path / 'results.json').read_text())
    assert results, 'no tracks emitted'
    for tr in results:
        assert set(tr) >= {'video_id', 'score', 'category_id', 'bboxes',
                           'blink_scores', 'blinks_converted'}
        assert len(tr['bboxes']) == 8


def test_train_synthetic_smoke(tmp_path):
    _fabricate(tmp_path)           # config needs the paths to exist
    cfg = tmp_path / 'tiny_cfg.py'
    cfg.write_text(TINY_CFG.format(root=tmp_path))
    r = _run([f'{REPO}/tools/train_instblink.py', str(cfg), '--synthetic',
              '--max-iters', '2', '--log-interval', '1'], cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert 'done: 2 iters' in r.stdout
