"""TeViT variant: MsgShifT backbone inside the query detector, config
loading (native + the reference's legacy dataset configs), a
sharded==unsharded check for the query train step, and the full
YouTubeVIS-layout CLI chain (train on a fabricated blink-free dataset
with the MsgShifT backbone -> checkpoint -> inference -> track AP).
"""
import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcgaze_tpu.models.query_detector import (QueryDetectorConfig,
                                              init_query_model)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_TEVIT = QueryDetectorConfig(
    backbone='msgshift', num_stages=2, clip_length=2, num_queries=8,
    num_classes=5, with_blink=False, channels=32, ffn_channels=64,
    num_heads=4, dyn_feat_channels=16, max_per_img=4, max_instances=2,
    roi_impl='mm')


def test_tevit_msgshift_forward_shapes():
    model, variables = init_query_model(TINY_TEVIT, jax.random.PRNGKey(0),
                                        image_size=(64, 64))
    t = TINY_TEVIT.clip_length
    imgs = jnp.asarray(np.random.RandomState(0).randn(2 * t, 64, 64, 3),
                       jnp.float32)
    whwh = jnp.tile(jnp.asarray([[64., 64., 64., 64.]]), (2 * t, 1))
    out = jax.jit(model.apply, static_argnames='clip_length')(
        variables, imgs, whwh, clip_length=t)
    assert len(out['stages']) == 2
    s = out['stages'][-1]
    assert s['cls_logits'].shape == (2 * t, 8, 5)
    assert s['boxes'].shape == (2 * t, 8, 4)
    assert 'blink_logits' not in s
    assert np.isfinite(np.asarray(s['boxes'])).all()


def test_native_configs_load():
    from mcgaze_tpu.utils.query_config import load_query_config
    for path, backbone, blink in [
            ('configs/instblink/instblink_r50_mpeblink.py', 'resnet50',
             True),
            ('configs/tevit/tevit_msgshift_youtubevis.py', 'msgshift',
             False)]:
        cfg = load_query_config(path)
        assert cfg.model.backbone == backbone
        assert cfg.model.with_blink is blink
        assert cfg.model.num_queries == 100 and cfg.model.num_stages == 6


def test_legacy_reference_dataset_configs_translate():
    """The reference's own dataset configs load unmodified."""
    from mcgaze_tpu.utils.query_config import load_query_config
    cfg = load_query_config(
        '/root/reference/configs/_base_/datasets/mpeblink.py')
    assert cfg.data_train.clip_length == 11
    assert cfg.data_train.scale == (640, 360)
    assert cfg.data_train.batch_size == 4
    assert cfg.data_train.with_blinks and cfg.model.with_blink
    assert cfg.data_test.keep_ratio is False      # test-time exact warp
    assert cfg.data_train.keep_ratio is True
    assert cfg.model.num_classes == 1

    cfg = load_query_config(
        '/root/reference/configs/_base_/datasets/'
        'youtubevis_resplit_v2_clip_len5.py')
    assert cfg.data_train.clip_length == 5
    assert not cfg.model.with_blink or cfg.data_train.with_blinks


@pytest.mark.slow
def test_query_train_step_sharded_matches_unsharded():
    """One identical batch stepped on 1 device and on an 8-device data
    mesh produces the same loss/params — the family inherits the
    DDP-replacement correctness claim of the gaze path
    (tests/test_train_step.py)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mcgaze_tpu.train.loop import OptimConfig
    from mcgaze_tpu.train.query_loop import (create_query_train_state,
                                             make_query_train_step)

    cfg = QueryDetectorConfig(
        num_stages=1, clip_length=2, num_queries=6, num_classes=1,
        channels=16, ffn_channels=32, num_heads=2, dyn_feat_channels=8,
        with_blink=True, max_instances=2, roi_impl='mm')
    oc = OptimConfig(lr=1e-3, warmup_iters=1, lr_steps=(10,), max_iters=20)
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    b, t, m = 8, cfg.clip_length, cfg.max_instances
    rng = np.random.RandomState(0)
    boxes = rng.rand(b, m, t, 4).astype(np.float32) * 20
    boxes[..., 2:] += boxes[..., :2] + 10
    batch = dict(
        imgs=rng.randn(b * t, 32, 32, 3).astype(np.float32) * 0.1,
        whwh=np.tile(np.asarray([[32., 32., 32., 32.]], np.float32),
                     (b * t, 1)),
        gt_boxes=boxes,
        gt_labels=np.zeros((b, m), np.int32),
        gt_present=np.ones((b, m, t), bool),
        inst_valid=np.ones((b, m), bool),
        gt_blinks=rng.randint(0, 2, (b, m, t)).astype(np.float32),
    )
    step = make_query_train_step(cfg, oc)

    state1 = create_query_train_state(cfg, oc, jax.random.PRNGKey(7),
                                      image_size=(32, 32))
    _s1, logs1 = step(state1, {k: jnp.asarray(v)
                               for k, v in batch.items()})

    mesh = Mesh(np.asarray(jax.devices()[:8]), ('data',))
    def shard(k, v):
        spec = P('data') if v.shape[0] in (b, b * t) else P()
        return jax.device_put(jnp.asarray(v), NamedSharding(mesh, spec))
    sbatch = {k: shard(k, np.asarray(v)) for k, v in batch.items()}
    state2 = create_query_train_state(cfg, oc, jax.random.PRNGKey(7),
                                      image_size=(32, 32))
    _s2, logs2 = step(state2, sbatch)
    np.testing.assert_allclose(float(logs1['loss']), float(logs2['loss']),
                               rtol=2e-5)
    l1 = jax.tree.leaves(_s1.params)
    l2 = jax.tree.leaves(_s2.params)
    for a, c in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-4, atol=5e-6)


TEVIT_TINY_CFG = """
from mcgaze_tpu.data.instblink_dataset import InstBlinkDataConfig
from mcgaze_tpu.evaluation.instblink_driver import InstBlinkEvalConfig
from mcgaze_tpu.models.query_detector import QueryDetectorConfig
from mcgaze_tpu.train.loop import OptimConfig

model = QueryDetectorConfig(
    backbone='msgshift', num_stages=2, clip_length=3, num_queries=10,
    num_classes=2, channels=32, ffn_channels=64, num_heads=4,
    dyn_feat_channels=16, with_blink=False, max_per_img=4,
    max_instances=3, msg_num_tokens=8, roi_impl='mm')
optim = OptimConfig(lr=1e-4, max_iters=2, warmup_iters=1, lr_steps=(2,))
data_train = InstBlinkDataConfig(
    ann_file='{root}/train.json', img_prefix='{root}/rawframes/',
    clip_length=3, scale=(64, 48), canvas=(64, 64), batch_size=2,
    max_instances=3, with_blinks=False)
data_test = InstBlinkDataConfig(
    ann_file='{root}/train.json', img_prefix='{root}/rawframes/',
    clip_length=3, scale=(64, 48), canvas=(64, 64), max_instances=3,
    flip_ratio=0.0, keep_ratio=False, with_blinks=False)
eval_cfg = InstBlinkEvalConfig(clip_length=3, overlap=1, max_per_img=4,
                               score_threshold=0.0)
work_dir = '{root}/work'
"""


def _fabricate_ytvis(root):
    """Blink-free YouTubeVIS-layout COCO-VID: 2 videos x 2 instance
    tracks with 2 categories and per-frame absences."""
    import cv2
    frames, h, w = 6, 48, 64
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
                id=(vid - 1) * 2 + inst + 1, video_id=vid,
                category_id=inst + 1, bboxes=bb))
    (root / 'train.json').write_text(json.dumps(dict(
        videos=videos, annotations=annotations,
        categories=[dict(id=1, name='person'), dict(id=2, name='ytvis')])))


@pytest.mark.slow
def test_tevit_msgshift_cli_chain(tmp_path):
    """train (MsgShifT, blink-free data) -> ckpt -> inference -> track AP
    through the family CLIs — the TeViT counterpart of
    test_instblink_cli.py's chain (which drives ResNet + blinks)."""
    _fabricate_ytvis(tmp_path)
    cfg = tmp_path / 'tevit_tiny.py'
    cfg.write_text(TEVIT_TINY_CFG.format(root=tmp_path))
    env = dict(os.environ, JAX_PLATFORMS='cpu',
               PYTHONPATH=REPO + os.pathsep + os.environ.get(
                   'PYTHONPATH', ''))

    r = subprocess.run(
        [sys.executable, f'{REPO}/tools/train_instblink.py', str(cfg),
         '--max-iters', '2', '--log-interval', '1'],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=560)
    assert r.returncode == 0, r.stderr[-2000:]
    assert 'loss' in r.stdout and 'nan' not in r.stdout.lower()

    r = subprocess.run(
        [sys.executable, f'{REPO}/tools/test_instblink.py', str(cfg),
         f'{tmp_path}/work/ckpt_2', '--out', f'{tmp_path}/results.json',
         '--eval'],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=560)
    assert r.returncode == 0, r.stderr[-2000:]
    assert 'track mAP' in r.stdout
    assert 'blink action AP' not in r.stdout    # with_blink=False branch
    results = json.loads((tmp_path / 'results.json').read_text())
    assert results, 'no tracks emitted'
    for tr in results:
        assert 'blink_scores' not in tr
        assert len(tr['bboxes']) == 6
