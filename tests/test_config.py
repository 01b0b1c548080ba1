"""Config loader tests: native configs + legacy mmdet-style translation."""
import textwrap

from mcgaze_tpu.utils.config import load_config, load_legacy_dict


def test_native_configs_load():
    for name in ('multiclue_gaze_r50_gaze360', 'multiclue_gaze_r50_l2cs'):
        cfg = load_config(f'configs/multiclue_gaze/{name}.py')
        assert cfg.model.num_stages == 4
        assert cfg.model.clip_length == 7
    g = load_config('configs/multiclue_gaze/multiclue_gaze_r50_gaze360.py')
    l = load_config('configs/multiclue_gaze/multiclue_gaze_r50_l2cs.py')
    assert g.data_train.scale == (224, 224) and g.data_train.crop_size
    assert l.data_train.scale == (448, 448) and l.data_train.crop_size is None
    assert l.optim.max_iters == 13000 and l.optim.lr_steps == (12000,)


def test_legacy_config_surface(tmp_path):
    base = tmp_path / 'base.py'
    base.write_text(textwrap.dedent("""
        optimizer = dict(type='SGD', lr=0.02, momentum=0.9)
        lr_config = dict(policy='step', warmup='linear', warmup_iters=500,
                         warmup_ratio=0.001, step=[8, 11])
        data = dict(samples_per_gpu=2,
                    train=dict(ann_file='a.json', img_prefix='imgs/',
                               clip_length=7,
                               pipeline=[dict(type='CenterCrop',
                                              crop_size=(0.68, 0.68)),
                                         dict(type='Resize',
                                              img_scale=(224, 224)),
                                         dict(type='RandomFlip',
                                              flip_ratio=0.5)]),
                    test=dict(ann_file='t.json', img_prefix='imgs/',
                              clip_length=7,
                              pipeline=[dict(type='Resize',
                                             img_scale=(224, 224))]))
        """))
    child = tmp_path / 'child.py'
    child.write_text(textwrap.dedent("""
        _base_ = ['base.py']
        clip_length = 7
        model = dict(
            type='MultiClueGaze',
            backbone=dict(type='ResNet', depth=50),
            roi_head=dict(
                type='MultiClueGazeROIHead', num_stages=4,
                stage_loss_weights=[1, 1, 1, 1],
                bbox_head=[dict(loss_cls=dict(type='FocalLoss', gamma=2.0,
                                              alpha=0.25, loss_weight=2.0),
                                loss_bbox=dict(loss_weight=5.0),
                                loss_iou=dict(loss_weight=2.0))] * 4,
                gaze_head=[dict(loss_gaze=dict(loss_weight=6.0),
                                loss_temp=dict(loss_weight=1.0))] * 4))
        optimizer = dict(_delete_=True, type='AdamW', lr=0.001,
                         weight_decay=0.0001,
                         paramwise_cfg=dict(custom_keys={
                             'backbone': dict(lr_mult=0.1)}))
        optimizer_config = dict(_delete_=True,
                                grad_clip=dict(max_norm=0.1))
        lr_config = dict(policy='step', step=[6000], warmup_iters=1000)
        runner = dict(_delete_=True, type='IterBasedRunner', max_iters=7000)
        work_dir = './work_dirs/xyz'
        """))
    merged = load_legacy_dict(str(child))
    # _delete_ replaced the SGD base optimizer entirely
    assert merged['optimizer']['type'] == 'AdamW'
    assert 'momentum' not in merged['optimizer']
    # recursive merge kept base warmup_ratio under override of step
    assert merged['lr_config']['step'] == [6000]
    assert merged['lr_config']['warmup_ratio'] == 0.001

    cfg = load_config(str(child))
    assert cfg.optim.lr == 0.001
    assert cfg.optim.backbone_lr_mult == 0.1
    assert cfg.optim.grad_clip_norm == 0.1
    assert cfg.optim.lr_steps == (6000,)
    assert cfg.optim.max_iters == 7000
    assert cfg.model.loss_gaze_weight == 6.0
    assert cfg.data_train.crop_size == 0.68
    assert cfg.data_train.batch_size == 2
    assert cfg.work_dir == './work_dirs/xyz'


import os.path as osp

import pytest

REFERENCE = '/root/reference'


@pytest.mark.skipif(not osp.isdir(REFERENCE),
                    reason='reference checkout not mounted')
def test_unmodified_reference_configs_load():
    """The translator must consume the reference's ACTUAL config files
    (mmcv dict style, `_base_` inheritance) without edits."""
    g = load_config(osp.join(
        REFERENCE, 'configs/multiclue_gaze/multiclue_gaze_r50_gaze360.py'))
    assert g.model.num_stages == 4 and g.model.clip_length == 7
    assert g.model.loss_gaze_weight == 6.0 and g.model.loss_bbox_weight == 5.0
    assert g.optim.lr == 1e-3 and g.optim.max_iters == 7000
    assert g.optim.lr_steps == (6000,) and g.optim.backbone_lr_mult == 0.1
    assert g.optim.grad_clip_norm == 0.1
    assert g.data_train.batch_size == 32
    assert g.data_train.scale == (224, 224)
    assert g.data_train.crop_size == 0.68

    l = load_config(osp.join(
        REFERENCE, 'configs/multiclue_gaze/multiclue_gaze_r50_l2cs.py'))
    assert l.optim.max_iters == 13000 and l.optim.lr_steps == (12000,)
    assert l.data_train.scale == (448, 448)
    assert l.data_train.batch_size == 8
    assert l.data_train.crop_size is None


def test_legacy_explicit_zero_flip_preserved(tmp_path):
    """flip_ratio=0.0 (and None) in a legacy pipeline must NOT be replaced
    by the 0.5 train default (review finding: falsy-value bug)."""
    cfgf = tmp_path / 'c.py'
    cfgf.write_text(textwrap.dedent("""
        data = dict(samples_per_gpu=2,
                    train=dict(ann_file='a.json', img_prefix='i/',
                               pipeline=[dict(type='Resize',
                                              img_scale=(224, 224)),
                                         dict(type='RandomFlip',
                                              flip_ratio=0.0)]),
                    test=dict(ann_file='t.json', img_prefix='i/',
                              pipeline=[dict(type='Resize',
                                             img_scale=(224, 224))]))
        """))
    cfg = load_config(str(cfgf))
    assert cfg.data_train.flip_ratio == 0.0      # explicit 0 kept
    # no RandomFlip step at all -> split default applies
    assert cfg.data_test.flip_ratio == 0.0


def test_legacy_gaze_loss_type_selection(tmp_path):
    """type='GazeCosLoss'/'GazePinballLoss' in a legacy config select the
    alternative gaze losses (reference losses/__init__.py:21-24 registers
    them as config-selectable)."""
    template = textwrap.dedent("""
        model = dict(
            roi_head=dict(
                num_stages=4,
                bbox_head=[dict(num_cls_fcs=1)],
                gaze_head=[dict(loss_gaze=dict(type={loss!r},
                                               loss_weight=3.5))]))
        data = dict(samples_per_gpu=2,
                    train=dict(ann_file='a.json', img_prefix='i/',
                               pipeline=[dict(type='Resize',
                                              img_scale=(224, 224))]),
                    test=dict(ann_file='t.json', img_prefix='i/',
                              pipeline=[dict(type='Resize',
                                             img_scale=(224, 224))]))
        """)
    for ref_name, native in (('GazeArccosLoss', 'arccos'),
                             ('GazeCosLoss', 'cos'),
                             ('GazePinballLoss', 'pinball')):
        f = tmp_path / f'{native}.py'
        f.write_text(template.format(loss=ref_name))
        cfg = load_config(str(f))
        assert cfg.model.gaze_loss_type == native
        assert cfg.model.loss_gaze_weight == 3.5

    # shipped reference config selects arccos
    g = load_config(osp.join(
        REFERENCE, 'configs/multiclue_gaze/multiclue_gaze_r50_gaze360.py'))
    assert g.model.gaze_loss_type == 'arccos'


def test_criterion_dispatches_gaze_loss_type():
    """total_loss under each gaze_loss_type produces a finite scalar and
    differs from arccos (the dispatch is real, not a re-label)."""
    import dataclasses

    import jax
    import numpy as np

    from mcgaze_tpu.models.mcgaze import ModelConfig
    from mcgaze_tpu.train.criterion import total_loss
    from mcgaze_tpu.train.targets import ClipTargets

    rng = np.random.RandomState(0)
    n, q = 14, 3
    gaze = {}
    for k in ('fusion', 'face', 'eyes', 'head'):
        v = rng.randn(n, 3).astype(np.float32)
        gaze[k] = v / np.linalg.norm(v, axis=-1, keepdims=True)
    stage = dict(
        cls_logits=rng.randn(n, q, 1).astype(np.float32),
        boxes=np.abs(rng.randn(n, q, 4).astype(np.float32)) * 50,
        gaze=gaze)
    stage['boxes'][..., 2:] += stage['boxes'][..., :2]
    gazes_t = rng.randn(n, q, 3).astype(np.float32)
    gazes_t /= np.linalg.norm(gazes_t, axis=-1, keepdims=True)
    tg = ClipTargets(
        boxes=stage['boxes'] + rng.randn(n, q, 4).astype(np.float32),
        valid=(rng.rand(n, q) > 0.4).astype(np.float32),
        gazes=gazes_t,
        whwh=np.full((n, 4), 224.0, np.float32))

    out = {'stages': [stage]}
    vals = {}
    for lt in ('arccos', 'cos', 'pinball'):
        cfg = ModelConfig(num_stages=1, gaze_loss_type=lt,
                          clip_length=7, stage_loss_weights=(1.0,))
        total, logs = jax.jit(
            lambda o, t, c=cfg: total_loss(c, o, t, 14))(out, tg)
        vals[lt] = float(total)
        assert np.isfinite(vals[lt])
    assert len(set(vals.values())) == 3, vals   # all three distinct


def test_legacy_unknown_gaze_loss_type_raises(tmp_path):
    import pytest

    f = tmp_path / 'bad.py'
    f.write_text(textwrap.dedent("""
        model = dict(roi_head=dict(
            bbox_head=[dict()],
            gaze_head=[dict(loss_gaze=dict(type='SmoothL1Loss'))]))
        data = dict(train=dict(ann_file='a', img_prefix='i', pipeline=[]),
                    test=dict(ann_file='t', img_prefix='i', pipeline=[]))
        """))
    with pytest.raises(ValueError, match='SmoothL1Loss'):
        load_config(str(f))
