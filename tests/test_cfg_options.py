"""--cfg-options override surface (reference mmcv DictAction parity)."""
import pytest

from mcgaze_tpu.utils.cfg_options import apply_overrides, parse_value
from mcgaze_tpu.utils.config import load_config


def test_parse_value_types():
    assert parse_value('3') == 3
    assert parse_value('0.5') == 0.5
    assert parse_value('true') is True
    assert parse_value('None') is None
    assert parse_value('bfloat16') == 'bfloat16'
    assert parse_value('6000,6500') == (6000, 6500)


def test_apply_overrides_nested_frozen_dataclasses():
    cfg = load_config('configs/multiclue_gaze/multiclue_gaze_r50_gaze360.py')
    out = apply_overrides(cfg, [
        'optim.lr=0.002', 'optim.lr_steps=5000,5500',
        'model.dtype=bfloat16', 'data_train.batch_size=4',
        'checkpoint_interval=500',
    ])
    assert out.optim.lr == 0.002 and out.optim.lr_steps == (5000, 5500)
    assert out.model.dtype == 'bfloat16'
    assert out.data_train.batch_size == 4
    assert out.checkpoint_interval == 500
    # originals untouched (frozen semantics)
    assert cfg.optim.lr == 1e-3


def test_apply_overrides_errors():
    cfg = load_config('configs/multiclue_gaze/multiclue_gaze_r50_gaze360.py')
    with pytest.raises(AttributeError):
        apply_overrides(cfg, ['model.nonexistent=1'])
    with pytest.raises(ValueError):
        apply_overrides(cfg, ['model.dtype'])
