"""Training hooks: EMA math, NaN guard, text logger (reference mmcv
EMAHook / CheckInvalidLossHook / TextLoggerHook semantics)."""
import jax.numpy as jnp
import pytest

from mcgaze_tpu.train.hooks import CheckInvalidLoss, TextLogger, ema_update


def test_ema_update_momentum():
    ema = {'w': jnp.asarray(1.0)}
    p = {'w': jnp.asarray(2.0)}
    out = ema_update(ema, p, momentum=0.25)
    assert float(out['w']) == pytest.approx(1.0 * 0.75 + 2.0 * 0.25)


def test_check_invalid_loss_raises_on_nan():
    guard = CheckInvalidLoss(interval=10)
    guard.after_iter(10, {'loss': jnp.asarray(1.0)})          # fine
    guard.after_iter(13, {'loss': jnp.asarray(float('nan'))})  # off-interval
    with pytest.raises(FloatingPointError):
        guard.after_iter(20, {'loss': jnp.asarray(float('nan'))})


def test_text_logger_writes_jsonl(tmp_path, capsys):
    logger = TextLogger(str(tmp_path), max_iters=100, interval=2)
    logger.after_iter(1, {'loss': 0.5}, lr=1e-3)               # skipped
    logger.after_iter(2, {'loss': 0.4, 'grad_norm': 0.1}, lr=1e-3)
    out = capsys.readouterr().out
    assert 'Iter [2/100]' in out and 'loss: 0.4' in out
    lines = (tmp_path / 'train_log.jsonl').read_text().strip().split('\n')
    assert len(lines) == 1
    import json
    rec = json.loads(lines[0])
    assert rec['step'] == 2 and rec['loss'] == 0.4
