"""Training-loop hooks, re-imagined for a jit world.

The reference runs mmcv hooks around IterBasedRunner (apis/train.py:153-170;
EMA `mmdet/core/hook/ema.py`; NaN guard `mmdet/core/hook/checkloss_hook.py`;
TextLoggerHook with per-loss log_vars). Here anything touching device state
(EMA) is folded INTO the compiled train step (train/loop.py); the host-side
hooks below consume the step's logs dict.
"""
from __future__ import annotations

import datetime
import json
import math
import os.path as osp
import time
from typing import Any, Dict, Optional


def ema_update(ema_params: Any, params: Any, momentum: float) -> Any:
    """ExponentialMovingAverageHook semantics (reference ema.py):
    ema = (1 - momentum) * ema + momentum * param, momentum ~ 0.0002.
    Pure function — call inside the jitted train step."""
    import jax
    return jax.tree.map(
        lambda e, p: e * (1.0 - momentum) + p * momentum, ema_params, params)


class CheckInvalidLoss:
    """Abort (or warn) on non-finite loss every `interval` iterations
    (reference CheckInvalidLossHook)."""

    def __init__(self, interval: int = 50, raise_on_nan: bool = True):
        self.interval = interval
        self.raise_on_nan = raise_on_nan

    def after_iter(self, step: int, logs: Dict[str, Any]):
        if step % self.interval:
            return
        loss = float(logs['loss'])
        if not math.isfinite(loss):
            msg = f'loss became non-finite ({loss}) at iter {step}'
            if self.raise_on_nan:
                raise FloatingPointError(msg)
            print('WARNING:', msg)


class TextLogger:
    """mmcv TextLoggerHook-style console + jsonl logging:
    Iter [i/max], lr, eta, time, data_time, per-loss values."""

    def __init__(self, work_dir: Optional[str], max_iters: int,
                 interval: int = 50):
        self.max_iters = max_iters
        self.interval = interval
        self.path = (osp.join(work_dir, 'train_log.jsonl')
                     if work_dir else None)
        self._t0 = time.time()
        self._start_step = None

    def after_iter(self, step: int, logs: Dict[str, Any], lr: float,
                   timer=None):
        if self._start_step is None:
            self._start_step = step - 1
            self._t0 = time.time()
        if step % self.interval and step != self.max_iters:
            return
        done = step - self._start_step
        per_iter = (time.time() - self._t0) / max(done, 1)
        eta = datetime.timedelta(
            seconds=int(per_iter * (self.max_iters - step)))
        scalars = {k: round(float(v), 4) for k, v in logs.items()}
        line = dict(step=step, lr=round(float(lr), 6),
                    sec_per_iter=round(per_iter, 3), **scalars)
        if timer is not None:
            line['time'] = round(timer.time, 3)
            line['data_time'] = round(timer.data_time, 3)
        parts = ', '.join(f'{k}: {v}' for k, v in scalars.items())
        print(f'Iter [{step}/{self.max_iters}] lr: {lr:.2e}, '
              f'eta: {eta}, {parts}')
        if self.path:
            with open(self.path, 'a') as f:
                f.write(json.dumps(line) + '\n')
