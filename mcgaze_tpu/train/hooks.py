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
            # console output is rank-0-only, like TextLogger (the loss is
            # global under the jit, so every rank would print the same line)
            import jax
            if jax.process_index() == 0:
                print('WARNING:', msg)


def _host_local_leaf(x):
    """A live training param leaf -> a single-local-device array the
    (unsharded) eval jit can consume. Replicated leaves read their local
    replica; TP-sharded leaves (FFN/DynamicConv under the model axis) are
    resharded to replicated via jax.device_put (the runtime's resharding
    transfer — no per-leaf jit trace/compile; every process executes it
    together, since all processes validate at the same iter)."""
    import jax
    if not isinstance(x, jax.Array):
        return x
    if not x.is_fully_replicated:
        from jax.sharding import NamedSharding, PartitionSpec
        x = jax.device_put(
            x, NamedSharding(x.sharding.mesh, PartitionSpec()))
    return x.addressable_data(0)


class ValidationHook:
    """EvalHook analogue: run the video eval driver on the val set every
    `interval` iterations with the LIVE training params and log MAE.

    The reference carries this machinery but ships it disabled
    (tools/train.py:36-38 `--no-validate` defaults True; EvalHook registered
    in apis/train.py:173-186 only when validate=True) — same here: built
    only when tools/train.py is given --validate.

    Multi-process: the video list is rank-sharded, per-rank results are
    gathered (reference multi_gpu_test + EvalHook flow), and rank 0
    scores + logs; every rank participates in evaluate() each interval
    (the TP reshard and the gather are collectives).
    """

    def __init__(self, cfg, json_path: str, img_root: str,
                 interval: int = 1000, max_videos: int = 0,
                 l2cs: bool = False, work_dir: Optional[str] = None):
        from ..evaluation.driver import VideoGazeEvaluator
        from ..evaluation.forward import bind_forward, make_eval_forward
        from ..parallel.distributed import (process_index,
                                            shard_across_processes)

        self.interval = interval
        self.l2cs = l2cs
        self.rank0 = process_index() == 0
        self.path = (osp.join(work_dir, 'val_log.jsonl')
                     if work_dir and self.rank0 else None)
        self.anno = json.load(open(json_path))
        videos = self.anno['videos']
        self.videos = videos[:max_videos] if max_videos else videos
        self.local_videos = shard_across_processes(self.videos)
        self.img_root = img_root
        _model, _vars, self._fwd, self._fwd_dedup = make_eval_forward(
            cfg.model, cfg.eval_cfg.canvas, init_variables=False)
        self._bind = bind_forward
        self._make_eval = lambda fn: VideoGazeEvaluator(fn, cfg.eval_cfg)

    def evaluate(self, variables) -> Optional[Dict[str, float]]:
        """Returns metrics on rank 0, None elsewhere."""
        import jax

        from ..evaluation.mae import evaluate_results
        from ..parallel.distributed import barrier, gather_objects

        variables = jax.tree.map(_host_local_leaf, variables)
        evaluator = self._make_eval(
            self._bind(self._fwd, variables, self._fwd_dedup))
        results = list(evaluator.run_videos_from_paths(
            (video['id'], [osp.join(self.img_root, n)
                           for n in video['file_names']])
            for video in self.local_videos))
        # re-align before the gather: per-process eval-forward compile
        # skew (cache miss on one rank) can exceed the Gloo rendezvous
        # window, same failure mode the train CLI barriers against
        self._round = getattr(self, '_round', 0) + 1
        barrier(f'validation_gather_{self._round}')
        results = gather_objects(results)
        if not self.rank0:
            return None
        return evaluate_results(results, self.anno, l2cs=self.l2cs)

    def after_iter(self, step: int, state) -> Optional[Dict[str, float]]:
        if step % self.interval:
            return None
        t0 = time.time()
        metrics = self.evaluate({'params': state.params,
                                 'stats': state.stats})
        if metrics is None:                     # non-zero rank
            return None
        dt = time.time() - t0
        parts = ', '.join(f'{k}: {v:.4f}' for k, v in metrics.items())
        print(f'Validation [iter {step}] ({len(self.videos)} videos, '
              f'{dt:.1f}s): {parts}')
        if self.path:
            with open(self.path, 'a') as f:
                f.write(json.dumps(dict(step=step, **{
                    k: round(float(v), 4) for k, v in metrics.items()}))
                    + '\n')
        return metrics


class TextLogger:
    """mmcv TextLoggerHook-style console + jsonl logging:
    Iter [i/max], lr, eta, time, data_time, per-loss values."""

    def __init__(self, work_dir: Optional[str], max_iters: int,
                 interval: int = 50, quiet: bool = False):
        self.max_iters = max_iters
        self.interval = interval
        self.quiet = quiet                    # non-zero ranks: no console
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
        if not self.quiet:
            print(f'Iter [{step}/{self.max_iters}] lr: {lr:.2e}, '
                  f'eta: {eta}, {parts}')
        if self.path:
            with open(self.path, 'a') as f:
                f.write(json.dumps(line) + '\n')
