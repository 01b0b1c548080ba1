"""Profiling utilities — TPU equivalents of the reference's
`mmdet/utils/profiling.py:10-40` (CUDA-event timer context manager), the
mmcv flops counter wired into the eval driver
(`tools/test_gaze360_gaze.py:55,104,126`), and `IterTimerHook`.

  * profile_time: wall-clock context manager that blocks on device work
    (jax.block_until_ready) so timings mean what they say;
  * trace: context manager around jax.profiler for TensorBoard traces;
  * cost_analysis: compiled-HLO FLOPs/bytes from XLA's cost model — the
    analogue of mmcv's module-hook FLOPs counting, but exact for the
    program XLA actually runs (post-fusion).
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable


@contextlib.contextmanager
def profile_time(name: str, stream=None, end_stream=None, sync: Any = None,
                 log: bool = True):
    """Time a block; if `sync` holds jax arrays they are blocked on before
    stopping the clock. stream/end_stream accepted for reference-API
    compatibility and ignored (no CUDA streams on TPU)."""
    import jax
    t0 = time.perf_counter()
    box = {}
    try:
        yield box
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        elif 'sync' in box:
            jax.block_until_ready(box['sync'])
        dt = time.perf_counter() - t0
        box['elapsed'] = dt
        if log:
            print(f'{name}: {dt * 1e3:.2f} ms')


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace for TensorBoard / xprof."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn: Callable, *args) -> dict:
    """Lower+compile `fn(*args)` and return XLA's cost analysis:
    {'flops': ..., 'bytes accessed': ..., ...} for the fused program."""
    import jax
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):       # older jax returns [dict]
        ca = ca[0]
    return dict(ca) if ca else {}


class IterTimer:
    """Per-iteration time / data_time accounting (mmcv IterTimerHook
    semantics: data_time = gap between iterations, time = full iter)."""

    def __init__(self):
        self._last_end = None
        self._iter_start = None
        self.data_time = 0.0
        self.time = 0.0

    def before_iter(self):
        now = time.perf_counter()
        self.data_time = 0.0 if self._last_end is None else now - self._last_end
        self._iter_start = now

    def after_iter(self, sync: Any = None):
        if sync is not None:
            import jax
            jax.block_until_ready(sync)
        now = time.perf_counter()
        self.time = now - (self._iter_start or now)
        self._last_end = now
