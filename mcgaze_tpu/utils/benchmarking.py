"""Shared device-throughput timing harness.

`serial_chain_time` times fn as a strict serial chain of device
executions with ONE host readback at the end: fn(eps) must fold a tiny
f32 scalar derived from its outputs back into its inputs, so consecutive
iterations form a data-dependent chain. On this dev image the TPU sits
behind a ~27 ms RTT tunnel and `block_until_ready` returns before
execution finishes, so per-step readbacks measure the tunnel, not the
chip; chaining measures true sustained device throughput (the number
that matters for pipelined serving). Used by bench.py and every
tools/analysis_tools/*_bench script.
"""
from __future__ import annotations

import time
from typing import Callable


def serial_chain_time(fn: Callable, iters: int = 20,
                      warmup: int = 3, repeats: int = 1) -> float:
    """Seconds per iteration of fn, serial-chained via its eps scalar.

    fn(eps: f32 scalar jax array) -> f32 scalar jax array.

    repeats > 1 runs the whole timed chain that many times and returns
    the FASTEST chain (standard throughput-benchmark practice: the
    minimum is the least-noise estimate of the device's sustained rate;
    this shared bench host shows ±5% run-to-run variance from unrelated
    load on the tunnel).
    """
    import jax.numpy as jnp

    eps = jnp.float32(0.0)
    for _ in range(warmup):
        eps = fn(eps)
    float(eps)                                 # sync warmup
    best = float('inf')
    for _ in range(max(repeats, 1)):
        start = time.perf_counter()
        eps = jnp.float32(0.0)
        for _ in range(iters):
            eps = fn(eps)
        float(eps)                             # single completion barrier
        best = min(best, (time.perf_counter() - start) / iters)
    return best
