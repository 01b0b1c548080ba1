"""Shared pipelined-eval loop for the video drivers.

One structure, two users (evaluation/driver.py for the gaze path,
evaluation/instblink_driver.py for the query family): a background
thread produces decoded+device-committed videos ahead of consumption
(data/prefetch.py::BatchPrefetcher), submit() dispatches a whole
video's device work asynchronously, and up to `depth` videos stay in
flight before finish() forces the oldest one's readback — so with N
local devices, N videos compute concurrently and results still yield
in input order (the single-process analogue of the reference's
one-process-per-GPU eval, apis/test.py:81-135)."""
from __future__ import annotations

from collections import deque
from typing import Callable, Iterable, Iterator


def run_pipelined(items: Iterable, produce: Callable, submit: Callable,
                  finish: Callable, prefetch: int = 4,
                  depth: int = 1) -> Iterator:
    """items: iterable of (key, payload_in); produce(i, key, payload_in)
    -> (key, decoded) runs in the prefetch thread; submit(decoded) ->
    pending dispatches async device work; finish(key, pending) -> result.
    Yields finish results in input order with up to `depth` videos in
    flight."""
    from ..data.prefetch import BatchPrefetcher

    decoded = BatchPrefetcher(
        (produce(i, key, payload) for i, (key, payload)
         in enumerate(items)),
        prefetch=max(prefetch, depth))
    try:
        inflight = deque()
        for key, payload in decoded:
            inflight.append((key, submit(key, payload)))
            if len(inflight) >= max(depth, 1):
                k, pending = inflight.popleft()
                yield finish(k, pending)
        while inflight:
            k, pending = inflight.popleft()
            yield finish(k, pending)
    finally:
        decoded.close()
