"""Async batch prefetcher: overlap host data work with device steps.

The reference overlaps via torch DataLoader worker processes
(mmdet/datasets/builder.py num_workers=8). Here a single background
thread runs the (already natively-parallel) batch iterator AND the
host->device transfer, keeping a small queue of device-resident batches
ahead of the train loop: while step N executes on the TPU, batch N+1 is
being decoded by the C++ thread pool and shipped to HBM.

At measured rates (train step 140 ms @ batch 32, native decode ~30 ms)
this hides essentially all input latency.
"""
from __future__ import annotations

import atexit
import queue
import threading
import time
import weakref
from typing import Any, Callable, Iterator, Optional


class BatchPrefetcher:
    """Wraps an iterator of host batches; yields device-placed batches.

    put_fn: e.g. functools.partial(jax.device_put, device=sharding) applied
    to each batch dict's values (or any callable batch -> device batch).
    Exceptions in the producer propagate to the consumer on next().
    """

    _SENTINEL = object()

    def __init__(self, batches: Iterator[dict],
                 put_fn: Optional[Callable[[dict], Any]] = None,
                 prefetch: int = 2):
        self._put = put_fn or (lambda b: b)
        self._q: queue.Queue = queue.Queue(maxsize=max(prefetch, 1))
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        self._done = False                          # sentinel consumed

        def worker():
            try:
                for batch in batches:
                    if self._stop.is_set():
                        return
                    # put_fn runs ONCE per batch, outside the retry loop:
                    # re-running jax.device_put on every 0.1s queue-Full
                    # retry leaked a fresh device batch per retry — ~10
                    # transfers/s whenever the consumer stalls (the first
                    # train-step compile stalls it for MINUTES), observed
                    # as a 130 GB host OOM on the bench host
                    value = self._put(batch)
                    while True:                     # interruptible put
                        try:
                            self._q.put(value, timeout=0.1)
                            break
                        except queue.Full:
                            if self._stop.is_set():
                                return
                    del value
            except BaseException as e:              # propagate to consumer
                self._err = e
            finally:
                # never block forever on the sentinel: a closed consumer
                # may have left the queue full
                while True:
                    try:
                        self._q.put_nowait(self._SENTINEL)
                        break
                    except queue.Full:
                        if self._stop.is_set():
                            break
                        time.sleep(0.01)

        self._thread = threading.Thread(target=worker, daemon=True,
                                        name='batch-prefetch')
        self._thread.start()
        # Join the producer before interpreter teardown even if the owner
        # never calls close(): a daemon thread killed inside device_put /
        # the native pool aborts the process with 'FATAL: exception not
        # rethrown' (pthread cancellation through noexcept frames).
        ref = weakref.ref(self)
        self._atexit = atexit.register(
            lambda: (lambda s: s and s.close(timeout=2.0))(ref()))

    def __iter__(self):
        return self

    def __next__(self):
        if self._done:                              # exhausted stays exhausted
            raise StopIteration
        item = self._q.get()
        if item is self._SENTINEL:
            self._done = True
            if self._err is not None:
                err, self._err = self._err, None
                raise err
            raise StopIteration
        return item

    def close(self, timeout: float = 5.0):
        """Stop the producer, release queued (device) batches, join.
        Idempotent; also runs via atexit if the owner forgets."""
        self._stop.set()
        self._done = True
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=timeout)
        atexit.unregister(self._atexit)


def device_put_batches(batches: Iterator[dict], sharding) -> BatchPrefetcher:
    """Prefetch + shard batches onto the mesh (train-loop entry).

    Multi-process runs (jax.process_count() > 1): each host's iterator
    yields its LOCAL rows (global_batch / process_count) and the global
    sharded array is assembled via jax.make_array_from_process_local_data
    — the pjit analogue of the reference's per-rank DistributedSampler
    batches feeding DDP (mmdet/datasets/builder.py + apis/train.py:113).
    """
    import jax

    multiprocess = jax.process_count() > 1

    def put(batch):
        if multiprocess:
            import numpy as np
            return {k: jax.make_array_from_process_local_data(
                        sharding, np.asarray(v))
                    for k, v in batch.items()}
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}

    return BatchPrefetcher(batches, put)
