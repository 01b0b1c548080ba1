"""Async batch prefetcher: stream identity, error propagation, put_fn."""
import time

import numpy as np
import pytest

from mcgaze_tpu.data.prefetch import BatchPrefetcher


def test_prefetcher_preserves_stream():
    batches = [dict(x=np.full((2,), i)) for i in range(7)]
    out = list(BatchPrefetcher(iter(batches), prefetch=3))
    assert len(out) == 7
    for i, b in enumerate(out):
        np.testing.assert_array_equal(b['x'], i)


def test_prefetcher_applies_put_fn_in_worker():
    seen_threads = set()

    def put(b):
        import threading
        seen_threads.add(threading.current_thread().name)
        return {k: v + 1 for k, v in b.items()}

    out = list(BatchPrefetcher(iter([dict(x=np.zeros(1))] * 3), put))
    assert all(b['x'][0] == 1 for b in out)
    assert seen_threads == {'batch-prefetch'}


def test_prefetcher_propagates_producer_error():
    def gen():
        yield dict(x=np.zeros(1))
        raise RuntimeError('decode failed')

    it = BatchPrefetcher(gen())
    next(it)
    with pytest.raises(RuntimeError, match='decode failed'):
        next(it)


def test_prefetcher_runs_ahead():
    """Producer fills the queue while the consumer sleeps."""
    produced = []

    def gen():
        for i in range(3):
            produced.append(i)
            yield dict(x=np.asarray([i]))

    it = BatchPrefetcher(gen(), prefetch=2)
    time.sleep(0.2)
    assert len(produced) >= 2          # ran ahead without any next() call
    assert [int(b['x'][0]) for b in it] == [0, 1, 2]


def test_prefetcher_exhaustion_is_sticky():
    """next() after StopIteration must raise StopIteration again, not
    block (review finding: iterator protocol violation)."""
    it = BatchPrefetcher(iter([dict(x=np.zeros(1))]))
    assert len(list(it)) == 1
    with pytest.raises(StopIteration):
        next(it)
    with pytest.raises(StopIteration):     # and again
        next(it)


def test_prefetcher_close_joins_producer():
    """close() on a full prefetch=1 queue must not leak a blocked
    producer thread (review finding: sentinel-put race)."""
    def gen():
        for i in range(100):
            yield dict(x=np.asarray([i]))

    it = BatchPrefetcher(gen(), prefetch=1)
    next(it)                               # producer now blocked on put
    time.sleep(0.05)
    it.close()
    assert not it._thread.is_alive()
    with pytest.raises(StopIteration):
        next(it)


def test_put_fn_runs_once_per_batch_when_consumer_stalls():
    """Regression: the interruptible-put retry loop must not re-run
    put_fn on every queue-Full retry — with jax.device_put as put_fn
    that leaked a fresh device batch ~10x/s while the consumer sat in
    the first train-step compile (observed as a 130 GB OOM on the
    1-core bench host)."""
    import itertools
    import threading
    import time

    from mcgaze_tpu.data.prefetch import BatchPrefetcher

    calls = []
    started = threading.Event()

    def put_fn(batch):
        calls.append(batch['i'])
        started.set()
        return batch

    pf = BatchPrefetcher(({'i': i} for i in itertools.count()),
                         put_fn, prefetch=2)
    try:
        assert started.wait(5.0)
        # consumer stalls: queue fills (2) + one batch held in the
        # producer's put-retry loop. Give the old bug ~15 retry windows.
        time.sleep(1.5)
        assert next(pf)['i'] == 0
        time.sleep(0.5)
        # <= 4 distinct put_fn runs (2 queued + 1 in retry + 1 refill
        # after the consume); the buggy version logged dozens of
        # duplicates of batch 2 here
        assert calls == sorted(set(calls)), calls   # no duplicates at all
        assert len(calls) <= 4, calls
    finally:
        pf.close()
