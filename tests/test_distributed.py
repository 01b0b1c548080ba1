"""Multi-host utility semantics (single-process fallbacks + sharding math).
True multi-process gathers can't run in one pytest process; the
rank-strided interleave restore is tested directly."""
import numpy as np

from mcgaze_tpu.parallel import distributed as D


def test_single_process_fallbacks():
    assert D.process_count() >= 1
    assert D.sync_random_seed(42) == 42
    assert isinstance(D.sync_random_seed(None), int)
    items = list(range(10))
    assert D.shard_across_processes(items) == items  # 1 process -> all
    assert D.gather_objects([1, 2, 3]) == [1, 2, 3]
    D.assert_same_structure({'a': np.zeros(3)})      # no-op, no raise
    D.init_distributed()                             # no coordinator -> noop


def test_strided_shard_round_trips():
    """shard_across_processes + gather_objects' interleave restore are
    inverse operations for any (n_items, n_procs)."""
    for n_items, n_procs in [(10, 3), (7, 2), (5, 5), (4, 8)]:
        items = list(range(n_items))
        shards = [items[p::n_procs] for p in range(n_procs)]
        # replicate gather_objects' restore loop
        out = []
        iters = [iter(x) for x in shards]
        for i in range(n_items):
            out.append(next(iters[i % n_procs]))
        assert out == items, (n_items, n_procs)


def test_structure_fingerprint_sensitivity():
    a = {'x': np.zeros((2, 3), np.float32)}
    b = {'x': np.zeros((2, 3), np.float32)}
    c = {'x': np.zeros((3, 2), np.float32)}
    d = {'y': np.zeros((2, 3), np.float32)}
    fp = D.tree_structure_fingerprint
    assert fp(a) == fp(b)
    assert fp(a) != fp(c)
    assert fp(a) != fp(d)
