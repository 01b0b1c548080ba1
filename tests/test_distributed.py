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


def test_init_distributed_env_parsing(monkeypatch):
    """init_distributed must decide from env alone (no backend-touching
    jax call first) and forward the documented variables as args."""
    import mcgaze_tpu.parallel.distributed as D2
    calls = {}

    def fake_init(addr, n, pid):
        calls['args'] = (addr, n, pid)

    import jax
    monkeypatch.setattr(jax.distributed, 'initialize', fake_init)
    monkeypatch.setattr(D2, '_initialized', False)
    monkeypatch.setenv('COORDINATOR_ADDRESS', 'host0:8476')
    monkeypatch.setenv('NUM_PROCESSES', '4')
    monkeypatch.setenv('PROCESS_ID', '2')
    D2.init_distributed()
    assert calls['args'] == ('host0:8476', 4, 2)
    # second call is a no-op
    calls.clear()
    D2.init_distributed()
    assert not calls
    monkeypatch.setattr(D2, '_initialized', False)


def test_init_distributed_noop_without_coordinator(monkeypatch):
    import mcgaze_tpu.parallel.distributed as D2
    monkeypatch.delenv('COORDINATOR_ADDRESS', raising=False)
    monkeypatch.delenv('JAX_COORDINATOR_ADDRESS', raising=False)
    monkeypatch.setattr(D2, '_initialized', False)
    D2.init_distributed()          # must not raise or touch the backend
    assert D2._initialized is False
