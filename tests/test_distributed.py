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


def test_opt_state_shardings_longest_suffix_wins():
    """A param whose full path is a path-suffix of another param's must
    not capture the other's moments (review finding: first-match
    endswith picked whichever came first in flatten order)."""
    import re

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from mcgaze_tpu.parallel import mesh as M

    orig = M._TP_RULES
    try:
        M._TP_RULES = ((re.compile(r'^a/k$'), P(None, 'model')),)
        msh = M.make_mesh(n_data=1, n_model=1)
        params = {'a': {'k': jnp.zeros((2, 2))},
                  'b': {'a': {'k': jnp.zeros((2, 2))}}}
        sh = M.opt_state_shardings(msh, {'mu': params}, params)
        assert sh['mu']['a']['k'].spec == P(None, 'model')
        assert sh['mu']['b']['a']['k'].spec == P()
    finally:
        M._TP_RULES = orig


def test_opt_state_shardings_follow_tp_params():
    """Every AdamW moment of a TP-ruled param gets that param's sharding;
    scalar counts stay replicated (the AOT multi-process consistency
    requirement, mesh.py docstring)."""
    import jax
    import optax
    from jax.sharding import PartitionSpec as P

    from mcgaze_tpu.parallel.mesh import (_TP_RULES, make_mesh,
                                          opt_state_shardings)

    mesh = make_mesh(n_data=1, n_model=1)
    params = {'bbox_head_0': {'ffn_fc1': {'kernel': jax.numpy.zeros((4, 4)),
                                          'bias': jax.numpy.zeros((4,))},
                              'other': {'kernel': jax.numpy.zeros((4, 4))}}}
    opt = optax.adamw(1e-3).init(params)
    sh = opt_state_shardings(mesh, opt, params)
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    for path, leaf in flat:
        ks = jax.tree_util.keystr(path)
        if ks.endswith("['ffn_fc1']['kernel']"):
            assert leaf.spec == P(None, 'model'), ks
        elif ks.endswith("['ffn_fc1']['bias']"):
            assert leaf.spec == P('model'), ks
        else:
            assert leaf.spec == P(), ks
