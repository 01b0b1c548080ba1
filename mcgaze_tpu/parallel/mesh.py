"""Device mesh + sharding policy.

The reference scales with NCCL DDP (apis/train.py:113-124); here the whole
step is one jit over a (data, model) mesh:
  * 'data'  — batch dim of clips; gradients reduce over it via the psum XLA
    inserts for the global loss (replacing bucketed NCCL allreduce,
    mmdet/core/utils/dist_utils.py:15-57).
  * 'model' — tensor parallelism for the widest GEMMs (the 2048-wide FFN
    and the 49*C DynamicConv projection); params are sharded along their
    wide dim, XLA inserts the matching all-reduce on the contracting side.

Multi-host: call jax.distributed.initialize() before make_mesh; arrays are
addressed per-host via jax.make_array_from_process_local_data.
"""
from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Param path regexes -> PartitionSpec over ('data', 'model') mesh axes.
# Everything else is replicated.
_TP_RULES = (
    (re.compile(r'ffn_fc1/kernel$'), P(None, 'model')),
    (re.compile(r'ffn_fc1/bias$'), P('model')),
    (re.compile(r'ffn_fc2/kernel$'), P('model', None)),
    (re.compile(r'instance_interactive_conv/fc_layer/kernel$'),
     P('model', None)),
)


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ('data', 'model'))


def param_shardings(mesh: Mesh, params: Any):
    """NamedSharding tree for a param pytree (TP rules, else replicated)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec_for(path):
        name = '/'.join(
            p.key if hasattr(p, 'key') else str(p) for p in path)
        for rx, spec in _TP_RULES:
            if rx.search(name):
                return spec
        return P()

    specs = {jax.tree_util.keystr(p): spec_for(p) for p, _ in flat}

    def assign(path, x):
        return NamedSharding(mesh, specs[jax.tree_util.keystr(path)])

    return jax.tree_util.tree_map_with_path(assign, params)


def opt_state_shardings(mesh: Mesh, opt_state: Any, params: Any):
    """Sharding tree for an optax state: per-param moments (mu/nu — any
    leaf whose tree path ends with a param's full path) follow that
    param's TP sharding; scalar counts etc. are replicated.

    Required for AOT-compiled multi-process training with a model axis:
    the compiled step's OUTPUT moments follow the param shardings (XLA
    propagation), so feeding replicated moments back in trips the AOT
    input-sharding check at the second step (found by
    tests/test_multiprocess.py::test_train_cli_two_process_validation —
    single-process jit silently re-lowers instead)."""
    flat = jax.tree_util.tree_flatten_with_path(
        param_shardings(mesh, params))[0]
    # longest suffix first: if one param's full path is a proper
    # path-suffix of another's (params['a']['k'] vs params['b']['a']['k'])
    # the longer — exact — match must win
    by_suffix = sorted(((jax.tree_util.keystr(path), sh)
                        for path, sh in flat),
                       key=lambda t: -len(t[0]))

    def assign(path, leaf):
        ks = jax.tree_util.keystr(path)
        for suffix, sh in by_suffix:
            if ks.endswith(suffix):
                return sh
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, opt_state)


def batch_sharding(mesh: Mesh):
    """Shard the leading (batch-of-clips) dim over 'data'."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
