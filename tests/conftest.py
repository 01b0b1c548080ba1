"""Test env: 8-device virtual CPU mesh + deterministic fp32 matmuls.

Notes (learned the hard way, see .claude/skills/verify/SKILL.md):
  * The 'axon' TPU plugin in this image overrides the JAX_PLATFORMS env
    var; `jax.config.update('jax_platforms', 'cpu')` is authoritative.
  * TPU/defaults use bf16 matmul precision; goldens vs torch need
    'highest'.
"""
import os
import os.path as osp

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

# Persistent XLA compilation cache, shared by this process AND every
# CLI subprocess the tests spawn (they inherit the env var): the train
# CLI chain alone compiles the same train step 3x in fresh processes,
# and repeat `pytest` runs skip all big compiles entirely. Keyed per
# host CPU feature set (utils/env.py::host_compile_cache_key): the repo
# .cache travels between machine types, and XLA:CPU AOT entries from a
# different machine can SIGILL on load.
import sys  # noqa: E402

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
from mcgaze_tpu.utils.env import host_compile_cache_key  # noqa: E402

_CACHE = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                  '.cache', 'jax', f'host-{host_compile_cache_key()}')
os.makedirs(_CACHE, exist_ok=True)
# setdefault: an explicitly exported cache dir (user/CI) wins — the
# host-keyed repo dir is only the default (advisor round-4)
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', _CACHE)

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')
jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
