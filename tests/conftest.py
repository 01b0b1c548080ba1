"""Test env: 8-device virtual CPU mesh + deterministic fp32 matmuls.

Notes (learned the hard way, see .claude/skills/verify/SKILL.md):
  * The 'axon' TPU plugin in this image overrides the JAX_PLATFORMS env
    var; `jax.config.update('jax_platforms', 'cpu')` is authoritative.
  * TPU/defaults use bf16 matmul precision; goldens vs torch need
    'highest'.
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')
