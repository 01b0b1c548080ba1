"""Platform setup semantics: CLI modules must be import-safe (no platform
flip at import time — regression guard for the bug where importing
demo.gaze_demo re-platformed the pytest process from the 8-device CPU mesh
onto the tunnelled TPU) and setup_jax_platform honors JAX_PLATFORMS."""
import importlib
import os

import jax


def test_importing_cli_modules_keeps_platform():
    os.environ.setdefault('JAX_PLATFORMS', 'axon')   # as in the dev shell
    before = jax.config.jax_platforms
    for mod in ('demo.gaze_demo', 'demo.head_det', 'tools.test_gaze360_gaze',
                'tools.train', 'tools.test'):
        importlib.import_module(mod)
    assert jax.config.jax_platforms == before
    assert len(jax.devices()) == 8      # conftest's virtual CPU mesh intact


def test_setup_jax_platform_applies_env(monkeypatch):
    from mcgaze_tpu.utils.env import setup_jax_platform
    # same value -> no-op; different value after backend init -> swallowed
    monkeypatch.setenv('JAX_PLATFORMS', jax.config.jax_platforms or 'cpu')
    setup_jax_platform()
    jax.devices()                        # force backend init
    monkeypatch.setenv('JAX_PLATFORMS', 'cpu')
    setup_jax_platform()                 # must not raise
    assert len(jax.devices()) == 8


def test_setup_threads_noop():
    from mcgaze_tpu.utils.env import setup_threads
    setup_threads(None)
    setup_threads(2)


def test_host_compile_cache_key_stable_and_keyed():
    """CPU-platform cache dirs are host-feature-keyed (XLA:CPU AOT
    entries embed ISA features — SIGILL hazard across machine types);
    TPU dirs are NOT keyed (TPU executables are host-CPU-independent,
    and keying them orphans every cached multi-minute model compile
    whenever the tunnel frontend changes)."""
    from mcgaze_tpu.utils.env import host_cache_dir, host_compile_cache_key
    k1, k2 = host_compile_cache_key(), host_compile_cache_key()
    assert k1 == k2 and len(k1) == 10 and k1.isalnum()
    d = host_cache_dir('/some/base', platform='cpu')
    assert d == f'/some/base/host-{k1}'
    for tpu_platform in (None, '', 'axon', 'tpu'):
        assert host_cache_dir('/some/base', platform=tpu_platform) == \
            '/some/base'
    # conftest wired the pytest (CPU) cache through the same keying
    import os
    assert os.environ['JAX_COMPILATION_CACHE_DIR'].endswith(f'host-{k1}')
