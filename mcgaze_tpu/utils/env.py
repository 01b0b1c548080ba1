"""Process environment setup (reference mmdet/utils/setup_env.py analogue:
it capped cv2/OMP/MKL threads and set the fork start-method; here the
TPU-relevant bits).

`setup_jax_platform` works around the experimental 'axon' TPU plugin in
this image IGNORING the `JAX_PLATFORMS` env var: only
`jax.config.update('jax_platforms', ...)` is authoritative. Every CLI tool
calls this before touching jax so `JAX_PLATFORMS=cpu python tools/...`
behaves as documented (and tests can force the virtual CPU mesh)."""
from __future__ import annotations

import os


def host_compile_cache_key() -> str:
    """Short stable key for this host's CPU feature set.

    XLA:CPU AOT cache entries embed the compile machine's target features;
    loading one on a host missing a compiled ISA feature is undefined
    (cpu_aot_loader warns 'could lead to execution errors such as SIGILL').
    The persistent compile-cache dirs this repo picks are therefore keyed
    by machine arch + /proc/cpuinfo flags, so a cache written on one
    machine type is never offered to another."""
    import hashlib
    import platform

    feats = ''
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if line.startswith(('flags', 'Features')):
                    feats = ' '.join(sorted(line.split(':', 1)[1].split()))
                    break
    except OSError:
        pass
    blob = f'{platform.machine()}|{feats}'
    return hashlib.sha1(blob.encode()).hexdigest()[:10]


def host_cache_dir(base: str | None = None,
                   platform: str | None = None) -> str:
    """Default persistent compile-cache dir.

    Host-CPU-keyed ONLY for the CPU platform: XLA:CPU AOT entries embed
    the compile machine's ISA features (the SIGILL hazard above), but
    TPU executables are independent of the host CPU — keying those by
    host would orphan every cached multi-minute model compile whenever
    the tunnel lands on a different frontend machine. `platform` is the
    configured JAX platform string ('' / None = plugin default = TPU
    here)."""
    base = base or os.path.expanduser('~/.cache/mcgaze_tpu/jax')
    if platform and 'cpu' in platform:
        return os.path.join(base, f'host-{host_compile_cache_key()}')
    return base


def setup_jax_platform() -> None:
    """Apply JAX_PLATFORMS from the environment authoritatively. Must run
    before any jax device/backend access, so call it at the top of a CLI
    main() — NEVER at library import time (importing a tool module must not
    re-platform the host process, e.g. pytest's virtual CPU mesh).

    Also points the persistent XLA compilation cache at a per-user,
    per-host-type dir (override with JAX_COMPILATION_CACHE_DIR, disable
    with MCGAZE_NO_COMPILE_CACHE=1): repeat CLI invocations then skip the
    multi-minute model compiles entirely."""
    platforms = os.environ.get('JAX_PLATFORMS')
    if platforms:
        import jax
        if jax.config.jax_platforms != platforms:
            try:
                jax.config.update('jax_platforms', platforms)
            except RuntimeError:
                pass  # backend already initialised; keep active platform
    if not os.environ.get('MCGAZE_NO_COMPILE_CACHE'):
        cache = os.environ.get('JAX_COMPILATION_CACHE_DIR')
        if not cache:
            # key the cache dir on the RESOLVED backend, not the env var:
            # with JAX_PLATFORMS unset and no TPU plugin, jax silently
            # falls back to CPU, and XLA:CPU AOT entries in a non-host-
            # keyed dir are the cross-machine SIGILL hazard (advisor
            # round-4). default_backend() initialises the backend — fine
            # here, the CLI is about to use it anyway, and the cache-dir
            # config only needs to precede the first COMPILE.
            import jax
            cache = host_cache_dir(platform=jax.default_backend())
        try:
            os.makedirs(cache, exist_ok=True)
            import jax
            jax.config.update('jax_compilation_cache_dir', cache)
        except OSError:
            pass                       # unwritable cache dir: just skip


def setup_threads(num_threads: int | None = None) -> None:
    """Cap BLAS/cv2 thread pools for multi-process hosts (reference
    setup_env.py:10-55). No-op if libraries are absent."""
    if num_threads is None:
        return
    os.environ.setdefault('OMP_NUM_THREADS', str(num_threads))
    os.environ.setdefault('MKL_NUM_THREADS', str(num_threads))
    try:
        import cv2
        cv2.setNumThreads(num_threads)
    except ImportError:
        pass
