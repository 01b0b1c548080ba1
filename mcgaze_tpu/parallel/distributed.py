"""Multi-host utilities over ICI/DCN.

TPU-native replacements for the reference's torch.distributed machinery
(§2.3 of SURVEY.md):

  * init_distributed        <- init_dist / torch.distributed.launch
                               (tools/train.py, tools/dist_train.sh)
  * sync_random_seed        <- NCCL seed broadcast (apis/train.py:36-49,
                               mmdet/core/utils/dist_utils.py:157)
  * shard_across_processes  <- rank-sharded eval sampler
                               (apis/test.py:81-135 multi_gpu_test)
  * gather_objects          <- collect_results_cpu tmpdir-pickle gather
                               (apis/test.py:136-178); here a two-phase
                               pickled-bytes allgather over the ICI
                               (size exchange, then exact-size payload)
  * assert_same_structure   <- the DDP loss-key consistency check
                               (detectors/base.py:202-209)

Every function degrades to a no-op in a single-process run, so the same
driver scripts work on one chip and on a multi-host slice.
"""
from __future__ import annotations

import hashlib
import pickle
from typing import Any, List, Sequence

import numpy as np


def process_count() -> int:
    import jax
    return jax.process_count()


def process_index() -> int:
    import jax
    return jax.process_index()


_initialized = False


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """jax.distributed.initialize with env-var fallback; safe to call in
    single-process runs (no-op when no coordinator is configured).

    MUST run before any other jax API touches the backend (including
    jax.process_count() — querying it would initialise the local backend
    and make distributed init impossible), so this function decides
    whether to initialise from the ENVIRONMENT alone:
      COORDINATOR_ADDRESS / JAX_COORDINATOR_ADDRESS  -> coordinator
      NUM_PROCESSES / JAX_NUM_PROCESSES              -> world size
      PROCESS_ID / JAX_PROCESS_ID                    -> this process
      MCGAZE_DIST_AUTODETECT=1  -> no-arg jax.distributed.initialize()
                                   (managed TPU pod cluster autodetection;
                                   explicit opt-in because it raises on
                                   non-cluster machines)."""
    import os

    global _initialized
    if _initialized:
        return

    def env(*names):
        for n in names:
            if os.environ.get(n):
                return os.environ[n]
        return None

    coordinator_address = coordinator_address or env(
        'COORDINATOR_ADDRESS', 'JAX_COORDINATOR_ADDRESS')
    if coordinator_address is None:
        # Managed-pod cluster autodetection (no-arg initialize) must be
        # requested explicitly: running it on a dev box raises/hangs, so
        # "unset" must keep meaning "single-process".
        if env('MCGAZE_DIST_AUTODETECT'):
            import jax
            jax.distributed.initialize()
            _initialized = True
        return                                    # single-process run
    if num_processes is None and env('NUM_PROCESSES', 'JAX_NUM_PROCESSES'):
        num_processes = int(env('NUM_PROCESSES', 'JAX_NUM_PROCESSES'))
    if process_id is None and env('PROCESS_ID', 'JAX_PROCESS_ID'):
        process_id = int(env('PROCESS_ID', 'JAX_PROCESS_ID'))

    import jax
    try:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
    except RuntimeError as e:                     # already initialised
        if 'already' not in str(e):
            raise
    _initialized = True


def sync_random_seed(seed: int | None = None) -> int:
    """All processes return process 0's seed (reference sync_random_seed:
    rank-0 random seed broadcast over NCCL)."""
    import jax
    if seed is None:
        seed = int(np.random.randint(2 ** 31))
    if process_count() == 1:
        return seed
    from jax.experimental import multihost_utils
    return int(multihost_utils.broadcast_one_to_all(
        np.asarray(seed, np.int32)))


def barrier(name: str, timeout_s: int = 1800) -> None:
    """Align all processes on the coordination service (no device
    collectives). Needed before the FIRST execution of a compiled
    multi-process step: on CPU backends the first cross-process
    collective creates a Gloo context whose key-value rendezvous has a
    hard ~30 s timeout, so processes whose compile times diverge (cache
    miss on one, hit on another; contended cores) must re-align between
    compile and execute. The coordination-service barrier tolerates
    arbitrary skew up to timeout_s. No-op in single-process runs."""
    if process_count() == 1:
        return
    try:
        from jax._src import distributed as _dist
        _dist.global_state.client.wait_at_barrier(name, timeout_s * 1000)
    except (ImportError, AttributeError):
        # private-API fallback for future jax versions: the public sync
        # runs a tiny collective — its sub-second compile keeps process
        # skew inside the Gloo rendezvous window, which is all we need
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def shard_across_processes(items: Sequence[Any]) -> List[Any]:
    """This process's strided slice of a global work list (reference
    multi_gpu_test's rank-strided DistributedSampler)."""
    return list(items[process_index()::process_count()])


def gather_objects(local: List[Any]) -> List[Any]:
    """Allgather arbitrary picklable per-process lists; returns the global
    list ordered by process, interleave-restored to match
    shard_across_processes (rank-strided) order.

    Two-phase, no size cap (the reference's collect_results_cpu tmpdir
    gather is similarly unbounded, apis/test.py:136-209): an 8-byte size
    allgather first, then one payload allgather padded only to the
    LARGEST process's pickle — a full Gaze360 result list (per-frame
    boxes+gazes for every video on one rank) can exceed any fixed cap."""
    if process_count() == 1:
        return list(local)
    from jax.experimental import multihost_utils
    payload = np.frombuffer(pickle.dumps(local), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.asarray([payload.size], np.int64))           # (P, 1)
    buf = np.zeros((int(sizes.max()),), np.uint8)
    buf[:payload.size] = payload
    gathered = multihost_utils.process_allgather(buf)   # (P, max(sizes))
    per_proc = []
    for p in range(gathered.shape[0]):
        size = int(sizes[p, 0])
        per_proc.append(pickle.loads(gathered[p, :size].tobytes()))
    # restore global order for rank-strided sharding
    out = []
    n_total = sum(len(x) for x in per_proc)
    iters = [iter(x) for x in per_proc]
    for i in range(n_total):
        out.append(next(iters[i % len(iters)]))
    return out


def tree_structure_fingerprint(tree: Any) -> str:
    """Stable hash of a pytree's structure + leaf shapes/dtypes."""
    import jax
    parts = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        shape = getattr(leaf, 'shape', ())
        dtype = getattr(leaf, 'dtype', type(leaf).__name__)
        parts.append(f'{jax.tree_util.keystr(path)}:{shape}:{dtype}')
    return hashlib.sha256('|'.join(parts).encode()).hexdigest()


def assert_same_structure(tree: Any, name: str = 'tree') -> None:
    """Every process must hold an identically-structured pytree — the
    compile-time analogue of the reference's per-iteration DDP loss-key
    allreduce assertion (base.py:202-209)."""
    if process_count() == 1:
        return
    from jax.experimental import multihost_utils
    fp = tree_structure_fingerprint(tree)
    digest = np.frombuffer(bytes.fromhex(fp[:16]), np.uint8).copy()
    all_fp = multihost_utils.process_allgather(digest)
    if not (all_fp == all_fp[0]).all():
        raise AssertionError(
            f'{name} structure differs across processes '
            f'(process {process_index()} fingerprint {fp[:16]})')
