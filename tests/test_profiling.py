"""Profiling utilities: timer semantics and XLA cost analysis
(reference mmdet/utils/profiling.py, mmcv flops counter analogues)."""
import jax.numpy as jnp

from mcgaze_tpu.utils.profiling import IterTimer, cost_analysis, profile_time


def test_profile_time_records_elapsed(capsys):
    with profile_time('blk', log=True) as box:
        _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert box['elapsed'] > 0
    assert 'blk:' in capsys.readouterr().out


def test_cost_analysis_matmul_flops():
    def f(a, b):
        return a @ b

    a = jnp.ones((128, 128), jnp.float32)
    ca = cost_analysis(f, a, a)
    # 2*M*N*K = 4.19 MFLOPs; XLA reports the fused program's count
    assert ca.get('flops', 0) >= 2 * 128 ** 3 * 0.9


def test_iter_timer_accounting():
    timer = IterTimer()
    timer.before_iter()
    timer.after_iter()
    assert timer.time >= 0
    timer.before_iter()
    assert timer.data_time >= 0
