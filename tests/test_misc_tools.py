"""Small tooling: package API surface, checkpoint pruning, log analyzer."""
import json
import subprocess
import sys

import numpy as np


def test_package_public_api():
    import mcgaze_tpu as m
    assert m.__version__
    assert m.ModelConfig().clip_length == 7
    assert callable(m.load_config) and callable(m.gaze_error)


def test_checkpoint_max_to_keep(tmp_path):
    from mcgaze_tpu.utils.checkpoint import (find_latest_checkpoint,
                                             restore_checkpoint,
                                             save_checkpoint)
    tree = {'w': np.arange(4, dtype=np.float32)}
    for step in (1, 2, 3):
        save_checkpoint(str(tmp_path), step, tree, max_to_keep=2)
    names = sorted(p.name for p in tmp_path.iterdir())
    assert names == ['ckpt_2', 'ckpt_3']
    latest = find_latest_checkpoint(str(tmp_path))
    assert latest.endswith('ckpt_3')
    out = restore_checkpoint(latest, {'w': np.zeros(4, np.float32)})
    np.testing.assert_array_equal(out['w'], tree['w'])


def test_analyze_logs_cli(tmp_path):
    log = tmp_path / 'train_log.jsonl'
    rows = [dict(step=i, loss=1.0 / i, grad_norm=0.1, time=0.5,
                 data_time=0.05, sec_per_iter=0.55, lr=1e-3)
            for i in range(1, 6)]
    log.write_text('\n'.join(json.dumps(r) for r in rows))
    r = subprocess.run(
        [sys.executable, 'tools/analysis_tools/analyze_logs.py',
         'cal_train_time', str(log)], capture_output=True, text=True,
        cwd='/root/repo')
    assert r.returncode == 0 and 'avg iter time' in r.stdout
    r = subprocess.run(
        [sys.executable, 'tools/analysis_tools/analyze_logs.py',
         'plot_curve', str(log), '--keys', 'loss'],
        capture_output=True, text=True, cwd='/root/repo')
    assert r.returncode == 0 and 'last=0.2' in r.stdout


def test_collect_env_reports_core_fields():
    from mcgaze_tpu.utils.collect_env import collect_env
    info = collect_env()
    assert 'jax' in info and info['jax'] != 'not installed'
    assert 'devices' in info and 'native_loader' in info


def test_checkpoint_split_and_prune(tmp_path):
    """ckpt_N holds the model; ckpt_N_train the optimizer extras; pruning
    removes both; eval-style targetless restore of ckpt_N sees ONLY the
    model tree (review finding: eval was reading AdamW moments)."""
    from mcgaze_tpu.utils.checkpoint import (find_latest_checkpoint,
                                             restore_checkpoint,
                                             save_checkpoint)
    model = {'params': {'w': np.ones(2, np.float32)}}
    train = {'step': np.zeros((), np.int32)}
    for step in (1, 2, 3):
        save_checkpoint(str(tmp_path), step, model, max_to_keep=2,
                        train_tree=train)
    names = sorted(p.name for p in tmp_path.iterdir())
    assert names == ['ckpt_2', 'ckpt_2_train', 'ckpt_3', 'ckpt_3_train']
    assert find_latest_checkpoint(str(tmp_path)).endswith('ckpt_3')
    restored = restore_checkpoint(str(tmp_path / 'ckpt_3'))
    assert set(restored) == {'params'}          # no optimizer payload
