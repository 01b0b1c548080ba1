"""CLI end-to-end smoke: train (synthetic) -> checkpoint -> eval driver ->
results JSON -> MAE scorer, all through the tools/ entry points as a user
would run them. Tiny shapes keep single-core CPU compiles tolerable."""
import json
import os
import os.path as osp
import subprocess
import sys
import textwrap

import pytest

from tests.test_data_and_driver import make_dataset

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

TINY_CFG = textwrap.dedent("""
    from mcgaze_tpu.data.dataset import DataConfig
    from mcgaze_tpu.evaluation.driver import EvalConfig
    from mcgaze_tpu.models.mcgaze import ModelConfig
    from mcgaze_tpu.train.loop import OptimConfig

    model = ModelConfig(clip_length=7, backbone_depth=26, num_stages=2,
                        stage_loss_weights=(1.0, 1.0), ffn_channels=256)
    optim = OptimConfig(max_iters=2, warmup_iters=1)
    data_train = DataConfig(ann_file={ann!r}, img_prefix={prefix!r},
                            scale=(32, 32), canvas=(32, 32),
                            crop_size=0.68, batch_size=1)
    data_test = data_train
    eval_cfg = EvalConfig(scale=(32, 32), canvas=(32, 32), crop_ratio=0.84,
                          clip_batch=2)
    checkpoint_interval = 2
    work_dir = {work_dir!r}
""")


def run(args, **kw):
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('XLA_FLAGS', None)
    return subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=900, **kw)


@pytest.fixture(scope='module')
def workspace(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('cli'))
    ann, prefix = make_dataset(root)
    cfg_path = osp.join(root, 'tiny_cfg.py')
    work_dir = osp.join(root, 'work')
    with open(cfg_path, 'w') as f:
        f.write(TINY_CFG.format(ann=ann, prefix=prefix, work_dir=work_dir))
    return dict(root=root, ann=ann, prefix=prefix, cfg=cfg_path,
                work_dir=work_dir)


@pytest.mark.slow
def test_train_eval_mae_cli(workspace):
    ws = workspace
    # 1) train 2 synthetic iters, save a checkpoint
    r = run(['tools/train.py', ws['cfg'], '--synthetic'])
    assert r.returncode == 0, r.stderr[-3000:]
    assert 'saved' in r.stdout
    import re
    ckpts = [d for d in os.listdir(ws['work_dir'])
             if re.fullmatch(r'ckpt_\d+', d)]
    assert ckpts, r.stdout
    # optimizer/step extras live next to the model checkpoint
    assert any(d.endswith('_train') for d in os.listdir(ws['work_dir']))

    # 1b) resume: full TrainState (opt_state + step) restores and training
    # continues from iter 2 (review finding: resume was structurally broken)
    r = run(['tools/train.py', ws['cfg'], '--synthetic', '--auto-resume',
             '--max-iters', '3'])
    assert r.returncode == 0, r.stderr[-3000:]
    assert 'resumed from' in r.stdout and 'at step 2' in r.stdout
    assert 'ckpt_3' in r.stdout

    # 2) train again on the REAL synthetic dataset for 1 iter (data path),
    # with in-training validation (reference EvalHook analogue)
    r = run(['tools/train.py', ws['cfg'], '--max-iters', '1',
             '--work-dir', osp.join(ws['root'], 'work2'),
             '--validate', '--val-interval', '1', '--val-max-videos', '1'])
    assert r.returncode == 0, r.stderr[-3000:]
    assert 'Validation [iter 1]' in r.stdout
    val_log = osp.join(ws['root'], 'work2', 'val_log.jsonl')
    val_line = json.loads(open(val_log).readline())
    assert val_line['step'] == 1 and 'MAE-Front180' in val_line

    # 3) eval from the checkpoint through the test tool
    ckpt = osp.join(ws['work_dir'], sorted(ckpts)[-1])
    r = run(['tools/test_gaze360_gaze.py', ws['cfg'], ckpt,
             '--json', ws['ann'], '--root', ws['prefix'],
             '--out-dir', osp.join(ws['root'], 'results')])
    assert r.returncode == 0, r.stderr[-3000:]
    res_files = os.listdir(osp.join(ws['root'], 'results'))
    assert len(res_files) == 1
    res_path = osp.join(ws['root'], 'results', res_files[0])
    results = json.load(open(res_path))
    assert len(results) == 2  # two synthetic videos
    assert len(results[0]['fusion_gazes']) == 12

    # 4) score with the MAE tool
    r = run(['tools/calculate_mae_gaze360.py', '--evalfile', res_path,
             '--anno', ws['ann']])
    assert r.returncode == 0, r.stderr[-3000:]
    assert 'mean angular front 90' in r.stdout

    # 5) generic tools/test.py entry with inline MAE (one-step flow)
    out_json = osp.join(ws['root'], 'test_entry_results.json')
    r = run(['tools/test.py', ws['cfg'], ckpt,
             '--json', ws['ann'], '--root', ws['prefix'],
             '--out', out_json, '--eval', 'mae'])
    assert r.returncode == 0, r.stderr[-3000:]
    assert 'MAE-Front180' in r.stdout
    inline = json.load(open(out_json))
    # same checkpoint + same driver -> identical fusion gazes as step 3
    assert inline[0]['fusion_gazes'] == results[0]['fusion_gazes']


@pytest.mark.slow
def test_ema_eval_cli(workspace):
    """--ema evaluates the EMA weights from <ckpt>_train (reference
    EMAHook eval-swap); missing EMA state errors with a clear message."""
    ws = workspace
    work = osp.join(ws['root'], 'work_ema')
    r = run(['tools/train.py', ws['cfg'], '--synthetic', '--max-iters',
             '2', '--work-dir', work, '--cfg-options',
             'optim.ema_momentum=0.3'])
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-2500:]
    ckpt = osp.join(work, 'ckpt_2')
    assert osp.isdir(ckpt) and osp.isdir(ckpt + '_train')

    out_a = osp.join(ws['root'], 'res_raw.json')
    out_b = osp.join(ws['root'], 'res_ema.json')
    for out, extra in ((out_a, []), (out_b, ['--ema'])):
        r = run(['tools/test.py', ws['cfg'], ckpt, '--json', ws['ann'],
                 '--root', ws['prefix'], '--out', out,
                 '--max-videos', '1'] + extra)
        assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-2500:]
    import numpy as np
    a = json.load(open(out_a))[0]['fusion_gazes']
    b = json.load(open(out_b))[0]['fusion_gazes']
    # 2 iters of momentum-0.3 EMA != live params
    assert not np.allclose(a, b)

    # checkpoint trained WITHOUT EMA -> clear error
    work2 = osp.join(ws['root'], 'work_noema')
    r = run(['tools/train.py', ws['cfg'], '--synthetic', '--max-iters',
             '2', '--work-dir', work2])
    assert r.returncode == 0, r.stderr[-2000:]
    r = run(['tools/test.py', ws['cfg'], osp.join(work2, 'ckpt_2'),
             '--json', ws['ann'], '--root', ws['prefix'],
             '--max-videos', '1', '--ema'])
    assert r.returncode != 0
    assert 'ema_params' in (r.stdout + r.stderr)


@pytest.mark.slow
def test_kitchen_sink_train_cli(workspace):
    """Every optional train-loop feature ON at once: EMA in-jit,
    in-training validation, profiler trace, checkpointing — then
    --auto-resume continues the same run (flag-combination bugs like the
    EMA double-donation hide where features meet)."""
    ws = workspace
    work = osp.join(ws['root'], 'work_sink')
    prof = osp.join(ws['root'], 'prof')
    args = ['tools/train.py', ws['cfg'], '--synthetic', '--work-dir',
            work, '--log-interval', '1',
            '--validate', '--val-interval', '2', '--val-json', ws['ann'],
            '--val-root', ws['prefix'], '--val-max-videos', '1',
            '--val-l2cs', '--profile-dir', prof,
            '--cfg-options', 'optim.ema_momentum=0.3']
    r = run(args + ['--max-iters', '2'])
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-3000:]
    assert 'Validation [iter 2]' in r.stdout, r.stdout[-2000:]
    assert osp.isdir(osp.join(work, 'ckpt_2_train'))

    # auto-resume picks up ckpt_2 (incl. EMA + optimizer state) and runs
    # to iter 8 with validation firing again; the profiler window opens
    # at resumed-step+3 = iter 5, so 8 iters also exercises the trace
    r = run(args + ['--max-iters', '8', '--auto-resume'])
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-3000:]
    assert 'resumed from' in r.stdout, r.stdout[-2000:]
    assert 'Validation [iter 4]' in r.stdout, r.stdout[-2000:]
    assert osp.isdir(osp.join(work, 'ckpt_4'))
    # profiler wrote a trace (iters 5.. window of the resumed run)
    assert osp.isdir(prof) and os.listdir(prof)
