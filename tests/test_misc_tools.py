"""Small tooling: package API surface, checkpoint pruning, log analyzer,
misc CLIs (print_config / browse_dataset / visualize_results)."""
import json
import os.path as osp
import subprocess
import sys

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


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


def test_print_config_cli(tmp_path):
    r = subprocess.run(
        [sys.executable, 'tools/misc/print_config.py',
         'configs/multiclue_gaze/multiclue_gaze_r50_gaze360.py',
         '--cfg-options', 'model.dtype=bfloat16'],
        cwd=REPO, capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert 'ModelConfig(' in r.stdout
    assert "dtype='bfloat16'" in r.stdout
    assert 'OptimConfig(' in r.stdout


def test_browse_dataset_cli(tmp_path):
    from tests.test_data_and_driver import make_dataset
    ann, prefix = make_dataset(str(tmp_path / 'data'))
    cfg = tmp_path / 'cfg.py'
    cfg.write_text(
        'from mcgaze_tpu.data.dataset import DataConfig\n'
        'from mcgaze_tpu.evaluation.driver import EvalConfig\n'
        'from mcgaze_tpu.models.mcgaze import ModelConfig\n'
        'from mcgaze_tpu.train.loop import OptimConfig\n'
        'model = ModelConfig()\n'
        f'data_train = DataConfig(ann_file={ann!r}, img_prefix={prefix!r},'
        ' scale=(32, 32), canvas=(32, 32), crop_size=0.68,'
        ' flip_ratio=0.5, batch_size=2)\n'
        'data_test = data_train\n')
    out = tmp_path / 'vis'
    r = subprocess.run(
        [sys.executable, 'tools/misc/browse_dataset.py', str(cfg),
         '--output-dir', str(out), '--num-clips', '2'],
        cwd=REPO, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    import cv2
    clips = sorted(out.iterdir())
    assert len(clips) == 2
    frames = sorted(clips[0].glob('*.png'))
    assert len(frames) == 7
    img = cv2.imread(str(frames[0]))
    assert img is not None and img.shape == (32, 32, 3)


def test_visualize_results_cli(tmp_path):
    import json as _json

    import numpy as np

    from tests.test_data_and_driver import make_dataset
    ann, prefix = make_dataset(str(tmp_path / 'data'), num_videos=1,
                               length=6)
    anno = _json.load(open(ann))
    video = anno['videos'][0]
    f = video['length']
    res = dict(video_id=video['id'], category_id=1,
               fusion_gazes=[[0.3, 0.1, -0.95]] * f)
    for clue in ('face', 'eyes', 'head'):
        res[f'{clue}_bboxes'] = [[5, 5, 20, 15]] * f
        res[f'{clue}_gazes'] = [[0.3, 0.1, -0.95]] * f
        res[f'{clue}_score'] = [0.9] * f
    results_path = tmp_path / 'results.json'
    results_path.write_text(_json.dumps([res]))
    out = tmp_path / 'vis'
    r = subprocess.run(
        [sys.executable, 'tools/analysis_tools/visualize_results.py',
         '--results', str(results_path), '--anno', ann, '--root', prefix,
         '--out', str(out), '--mp4'],
        cwd=REPO, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    import cv2
    frames = sorted((out / str(video['id'])).glob('*.png'))
    assert len(frames) == f
    # the drawn frame differs from the raw frame (boxes + arrow rendered)
    raw = cv2.imread(osp.join(prefix, video['file_names'][0]))
    drawn = cv2.imread(str(frames[0]))
    assert drawn.shape == raw.shape and not np.array_equal(drawn, raw)
    assert (out / f"{video['id']}.mp4").exists()
