"""Demo end-to-end CLI smoke: synthetic mp4 -> head_det.py (random-init
YOLOv5 from an .npz) -> gaze_demo.py (random-init gaze model, tiny config)
-> output mp4. Exercises the full demo wiring exactly as a user runs it."""
import os
import os.path as osp
import subprocess
import sys
import textwrap

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def run(args):
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('XLA_FLAGS', None)
    return subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=900)


@pytest.mark.slow
def test_demo_pipeline_end_to_end(tmp_path):
    # 1) synthetic 8-frame mp4
    video = str(tmp_path / 'in.mp4')
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*'mp4v'), 5,
                        (96, 96))
    rng = np.random.RandomState(0)
    for _ in range(8):
        w.write(rng.randint(0, 255, (96, 96, 3), np.uint8))
    w.release()

    # 2) random-init yolo weights as flat npz (loader's npz path)
    import jax

    from mcgaze_tpu.models.yolov5 import YoloConfig, init_yolo
    cfg = YoloConfig(img_size=96)
    _, variables = init_yolo(cfg, jax.random.PRNGKey(0))
    flat = {}

    def emit(path, leaf):
        flat['/'.join(p.key for p in path)] = np.asarray(leaf)

    jax.tree_util.tree_map_with_path(emit, variables)
    wpath = str(tmp_path / 'yolo.npz')
    np.savez(wpath, **flat)

    work = str(tmp_path / 'work')
    r = run(['demo/head_det.py', video, wpath, '--out-dir', work,
             '--img-size', '96', '--batch', '4', '--conf-thres', '0.01'])
    assert r.returncode == 0, r.stderr[-3000:]
    assert osp.exists(osp.join(work, 'frames', '7.jpg'))
    assert osp.exists(osp.join(work, 'labels', '0.txt'))

    # random init rarely detects anything at conf .01; guarantee one
    # "person" per frame so the gaze stage has segments to chew on
    for i in range(8):
        with open(osp.join(work, 'labels', f'{i}.txt'), 'w') as f:
            f.write('1 20 20 70 70\n')

    # 3) gaze stage with a tiny native config (random init: no checkpoint)
    cfg_path = tmp_path / 'tiny_cfg.py'
    cfg_path.write_text(textwrap.dedent("""
        from mcgaze_tpu.data.dataset import DataConfig
        from mcgaze_tpu.evaluation.driver import EvalConfig
        from mcgaze_tpu.models.mcgaze import ModelConfig
        from mcgaze_tpu.train.loop import OptimConfig
        model = ModelConfig(backbone_depth=26, num_stages=2,
                            stage_loss_weights=(1.0, 1.0),
                            ffn_channels=256)
        optim = OptimConfig()
        data_train = DataConfig(scale=(32, 32), canvas=(32, 32))
        data_test = data_train
        eval_cfg = EvalConfig(scale=(32, 32), canvas=(32, 32),
                              crop_ratio=None, clip_batch=2)
    """))
    out_mp4 = str(tmp_path / 'out.mp4')
    r = run(['demo/gaze_demo.py', '--work', work, '--config', str(cfg_path),
             '--out', out_mp4])
    assert r.returncode == 0, r.stderr[-3000:]
    assert osp.getsize(out_mp4) > 0
    cap = cv2.VideoCapture(out_mp4)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 8
    cap.release()
