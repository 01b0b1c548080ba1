"""MCGaze R-50, l2cs setting (native mcgaze_tpu config).

Mirrors the reference configs/multiclue_gaze/multiclue_gaze_r50_l2cs.py:
448px, no CenterCrop, batch 8, 13000 iters with step @12000.
"""
from mcgaze_tpu.data.dataset import DataConfig
from mcgaze_tpu.evaluation.driver import EvalConfig
from mcgaze_tpu.models.mcgaze import ModelConfig
from mcgaze_tpu.train.loop import OptimConfig

model = ModelConfig(
    backbone_depth=50,
    num_stages=4,
    clip_length=7,
)

optim = OptimConfig(
    lr=1e-3,
    weight_decay=1e-4,
    backbone_lr_mult=0.1,
    grad_clip_norm=0.1,
    warmup_iters=1000,
    warmup_ratio=1e-3,
    lr_steps=(12000,),
    max_iters=13000,
)

data_train = DataConfig(
    ann_file='data/l2cs/train.json',
    img_prefix='data/l2cs/train_rawframes/',
    clip_length=7,
    scale=(448, 448),
    canvas=(448, 448),
    crop_size=None,
    flip_ratio=0.5,
    batch_size=8,
)

data_test = DataConfig(
    ann_file='data/l2cs/test.json',
    img_prefix='data/l2cs/test_rawframes/',
    clip_length=7,
    scale=(448, 448),
    canvas=(448, 448),
    crop_size=None,
    flip_ratio=0.0,
    batch_size=8,
)

eval_cfg = EvalConfig(
    clip_length=7,
    stride=4,
    scale=(448, 448),
    canvas=(448, 448),
    crop_ratio=None,
)

checkpoint_interval = 1000
work_dir = './work_dirs/multiclue_gaze_r50_l2cs'
