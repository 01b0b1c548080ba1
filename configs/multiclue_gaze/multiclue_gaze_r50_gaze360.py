"""MCGaze R-50, Gaze360 setting (native mcgaze_tpu config).

Hyper-parameters mirror the reference
configs/multiclue_gaze/multiclue_gaze_r50_gaze360.py: 4 refinement stages,
7-frame clips, AdamW 1e-3 (backbone x0.1), clip 0.1, 7000 iters with
warmup 1000 / step @6000, batch 32 clips, 224px CenterCrop(0.68) pipeline.
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
    lr_steps=(6000,),
    max_iters=7000,
)

data_train = DataConfig(
    ann_file='data/gaze360/train.json',
    img_prefix='data/gaze360/train_rawframes/',
    clip_length=7,
    scale=(224, 224),
    canvas=(224, 224),
    crop_size=0.68,
    flip_ratio=0.5,
    batch_size=32,
)

data_test = DataConfig(
    ann_file='data/gaze360/test.json',
    img_prefix='data/gaze360/test_rawframes/',
    clip_length=7,
    scale=(224, 224),
    canvas=(224, 224),
    crop_size=0.68,
    flip_ratio=0.0,
    batch_size=32,
)

eval_cfg = EvalConfig(
    clip_length=7,
    stride=4,
    scale=(224, 224),
    canvas=(224, 224),
    crop_ratio=0.84,
)

checkpoint_interval = 1000
work_dir = './work_dirs/multiclue_gaze_r50_gaze360'
