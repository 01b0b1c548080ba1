"""InstBlink R-50 on MPEblink (native config).

The reference carries InstBlink's full model code
(mmdet/models/detectors/instblink.py, roi_heads/instblink_roi_head.py,
mask_heads/blink_head.py) and the MPEblink dataset config
(configs/_base_/datasets/mpeblink.py: clip_length 11, 640x360
keep_ratio, flip 0.5, samples_per_gpu 4) but ships no assembled model
config; the head hyperparameters here are the roi head's own defaults
(instblink_roi_head.py:15-17: 6 stages, weight-1 stages) with the
QueryInst-family loss/matcher weights.
"""
from mcgaze_tpu.data.instblink_dataset import InstBlinkDataConfig
from mcgaze_tpu.evaluation.instblink_driver import InstBlinkEvalConfig
from mcgaze_tpu.models.query_detector import QueryDetectorConfig
from mcgaze_tpu.train.loop import OptimConfig

model = QueryDetectorConfig(
    backbone='resnet50',
    num_stages=6,
    clip_length=11,
    num_queries=100,
    num_classes=1,
    with_blink=True,
    max_per_img=10,
    max_instances=8,
)

optim = OptimConfig(
    lr=2.5e-5,            # QueryInst-family AdamW default per-GPU
    weight_decay=1e-4,
    backbone_lr_mult=0.1,
    grad_clip_norm=0.1,
    warmup_iters=1000,
    warmup_ratio=0.001,
    lr_steps=(8000,),
    max_iters=12000,
)

data_train = InstBlinkDataConfig(
    ann_file='data/mpeblink/annotations/train.json',
    img_prefix='data/mpeblink/train_rawframes/',
    clip_length=11,
    batch_size=4,
    with_blinks=True,
)

data_test = InstBlinkDataConfig(
    ann_file='data/mpeblink/annotations/test.json',
    img_prefix='data/mpeblink/test_rawframes/',
    clip_length=11,
    with_blinks=True,
    flip_ratio=0.0,
    keep_ratio=False,      # test pipeline: exact 640x360 warp
)

eval_cfg = InstBlinkEvalConfig(clip_length=11, max_per_img=10)

work_dir = './work_dirs/instblink_r50_mpeblink'
