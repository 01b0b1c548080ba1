"""TeViT (MsgShifT backbone) on YouTubeVIS, box-track variant.

The reference carries TeViT's code (detectors/tevit.py,
roi_heads/tevit_roi_head.py, backbones/msgshift.py) and a family of
YouTubeVIS dataset configs (configs/_base_/datasets/youtubevis*.py) but
no assembled model config; this config follows the TeViT paper's
architecture (MsgShifT backbone, 6 stages, 100 queries, 40 classes).
The fork's own mask branch is non-functional (tevit_roi_head.py:180-184
feeds gt_blinks into a mask API), so the rebuilt TeViT is the box-track
variant: with_blink=False, track output scored by the ytvis track AP
(evaluation/track_eval.py).
"""
from mcgaze_tpu.data.instblink_dataset import InstBlinkDataConfig
from mcgaze_tpu.evaluation.instblink_driver import InstBlinkEvalConfig
from mcgaze_tpu.models.query_detector import QueryDetectorConfig
from mcgaze_tpu.train.loop import OptimConfig

model = QueryDetectorConfig(
    backbone='msgshift',
    num_stages=6,
    clip_length=5,            # youtubevis_resplit_v2_clip_len5
    num_queries=100,
    num_classes=40,
    with_blink=False,
    max_per_img=10,
    max_instances=10,
)

optim = OptimConfig(
    lr=2.5e-5,
    weight_decay=1e-4,
    backbone_lr_mult=0.1,
    grad_clip_norm=0.1,
    warmup_iters=1000,
    warmup_ratio=0.001,
    lr_steps=(8000,),
    max_iters=12000,
)

data_train = InstBlinkDataConfig(
    ann_file='data/youtubevis/annotations/train.json',
    img_prefix='data/youtubevis/train_rawframes/',
    clip_length=5,
    batch_size=4,
    with_blinks=False,
)

data_test = InstBlinkDataConfig(
    ann_file='data/youtubevis/annotations/valid.json',
    img_prefix='data/youtubevis/valid_rawframes/',
    clip_length=5,
    with_blinks=False,
    flip_ratio=0.0,
    keep_ratio=False,
)

eval_cfg = InstBlinkEvalConfig(clip_length=5, max_per_img=10)

work_dir = './work_dirs/tevit_msgshift_youtubevis'
