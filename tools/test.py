#!/usr/bin/env python
"""Generic test entry (reference CLI surface: tools/test.py <config> <ckpt>
[--out file] [--eval metric]).

For the gaze model family this wraps the video eval driver
(tools/test_gaze360_gaze.py flow) and optionally scores MAE inline
(--eval mae), replacing the reference's two-step
test_gaze360_gaze.py -> calculate_mae_gaze360.py round trip.
"""
import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from mcgaze_tpu.utils.env import setup_jax_platform  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--json', default='data/gaze360/test.json',
                   help='COCO-VID annotation JSON')
    p.add_argument('--root', default='data/gaze360/test_rawframes/')
    p.add_argument('--out', default=None, help='results JSON path')
    p.add_argument('--eval', nargs='*', default=[],
                   choices=['mae'], help='metrics to compute inline')
    p.add_argument('--l2cs', action='store_true',
                   help='use the l2cs GT indexing for --eval mae')
    p.add_argument('--clip-batch', type=int, default=8)
    p.add_argument('--max-videos', type=int, default=0)
    p.add_argument('--dtype', default=None)
    p.add_argument('--ema', action='store_true',
                   help='evaluate the EMA weights from <ckpt>_train '
                        '(reference EMAHook eval-swap semantics)')
    p.add_argument('--cfg-options', nargs='+', default=None,
                   help="config overrides 'a.b=val'")
    return p.parse_args()


def main():
    setup_jax_platform()
    args = parse_args()
    import dataclasses

    from mcgaze_tpu.evaluation.driver import VideoGazeEvaluator
    from mcgaze_tpu.parallel.distributed import (gather_objects,
                                                 init_distributed,
                                                 process_index,
                                                 shard_across_processes)
    from mcgaze_tpu.utils.config import load_config
    from tools.test_gaze360_gaze import build_forward

    init_distributed()
    from mcgaze_tpu.utils.cfg_options import apply_overrides
    cfg = apply_overrides(load_config(args.config), args.cfg_options)
    eval_cfg = dataclasses.replace(cfg.eval_cfg, clip_batch=args.clip_batch)
    evaluator = VideoGazeEvaluator(
        build_forward(cfg, args.checkpoint, args.dtype,
                            ema=args.ema), eval_cfg)

    anno = json.load(open(args.json))
    videos = anno['videos']
    if args.max_videos:
        videos = videos[:args.max_videos]
    videos = shard_across_processes(videos)

    # pipelined: decode of video N+1 overlaps video N's device forwards
    results = list(evaluator.run_videos_from_paths(
        (video['id'],
         [osp.join(args.root, name) for name in video['file_names']])
        for video in videos))
    results = gather_objects(results)
    if process_index() != 0:
        return

    if args.out:
        os.makedirs(osp.dirname(osp.abspath(args.out)), exist_ok=True)
        json.dump(results, open(args.out, 'w'))
        print(f'wrote {args.out} ({len(results)} videos)')

    if 'mae' in args.eval:
        from mcgaze_tpu.evaluation.mae import evaluate_results
        metrics = evaluate_results(results, anno, l2cs=args.l2cs)
        for k, v in metrics.items():
            print(f'{k}: {v:.4f}')


if __name__ == '__main__':
    main()
