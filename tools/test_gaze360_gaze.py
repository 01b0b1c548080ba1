#!/usr/bin/env python
"""Gaze evaluation entry (reference CLI surface: tools/test_gaze360_gaze.py
<config> <checkpoint> --json --root). Writes the per-video results JSON
consumed by tools/calculate_mae_gaze360.py.

The checkpoint may be an orbax dir written by tools/train.py or a torch
.pth from the reference repo (converted on the fly)."""
import argparse
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from mcgaze_tpu.utils.env import setup_jax_platform  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None,
                   help='orbax dir or torch .pth; omit for random init')
    p.add_argument('--json', default='data/gaze360/test.json')
    p.add_argument('--root', default='data/gaze360/test_rawframes/')
    p.add_argument('--out-dir', default='results')
    p.add_argument('--clip-batch', type=int, default=8)
    p.add_argument('--max-videos', type=int, default=0)
    p.add_argument('--ema', action='store_true',
                   help='evaluate the EMA weights from <ckpt>_train '
                        '(reference EMAHook eval-swap semantics)')
    p.add_argument('--dtype', default=None,
                   help="override model dtype (e.g. bfloat16)")
    p.add_argument('--cfg-options', nargs='+', default=None,
                   help="config overrides 'a.b=val'")
    return p.parse_args()


def build_forward(cfg, checkpoint, dtype=None, ema=False):
    import dataclasses

    from mcgaze_tpu.evaluation.forward import bind_forward, make_eval_forward
    from mcgaze_tpu.utils.checkpoint import restore_checkpoint

    model_cfg = cfg.model
    if dtype:
        model_cfg = dataclasses.replace(model_cfg, dtype=dtype)
    _model, variables, fwd, fwd_dedup = make_eval_forward(
        model_cfg, cfg.eval_cfg.canvas)
    if checkpoint:
        if checkpoint.endswith(('.pth', '.pt')):
            if ema:
                raise SystemExit('--ema needs an orbax checkpoint pair '
                                 '(ckpt_N + ckpt_N_train) from '
                                 'tools/train.py; torch .pth checkpoints '
                                 'carry no EMA split')
            from mcgaze_tpu.utils.torch_convert import convert_torch_checkpoint
            variables = convert_torch_checkpoint(checkpoint, variables)
        else:
            # Targetless restore: accepts both eval-only {params, stats}
            # checkpoints and full TrainState checkpoints from tools/train.
            restored = restore_checkpoint(checkpoint)
            params = restored['params']
            if ema:
                # evaluate the EMA weights (reference EMAHook swaps the
                # averaged params in for eval, mmdet/core/hook/ema.py);
                # tools/train.py stores them in the _train split
                train = restore_checkpoint(checkpoint + '_train')
                if not isinstance(train, dict) or \
                        train.get('ema_params') is None:
                    raise SystemExit(
                        f'{checkpoint}_train holds no ema_params — train '
                        'with optim.ema_momentum > 0 to produce them')
                params = train['ema_params']
            variables = {'params': params, 'stats': restored['stats']}

    return bind_forward(fwd, variables, fwd_dedup)


def main():
    setup_jax_platform()
    args = parse_args()
    from mcgaze_tpu.evaluation.driver import VideoGazeEvaluator
    from mcgaze_tpu.utils.config import load_config
    import dataclasses

    from mcgaze_tpu.parallel.distributed import (gather_objects,
                                                 init_distributed,
                                                 process_index,
                                                 shard_across_processes)
    init_distributed()          # before ANY backend-touching jax call

    from mcgaze_tpu.utils.cfg_options import apply_overrides
    cfg = apply_overrides(load_config(args.config), args.cfg_options)
    eval_cfg = dataclasses.replace(cfg.eval_cfg, clip_batch=args.clip_batch)
    forward = build_forward(cfg, args.checkpoint, args.dtype,
                              ema=args.ema)
    evaluator = VideoGazeEvaluator(forward, eval_cfg)

    anno = json.load(open(args.json))
    videos = anno['videos']
    if args.max_videos:
        videos = videos[:args.max_videos]
    # multi-host: rank-sharded video list, results gathered at the end
    # (reference multi_gpu_test + collect_results_cpu, apis/test.py:81-178)
    videos = shard_across_processes(videos)

    results = []
    t0 = time.time()
    total_frames = 0
    # pipelined: decode of video N+1 runs in a background thread (C++
    # pool) while video N's clips forward on the device
    stream = evaluator.run_videos_from_paths(
        (video['id'],
         [osp.join(args.root, name) for name in video['file_names']])
        for video in videos)
    for i, (video, res) in enumerate(zip(videos, stream)):
        results.append(res)
        total_frames += len(video['file_names'])
        if (i + 1) % 50 == 0:
            print(f'{i + 1}/{len(videos)} videos, '
                  f'{total_frames / (time.time() - t0):.1f} frames/s')

    results = gather_objects(results)
    if process_index() != 0:
        return
    os.makedirs(args.out_dir, exist_ok=True)
    cfg_name = osp.basename(args.config)
    cfg_name = cfg_name[:-3] if cfg_name.endswith('.py') else cfg_name
    write_path = osp.join(
        args.out_dir, f'results_{cfg_name}_{osp.basename(args.json)}')
    json.dump(results, open(write_path, 'w'))
    # counts from the GATHERED list (total_frames only covers this
    # rank's shard); the rate is per-process wall on this rank's shard
    global_frames = sum(len(r['fusion_gazes']) for r in results)
    print(f'wrote {write_path} '
          f'({len(results)} videos, {global_frames} frames, '
          f'{total_frames / (time.time() - t0):.1f} frames/s/process)')


if __name__ == '__main__':
    main()
