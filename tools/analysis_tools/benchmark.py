#!/usr/bin/env python
"""Inference speed benchmark over the real eval path.

Rebuild of the reference `tools/analysis_tools/benchmark.py` (fps over a
dataloader, 2000 iters, skip first 5): measures end-to-end frames/sec and
clips/sec of the batched clip forward, optionally reading real rawframes
through the full preprocessing pipeline; falls back to synthetic frames.

Usage:
  python tools/analysis_tools/benchmark.py <config> [checkpoint]
      [--json ... --root ...] [--iters 50] [--batch 32] [--synthetic]
"""
import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

from mcgaze_tpu.utils.env import setup_jax_platform  # noqa: E402

import numpy as np


def main():
    setup_jax_platform()
    ap = argparse.ArgumentParser()
    ap.add_argument('config')
    ap.add_argument('checkpoint', nargs='?', default=None)
    ap.add_argument('--json', default='data/gaze360/test.json')
    ap.add_argument('--root', default='data/gaze360/test_rawframes/')
    ap.add_argument('--iters', type=int, default=50)
    ap.add_argument('--warmup', type=int, default=5)
    ap.add_argument('--batch', type=int, default=32,
                    help='clips per forward')
    ap.add_argument('--synthetic', action='store_true',
                    help='random frames instead of the dataset')
    ap.add_argument('--dtype', default=None)
    ap.add_argument('--no-dedup', action='store_true',
                    help='disable unique-frame dedup in the eval driver '
                         '(A/B the EvalConfig.dedup_frames win)')
    ap.add_argument('--e2e', action='store_true',
                    help='measure the FULL eval path per video '
                         '(decode -> preprocess -> H2D -> forward -> '
                         'stitch) over fabricated rawframe videos when '
                         'the dataset is absent')
    ap.add_argument('--e2e-videos', type=int, default=8)
    ap.add_argument('--serial', action='store_true',
                    help='disable the decode-ahead pipeline in --e2e '
                         '(A/B the run_videos_from_paths overlap win)')
    ap.add_argument('--ship-uint8', dest='ship_uint8', default=None,
                    action='store_true',
                    help='with --e2e: force uint8 frame shipping on '
                         '(default: follow EvalConfig.ship_uint8, which '
                         'is on — so the default --e2e run measures '
                         'exactly what tools/test_gaze360_gaze.py does)')
    ap.add_argument('--no-ship-uint8', dest='ship_uint8',
                    action='store_false',
                    help='with --e2e: force f32 frame shipping (A/B)')
    ap.add_argument('--decode-only', action='store_true',
                    help='with --e2e: measure host decode+preprocess '
                         'alone — the host-bound roofline the pipelined '
                         'path should sit at when the chip is faster '
                         'than the decoder')
    ap.add_argument('--e2e-frames', type=int, default=56,
                    help='frames per fabricated video')
    args = ap.parse_args()

    if args.e2e:
        return bench_e2e(args)

    import jax

    from mcgaze_tpu.utils.config import load_config
    from tools.test_gaze360_gaze import build_forward

    cfg = load_config(args.config)
    forward = build_forward(cfg, args.checkpoint, args.dtype)
    t = cfg.model.clip_length
    h, w = cfg.eval_cfg.canvas
    n = args.batch * t

    if args.synthetic or not osp.exists(args.json):
        if not args.synthetic:
            print(f'[benchmark] {args.json} not found -> synthetic frames')
        rng = np.random.RandomState(0)
        imgs = rng.randn(n, h, w, 3).astype(np.float32)
    else:
        import json as _json

        import cv2

        from mcgaze_tpu.evaluation.driver import preprocess_frames
        anno = _json.load(open(args.json))
        frames = []
        for video in anno['videos']:
            for name in video['file_names']:
                img = cv2.imread(osp.join(args.root, name))
                if img is None:
                    print(f'[benchmark] unreadable frame skipped: {name}')
                    continue
                frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
                if len(frames) == n:
                    break
            if len(frames) == n:
                break
        if not frames:
            print(f'[benchmark] no readable frames under {args.root} -> '
                  'synthetic frames')
            rng = np.random.RandomState(0)
            frames = list(rng.randint(0, 255, (1, h, w, 3), np.uint8))
        frames = (frames * ((n + len(frames) - 1) // len(frames)))[:n]
        imgs, _, _ = preprocess_frames(frames, cfg.eval_cfg)
    whwh = np.tile(np.asarray([[w, h, w, h]], np.float32), (n, 1))

    out = None
    for _ in range(args.warmup):
        out = forward(imgs, whwh, t)
    if out is not None:
        jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = forward(imgs, whwh, t)
        # force a D2H readback each iteration — bind_forward returns
        # device arrays (async dispatch) since round 3, but this loop's
        # recorded baselines (913-936 clips/s, BENCH_r01/r02 era) were
        # measured sync-per-iter; keep the methodology comparable
        np.asarray(out[0])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = args.iters * n / dt
    print(f'Overall fps: {fps:.1f} frames/s '
          f'({fps / t:.1f} clips/s, batch {args.batch} clips, '
          f'{dt / args.iters * 1e3:.1f} ms/forward, '
          f'device {jax.devices()[0].platform})')


def bench_e2e(args):
    """End-to-end eval-path throughput: per-video decode (C++ pool or
    cv2) -> preprocess -> H2D -> batched clip forward -> overlap
    stitching, exactly the tools/test_gaze360_gaze.py flow. Uses real
    rawframes when --json/--root exist, else fabricates mp4-free PNG
    videos on disk (reference benchmark.py measures over a dataloader
    the same way)."""
    import json as _json
    import os
    import os.path as osp
    import tempfile
    import time

    import cv2
    import dataclasses

    from mcgaze_tpu.evaluation.driver import VideoGazeEvaluator
    from mcgaze_tpu.utils.config import load_config
    from tools.test_gaze360_gaze import build_forward

    cfg = load_config(args.config)
    eval_cfg = dataclasses.replace(cfg.eval_cfg, clip_batch=args.batch,
                                   dedup_frames=not args.no_dedup)
    if args.ship_uint8 is not None:
        eval_cfg = dataclasses.replace(eval_cfg,
                                       ship_uint8=args.ship_uint8)
    evaluator = VideoGazeEvaluator(
        build_forward(cfg, args.checkpoint, args.dtype), eval_cfg)

    if osp.exists(args.json):
        anno = _json.load(open(args.json))
        videos = [(v['id'],
                   [osp.join(args.root, n) for n in v['file_names']])
                  for v in anno['videos'][:args.e2e_videos]]
    else:
        print(f'[benchmark] {args.json} not found -> fabricated videos')
        rng = np.random.RandomState(0)
        root = tempfile.mkdtemp(prefix='bench_e2e_')
        videos = []
        for vid in range(args.e2e_videos):
            d = osp.join(root, f'{vid:03d}')
            os.makedirs(d)
            paths = []
            for f in range(args.e2e_frames):
                p = osp.join(d, f'{f:05d}.png')
                # natural-image-like content (smooth + local texture):
                # raw noise PNGs barely compress and overstate decode
                # cost ~3x vs camera frames
                img = cv2.GaussianBlur(
                    rng.randint(0, 255, (480, 640, 3), np.uint8),
                    (0, 0), 3.0)
                cv2.imwrite(p, img)
                paths.append(p)
            videos.append((vid, paths))

    if args.decode_only:
        evaluator._decode_video(videos[0][1], videos[0][0])  # warm cache
        t0 = time.perf_counter()
        frames = 0
        for vid, paths in videos:
            evaluator._decode_video(paths, vid)
            frames += len(paths)
        dt = time.perf_counter() - t0
        t = cfg.model.clip_length
        print(f'E2E decode-only roofline: {frames / dt:.1f} frames/s '
              f'({frames / dt / t:.1f} clips/s equivalent, {len(videos)} '
              f'videos, {frames} frames, {dt:.2f}s total)')
        return

    # warmup: compile every (chunk k_pad, clip length) combination the
    # run will hit, THROUGH the measured path (the pipelined path
    # device-puts whole videos and gathers clips on-device — different
    # executables than the serial path's host slicing; and with
    # variable-length real videos, tail chunks hit shapes video 0 never
    # does — warming only the first video would leave compiles inside
    # the timed section)
    from mcgaze_tpu.evaluation.driver import clip_slices

    def shape_sig(paths):
        slices = clip_slices(len(paths), cfg.model.clip_length,
                             eval_cfg.stride)
        starts = [s[0] for s in slices]
        kps = set()
        for i in range(0, len(starts), eval_cfg.clip_batch):
            k = len(starts[i:i + eval_cfg.clip_batch])
            kps.add(min(eval_cfg.clip_batch,
                        1 if k <= 1 else 1 << (k - 1).bit_length()))
        return (slices[0][1], tuple(sorted(kps)))

    warm = {}
    for vid, paths in videos:
        warm.setdefault(shape_sig(paths), (vid, paths))
    for vid, paths in warm.values():
        if args.serial:
            evaluator.run_video_from_paths(paths, vid)
        else:
            list(evaluator.run_videos_from_paths([(vid, paths)]))
    evaluator.phase_seconds.clear()
    t0 = time.perf_counter()
    frames = 0
    if args.serial:
        for vid, paths in videos:
            evaluator.run_video_from_paths(paths, vid)
            frames += len(paths)
    else:
        for res, (vid, paths) in zip(
                evaluator.run_videos_from_paths(videos), videos):
            frames += len(paths)
    dt = time.perf_counter() - t0
    t = cfg.model.clip_length
    mode = 'serial' if args.serial else 'pipelined'
    print(f'E2E eval path ({mode}): {frames / dt:.1f} frames/s '
          f'({frames / dt / t:.1f} clips/s equivalent, {len(videos)} '
          f'videos, {frames} frames, {dt:.2f}s total)')
    phases = ' '.join(f'{k}={v:.2f}s'
                      for k, v in sorted(evaluator.phase_seconds.items()))
    print(f'E2E host phases (cumulative; decode/device_put in the '
          f'producer thread): {phases}')


if __name__ == '__main__':
    main()
