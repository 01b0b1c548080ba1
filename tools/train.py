#!/usr/bin/env python
"""Train MCGaze (reference CLI surface: tools/train.py <config>).

Examples:
  python tools/train.py configs/multiclue_gaze/multiclue_gaze_r50_gaze360.py
  python tools/train.py <cfg> --synthetic --max-iters 20   # smoke test
"""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from mcgaze_tpu.utils.env import setup_jax_platform  # noqa: E402

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--work-dir')
    p.add_argument('--max-iters', type=int)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--resume-from')
    p.add_argument('--auto-resume', action='store_true')
    p.add_argument('--synthetic', action='store_true',
                   help='random batches instead of the dataset (smoke)')
    p.add_argument('--validate', action='store_true',
                   help='run val MAE every --val-interval iters (reference '
                        'EvalHook, which ships disabled: --no-validate '
                        'defaults True there)')
    p.add_argument('--val-interval', type=int, default=None,
                   help='default: checkpoint interval')
    p.add_argument('--val-json', default=None,
                   help='val COCO-VID JSON (default: test annotation from '
                        'the config)')
    p.add_argument('--val-root', default=None,
                   help='val rawframes root (default: from the config)')
    p.add_argument('--val-max-videos', type=int, default=0)
    p.add_argument('--val-l2cs', action='store_true',
                   help='score validation with the l2cs GT layout (3 '
                        'annotation tracks per video, like tools/test.py '
                        '--l2cs); without it an l2cs-layout val JSON would '
                        'silently mispair GT and log wrong MAE')
    p.add_argument('--mesh', default=None, metavar='D,M',
                   help='device mesh as data,model axis sizes (e.g. 4,2); '
                        'default: all visible devices on the data axis')
    p.add_argument('--log-interval', type=int)
    p.add_argument('--cfg-options', nargs='+', default=None,
                   help="config overrides 'a.b=val' (reference DictAction "
                        'surface)')
    p.add_argument('--profile-dir', default=None,
                   help='capture a jax.profiler trace of iters 3-8 to this '
                        'dir (TensorBoard/xprof; reference profile_time '
                        'analogue)')
    return p.parse_args()


def synthetic_batches(cfg, seed=0):
    from mcgaze_tpu.train.targets import slot_layout_from_counts
    rng = np.random.RandomState(seed)
    b, t = cfg.data_train.batch_size, cfg.model.clip_length
    h, w = cfg.data_train.canvas
    while True:
        boxes = np.zeros((b, t, 3, 4), np.float32)
        valid = np.zeros((b, t, 3), np.float32)
        gazes = np.zeros((b, t, 3, 3), np.float32)
        for i in range(b):
            for j in range(t):
                g = rng.randn(3)
                g /= np.linalg.norm(g)
                bb, vv, gg = slot_layout_from_counts(
                    [[20, 20, 120, 120], [30, 40, 90, 70],
                     [10, 10, 160, 160]], [g.tolist()] * 3)
                boxes[i, j], valid[i, j], gazes[i, j] = bb, vv, gg
        yield dict(
            imgs=rng.randn(b, t, h, w, 3).astype(np.float32),
            img_whwh=np.tile(np.array([w, h, w, h], np.float32),
                             (b, t, 1)),
            gt_boxes=boxes, gt_valid=valid, gt_gazes=gazes)


def _model_tree(state):
    """Checkpoint split: ckpt_N holds the model (what eval loads),
    ckpt_N_train holds optimizer/step/EMA (what resume additionally
    needs) — eval never reads the ~2x-params AdamW moments."""
    return dict(params=state.params, stats=state.stats)


def _train_tree(state):
    return dict(opt_state=state.opt_state, step=state.step,
                ema_params=state.ema_params)


def main():
    setup_jax_platform()
    args = parse_args()
    import jax
    from mcgaze_tpu.data.dataset import Gaze360ClipDataset
    from mcgaze_tpu.parallel.mesh import batch_sharding, make_mesh
    from mcgaze_tpu.train.hooks import CheckInvalidLoss, TextLogger
    from mcgaze_tpu.train.loop import (create_train_state, make_train_step,
                                       step_warmup_schedule)
    from mcgaze_tpu.utils.profiling import IterTimer
    from mcgaze_tpu.utils.checkpoint import (find_latest_checkpoint,
                                             restore_checkpoint,
                                             save_checkpoint)
    from mcgaze_tpu.utils.config import load_config

    from mcgaze_tpu.parallel.distributed import (init_distributed,
                                                 sync_random_seed)
    init_distributed()
    from mcgaze_tpu.utils.collect_env import collect_env
    for k, v in collect_env().items():
        print(f'env: {k}: {v}')
    args.seed = sync_random_seed(args.seed)

    from mcgaze_tpu.utils.cfg_options import apply_overrides
    cfg = apply_overrides(load_config(args.config), args.cfg_options)
    work_dir = args.work_dir or cfg.work_dir
    os.makedirs(work_dir, exist_ok=True)
    max_iters = args.max_iters or cfg.optim.max_iters
    log_interval = args.log_interval or cfg.log_interval

    state = create_train_state(cfg.model, cfg.optim,
                               jax.random.PRNGKey(args.seed),
                               image_size=cfg.data_train.canvas)
    resume = args.resume_from or (
        find_latest_checkpoint(work_dir) if args.auto_resume else None)
    if resume:
        # Full-state resume: params + stats + opt_state + step (+ EMA) —
        # reference `--resume-from` semantics (apis/train.py:199-208),
        # where LR schedule and optimizer moments continue, not restart.
        state = state.replace(**restore_checkpoint(resume,
                                                   _model_tree(state)))
        if osp.isdir(resume + '_train'):
            state = state.replace(**restore_checkpoint(
                resume + '_train', _train_tree(state)))
        else:
            print(f'warning: {resume}_train missing — optimizer state and '
                  'LR-schedule position restart from 0')
        print(f'resumed from {resume} at step {int(state.step)}')

    # Global batch in the config; each process loads its 1/P local slice
    # (assembled into global arrays by device_put_batches).
    n_proc = jax.process_count()
    if n_proc > 1:
        global_b = cfg.data_train.batch_size
        if global_b % n_proc:
            raise SystemExit(f'batch_size {global_b} not divisible by '
                             f'{n_proc} processes')
        import dataclasses as _dc
        cfg = _dc.replace(cfg, data_train=_dc.replace(
            cfg.data_train, batch_size=global_b // n_proc))

    # per-process streams differ by seed offset (infinite shuffled stream
    # analogue of the reference's rank-aware InfiniteGroupBatchSampler)
    if args.synthetic:
        batches = synthetic_batches(cfg, args.seed + jax.process_index())
    else:
        ds = Gaze360ClipDataset(cfg.data_train, seed=args.seed)
        print(f'dataset: {len(ds)} annotated frames')
        batches = ds.batches(seed=args.seed + jax.process_index())

    if args.mesh:
        n_data, n_model = (int(x) for x in args.mesh.split(','))
        mesh = make_mesh(n_data=n_data, n_model=n_model)
    else:
        mesh = make_mesh(n_model=1)
    print(f'mesh: data={mesh.shape["data"]} model={mesh.shape["model"]} '
          f'over {len(mesh.devices.ravel())} devices, {n_proc} processes')
    bs = batch_sharding(mesh)
    # Place params under the TP rules (replicated when model axis is 1),
    # optimizer state and stats replicated — same layout as
    # __graft_entry__.dryrun_multichip.
    from mcgaze_tpu.parallel.mesh import (opt_state_shardings,
                                          param_shardings, replicated)
    p_sh = param_shardings(mesh, state.params)
    state = state.replace(
        params=jax.device_put(state.params, p_sh),
        stats=jax.device_put(state.stats, replicated(mesh)),
        # moments follow the param shardings (mesh.py docstring: AOT
        # multi-process steps require in == out placement)
        opt_state=jax.device_put(
            state.opt_state,
            opt_state_shardings(mesh, state.opt_state, state.params)),
        step=jax.device_put(state.step, replicated(mesh)),
        ema_params=(jax.device_put(state.ema_params, p_sh)
                    if state.ema_params is not None else None),
    )
    step_fn = make_train_step(cfg.model, cfg.optim)
    sched = step_warmup_schedule(cfg.optim)

    # decode (C++ pool) + host->device transfer run one batch ahead of
    # the compiled step (data/prefetch.py)
    from mcgaze_tpu.data.prefetch import device_put_batches
    batches = prefetcher = device_put_batches(batches, bs)

    if n_proc > 1:
        # AOT-compile the step, then re-align the processes before the
        # first execution: the first cross-process collective's Gloo
        # rendezvous times out at ~30 s while compile-time skew between
        # processes can be minutes (parallel/distributed.py::barrier).
        import itertools
        from mcgaze_tpu.parallel.distributed import barrier
        first = next(batches)
        step_fn = step_fn.lower(state, first).compile()
        barrier('train_step_compiled')
        batches = itertools.chain([first], batches)

    val_hook = None
    if args.validate:
        # multi-process: videos rank-sharded, results gathered, rank 0
        # scores (train/hooks.py::ValidationHook); every process calls
        # the hook each interval — the gather is a collective
        from mcgaze_tpu.train.hooks import ValidationHook
        val_hook = ValidationHook(
            cfg,
            args.val_json or cfg.data_test.ann_file,
            args.val_root or cfg.data_test.img_prefix,
            interval=args.val_interval or cfg.checkpoint_interval,
            max_videos=args.val_max_videos, l2cs=args.val_l2cs,
            work_dir=work_dir)

    # log from process 0 only (reference: mmcv's rank-0 logger); losses
    # are global under the jit so rank 0's stream is complete, and two
    # processes appending to the same jsonl would interleave corruptly
    logger = TextLogger(work_dir if jax.process_index() == 0 else None,
                        max_iters, log_interval,
                        quiet=jax.process_index() != 0)
    nan_guard = CheckInvalidLoss(interval=log_interval)
    timer = IterTimer()
    start_step = int(state.step)
    prof_on = False
    for it in range(start_step, max_iters):
        if args.profile_dir is not None:
            # trace iters start+3..start+8 (relative to the resumed step)
            import jax.profiler
            if it == start_step + 3 and it + 1 < max_iters:
                jax.profiler.start_trace(args.profile_dir)
                prof_on = True
            elif prof_on and it == start_step + 8:
                jax.profiler.stop_trace()
                prof_on = False
                print(f'profiler trace -> {args.profile_dir}')
        timer.before_iter()
        batch = next(batches)
        state, logs = step_fn(state, batch)
        timer.after_iter(sync=logs['loss'])
        nan_guard.after_iter(it + 1, logs)
        logger.after_iter(it + 1, logs, float(sched(it)), timer)
        if (it + 1) % cfg.checkpoint_interval == 0 or it + 1 == max_iters:
            path = save_checkpoint(work_dir, it + 1, _model_tree(state),
                                   train_tree=_train_tree(state))
            if jax.process_index() == 0:
                print(f'saved {path}')
        if val_hook is not None:
            val_hook.after_iter(it + 1, state)
    if prof_on:
        import jax.profiler
        jax.profiler.stop_trace()
        print(f'profiler trace -> {args.profile_dir}')
    # join the prefetch producer BEFORE interpreter teardown: a daemon
    # thread still inside device_put / the native pool while the runtime
    # shuts down aborts the process (C++ 'terminate called')
    prefetcher.close()


if __name__ == '__main__':
    main()
