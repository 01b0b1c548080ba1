#!/usr/bin/env python
"""InstBlink / TeViT video inference + evaluation.

  python tools/test_instblink.py <cfg> <ckpt> --out results.json --eval

Per video: clip slicing + jitted forward + top-k tracks + FaceLinker
track linking (evaluation/instblink_driver.py); --eval scores the
results with the MPEblink track AP + blink action AP
(evaluation/track_eval.py, the rebuild of the reference's
mmdet/datasets/mpeblink_eval_api.py) or, for with_blink=False configs
(TeViT), ytvis track AP only. `--eval-only saved.json` re-scores a
previously written results file with no checkpoint or chip (the
reference's tools/analysis_tools/eval_metric.py pattern).
"""
import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--out', default=None, help='results JSON path')
    p.add_argument('--eval', action='store_true',
                   help='score tracks (+blinks) against the ann_file GT')
    p.add_argument('--eval-only', default=None, metavar='RESULTS_JSON',
                   help='skip inference and re-score a saved results '
                        'JSON against the ann_file GT (the reference '
                        'tools/analysis_tools/eval_metric.py pattern)')
    p.add_argument('--max-videos', type=int, default=0)
    args = p.parse_args()
    if args.eval_only is None and args.checkpoint is None:
        p.error('checkpoint is required unless --eval-only is given')
    return args


def gt_tracks_from_api(api, with_blinks):
    """GT maps for evaluation/track_eval.py from a COCO-VID annotation."""
    gt_by_vid_cat, blink_events = {}, {}
    for vid_id in api.get_vid_ids():
        for ann in api.anns_of_video(vid_id):
            key = (vid_id, ann['category_id'])
            gt_by_vid_cat.setdefault(key, []).append(
                dict(id=ann['id'], track=ann['bboxes']))
            if with_blinks and 'blinks' in ann:
                blink_events[ann['id']] = [tuple(e) for e in ann['blinks']]
    return gt_by_vid_cat, blink_events


def score_results(results, api, with_blinks):
    """Score a results list against the annotation GT and print APs."""
    from mcgaze_tpu.evaluation.track_eval import (evaluate_tracks,
                                                  mpeblink_blink_ap)
    gt_by_vid_cat, gt_blinks = gt_tracks_from_api(api, with_blinks)
    dt_by_vid_cat, dt_blinks = {}, {}
    for di, r in enumerate(results):
        key = (r['video_id'], r['category_id'])
        dt_by_vid_cat.setdefault(key, []).append(
            dict(id=di + 1, score=r['score'], track=r['bboxes']))
        dt_blinks[di + 1] = [tuple(e) for e in
                             r.get('blinks_converted', [])]
    if with_blinks and gt_blinks:
        res = mpeblink_blink_ap(gt_by_vid_cat, dt_by_vid_cat,
                                gt_blinks, dt_blinks)
        tr = res['track']
        print(f"track mAP {tr['mAP']:.4f}  AP50 {tr['AP50']:.4f}  "
              f"AP75 {tr['AP75']:.4f}  AR {tr['AR']:.4f}")
        blink_at_50 = res[0.5]
        print(f'blink action AP@[tIoU .5:.95] (inst IoU .5): '
              f'{blink_at_50.mean():.4f}  '
              f'AP@.5 {blink_at_50[0]:.4f}')
    else:
        tr = evaluate_tracks(gt_by_vid_cat, dt_by_vid_cat)
        print(f"track mAP {tr['mAP']:.4f}  AP50 {tr['AP50']:.4f}  "
              f"AP75 {tr['AP75']:.4f}  AR {tr['AR']:.4f}")


def main():
    args = parse_args()
    from mcgaze_tpu.utils.env import setup_jax_platform
    setup_jax_platform()

    if args.eval_only:
        from mcgaze_tpu.data.coco_vid import CocoVid
        from mcgaze_tpu.utils.query_config import load_query_config
        cfg = load_query_config(args.config)
        with open(args.eval_only) as f:
            results = json.load(f)
        score_results(results, CocoVid(cfg.data_test.ann_file),
                      cfg.data_test.with_blinks)
        return 0

    import jax

    from mcgaze_tpu.data.instblink_dataset import InstBlinkClipDataset
    from mcgaze_tpu.evaluation.instblink_driver import (
        InstBlinkVideoEvaluator)
    from mcgaze_tpu.models.query_detector import init_query_model
    from mcgaze_tpu.utils.checkpoint import restore_checkpoint
    from mcgaze_tpu.utils.query_config import load_query_config

    cfg = load_query_config(args.config)
    mc = cfg.model
    model, variables = init_query_model(mc, jax.random.PRNGKey(0),
                                        image_size=cfg.data_test.canvas)
    if args.checkpoint.endswith(('.pth', '.pt')):
        from mcgaze_tpu.utils.torch_convert import (
            convert_query_torch_checkpoint)
        variables = convert_query_torch_checkpoint(
            args.checkpoint, variables, num_stages=mc.num_stages,
            with_blink=mc.with_blink, num_cls_fcs=mc.num_cls_fcs,
            num_reg_fcs=mc.num_reg_fcs)
    else:
        ckpt = restore_checkpoint(args.checkpoint,
                                  target=dict(params=variables['params']))
        variables = dict(variables, params=ckpt['params'])

    from mcgaze_tpu.evaluation.forward import (bind_query_forward,
                                               make_query_eval_forward)
    fwd, fwd_batched = make_query_eval_forward(model, mc)
    forward = bind_query_forward(fwd, fwd_batched, variables)

    ds = InstBlinkClipDataset(cfg.data_test)
    evaluator = InstBlinkVideoEvaluator(forward, cfg.eval_cfg,
                                        data_cfg=cfg.data_test)

    results = []
    vids = ds.api.get_vid_ids()
    if args.max_videos:
        vids = vids[:args.max_videos]
    # pipelined e2e: C++ pool decode + u8 ship + round-robin over local
    # devices + one packed readback per video (the gaze driver's
    # run_videos_from_paths discipline, evaluation/instblink_driver.py)
    import time
    t0 = time.time()
    total_frames = 0
    stream = evaluator.run_videos_from_paths(
        (vid_id, ds.video_paths(vid_id)) for vid_id in vids)
    for vid_id, tracks in zip(vids, stream):
        results.extend(tracks)
        total_frames += len(ds.video_paths(vid_id))
        print(f'video {vid_id}: {len(results)} tracks total, '
              f'{total_frames / (time.time() - t0):.1f} frames/s')

    out_path = args.out or 'results_instblink.json'
    with open(out_path, 'w') as f:
        json.dump(results, f)
    print(f'wrote {out_path} ({len(results)} tracks)')

    if args.eval:
        score_results(results, ds.api, cfg.data_test.with_blinks)
    return 0


if __name__ == '__main__':
    sys.exit(main())
