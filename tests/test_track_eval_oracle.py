"""Track AP + blink action AP vs the REFERENCE's own evaluator.

mmdet/datasets/mpeblink_eval_api.py imports only numpy/pandas and takes
duck-typed coco objects, so we can execute the reference evaluator
in-process on synthetic annotations and require our rebuild
(mcgaze_tpu/evaluation/track_eval.py) to reproduce its numbers — the
same oracle discipline as tests/test_reference_oracle.py.
"""
import importlib.util
import sys

import numpy as np
import pytest

from mcgaze_tpu.evaluation import track_eval as te

REF_API = '/root/reference/mmdet/datasets/mpeblink_eval_api.py'


class DuckCoco:
    """The slice of the ytvis-cocoapi surface the reference evaluator
    touches (getVidIds/getCatIds/getAnnIds/loadAnns)."""

    def __init__(self, anns, vid_ids, cat_ids):
        self.anns = {a['id']: a for a in anns}
        self.vid_ids = list(vid_ids)
        self.cat_ids = list(cat_ids)

    def getVidIds(self):
        return list(self.vid_ids)

    def getCatIds(self):
        return list(self.cat_ids)

    def getAnnIds(self, vidIds=None, catIds=None):
        vid = set(vidIds) if vidIds else None
        cat = set(catIds) if catIds else None
        return [a['id'] for a in self.anns.values()
                if (vid is None or a['video_id'] in vid)
                and (cat is None or a['category_id'] in cat)]

    def loadAnns(self, ids):
        if isinstance(ids, (int, np.integer)):
            ids = [int(ids)]
        return [self.anns[i] for i in ids]


@pytest.fixture(scope='module')
def ref_eval_cls():
    np.float = float        # the reference uses the removed numpy alias
    spec = importlib.util.spec_from_file_location('mpeblink_eval_api',
                                                  REF_API)
    mod = importlib.util.module_from_spec(spec)
    sys.modules['mpeblink_eval_api'] = mod
    spec.loader.exec_module(mod)
    # the reference does `from numpy import *`; numpy 2.0 added max/min/
    # round/abs to __all__, shadowing the builtins the 2022-era code was
    # written against (compute_frame_i calls max(d[0], g[0])). Restore
    # numpy-1.x star-import semantics inside the module.
    import builtins
    for name in ('max', 'min', 'round', 'abs'):
        setattr(mod, name, getattr(builtins, name))
    return mod.MPEblinkEval


def _track(rng, f, base=None, jitter=0.0, none_prob=0.15):
    """Random xywh-or-None per-frame track."""
    t = []
    x, y = rng.rand(2) * 200
    w, h = 30 + rng.rand(2) * 60
    for fi in range(f):
        if rng.rand() < none_prob:
            t.append(None)
            continue
        if base is not None and base[fi] is not None:
            bx, by, bw, bh = base[fi]
            t.append([bx + rng.randn() * jitter, by + rng.randn() * jitter,
                      max(bw + rng.randn() * jitter, 5),
                      max(bh + rng.randn() * jitter, 5)])
        else:
            t.append([x + fi, y + fi * 0.5, w, h])
    return t


def _blink_events(rng, f, n):
    ev = []
    for _ in range(n):
        s = int(rng.randint(0, max(f - 4, 1)))
        e = s + int(rng.randint(1, 4))
        ev.append([s, min(e, f - 1)])
    return ev


def _make_case(seed, num_videos=4, cats=(1,), with_blinks=True, frames=20):
    rng = np.random.RandomState(seed)
    gt_anns, dt_anns = [], []
    gid = 0
    did = 0
    for vid in range(1, num_videos + 1):
        for cat in cats:
            for _ in range(rng.randint(1, 3)):
                gid += 1
                track = _track(rng, frames)
                ann = dict(id=gid, video_id=vid, category_id=cat,
                           bboxes=track)
                # reference accumulate() reads gt['blinks'] /
                # dt['blinks_converted'] unconditionally (:444-445) —
                # non-blink runs need (empty) fields
                ann['blinks'] = (_blink_events(rng, frames,
                                               rng.randint(1, 4))
                                 if with_blinks else [])
                gt_anns.append(ann)
                # a matching detection (jittered) with high score
                did += 1
                dt = dict(id=did, video_id=vid, category_id=cat,
                          score=float(0.6 + 0.4 * rng.rand()),
                          bboxes=_track(rng, frames, base=track, jitter=3.0,
                                        none_prob=0.05))
                if with_blinks:
                    ev = [[max(s - rng.randint(0, 2), 0),
                           min(e + rng.randint(0, 2), frames - 1),
                           float(rng.rand())]
                          for s, e in ann['blinks'][:rng.randint(1, len(
                              ann['blinks']) + 1)]]
                    dt['blinks_converted'] = ev
                else:
                    dt['blinks_converted'] = []
                dt_anns.append(dt)
            # a noise detection
            did += 1
            dt = dict(id=did, video_id=vid, category_id=cat,
                      score=float(rng.rand() * 0.5),
                      bboxes=_track(rng, frames))
            dt['blinks_converted'] = ([[3, 6, float(rng.rand())]]
                                      if with_blinks else [])
            dt_anns.append(dt)
    for d in dt_anns:
        areas = [b[2] * b[3] for b in d['bboxes'] if b]
        d['avg_area'] = float(np.mean(areas)) if areas else 0.0
    return gt_anns, dt_anns, list(range(1, num_videos + 1)), list(cats)


def _ours_maps(gt_anns, dt_anns):
    gt_map, dt_map = {}, {}
    for a in gt_anns:
        gt_map.setdefault((a['video_id'], a['category_id']), []).append(
            dict(id=a['id'], track=a['bboxes']))
    for a in dt_anns:
        dt_map.setdefault((a['video_id'], a['category_id']), []).append(
            dict(id=a['id'], score=a['score'], track=a['bboxes']))
    return gt_map, dt_map


def _run_reference(ref_eval_cls, gt_anns, dt_anns, vids, cats):
    E = ref_eval_cls(DuckCoco(gt_anns, vids, cats),
                     DuckCoco(dt_anns, vids, cats), iouType='bbox')
    E.evaluate()
    E.accumulate()
    prec = E.eval['precision'][:, :, :, 0, 2]   # area all, maxDets 100
    rec = E.eval['recall'][:, :, 0, 2]
    mAP = prec[prec > -1].mean()
    ap50 = prec[0][prec[0] > -1].mean()
    ap75 = prec[5][prec[5] > -1].mean()
    ar = rec[rec > -1].mean()
    return E, float(mAP), float(ap50), float(ap75), float(ar)


@pytest.mark.parametrize('seed,cats,blinks', [
    (0, (1,), True), (1, (1, 2, 3), False), (2, (1,), True)])
def test_track_ap_matches_reference(ref_eval_cls, seed, cats, blinks):
    gt_anns, dt_anns, vids, cat_ids = _make_case(seed, cats=cats,
                                                 with_blinks=blinks)
    _E, mAP, ap50, ap75, ar = _run_reference(ref_eval_cls, gt_anns,
                                             dt_anns, vids, cat_ids)
    gt_map, dt_map = _ours_maps(gt_anns, dt_anns)
    ours = te.evaluate_tracks(gt_map, dt_map)
    np.testing.assert_allclose(ours['mAP'], mAP, atol=1e-8)
    np.testing.assert_allclose(ours['AP50'], ap50, atol=1e-8)
    np.testing.assert_allclose(ours['AP75'], ap75, atol=1e-8)
    np.testing.assert_allclose(ours['AR'], ar, atol=1e-8)


def test_blink_action_ap_matches_reference(ref_eval_cls):
    import pandas as pd
    gt_anns, dt_anns, vids, cat_ids = _make_case(3, with_blinks=True)
    E, *_ = _run_reference(ref_eval_cls, gt_anns, dt_anns, vids, cat_ids)
    gt_map, dt_map = _ours_maps(gt_anns, dt_anns)
    gt_ev = {a['id']: [tuple(e) for e in a['blinks']] for a in gt_anns}
    dt_ev = {a['id']: [tuple(e) for e in a['blinks_converted']]
             for a in dt_anns}
    ours = te.mpeblink_blink_ap(gt_map, dt_map, gt_ev, dt_ev)
    # reference: blink_eval_info entries 0..9 are (cat 1, area all,
    # iou .5 .. .95); compute its action AP per entry
    for idx, thr in enumerate(te.IOU_THRS):
        config = E.blink_eval_info[idx]
        assert abs(config['iou'] - thr) < 1e-9
        gt_rows = [[i['gt_ID'], e[0], e[1]]
                   for i in config['gt_data'] for e in i['blinks']]
        dt_rows = [[i['gt_ID'], e[0], e[1], e[2]]
                   for i in config['dt_data'] for e in i['blinks']]
        if not gt_rows:
            continue
        gt_df = pd.DataFrame(dict(
            **{'video-id': [r[0] for r in gt_rows],
               't-start': [r[1] for r in gt_rows],
               't-end': [r[2] for r in gt_rows]}))
        dt_df = pd.DataFrame(dict(
            **{'video-id': [r[0] for r in dt_rows],
               't-start': [r[1] for r in dt_rows],
               't-end': [r[2] for r in dt_rows],
               'score': [r[3] for r in dt_rows]}))
        want = E.compute_average_precision_detection(gt_df, dt_df)
        np.testing.assert_allclose(ours[float(thr)], want, atol=1e-8,
                                   err_msg=f'iou {thr}')


def test_blinks_to_events_roundtrip():
    probs = [0.1, 0.8, 0.9, 0.2, 0.7, 0.7, 0.7, 0.1]
    ev = te.blinks_to_events(probs, 0.5)
    assert ev == [(1, 2, pytest.approx(0.85)),
                  (4, 6, pytest.approx(0.7))]
    assert te.blinks_to_events([0.9, 0.9], 0.5) == [
        (0, 1, pytest.approx(0.9))]
    assert te.blinks_to_events([0.1], 0.5) == []
