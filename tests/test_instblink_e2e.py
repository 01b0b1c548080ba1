"""The query family's pipelined e2e eval path (round-4 verdict weak #2):
run_videos_from_paths (C++ pool decode -> u8 ship -> multi-device
round-robin -> one packed readback per video) must produce exactly the
serial python path's results (per-frame cv2 decode, host f32 normalize,
per-window forward with immediate np readback — the round-4
tools/test_instblink.py flow, kept here as the golden twin).
"""
import jax
import numpy as np
import pytest

from mcgaze_tpu.data.instblink_dataset import (InstBlinkClipDataset,
                                               InstBlinkDataConfig)
from mcgaze_tpu.evaluation.forward import (bind_query_forward,
                                           make_query_eval_forward)
from mcgaze_tpu.evaluation.instblink_driver import (InstBlinkEvalConfig,
                                                    InstBlinkVideoEvaluator)
from mcgaze_tpu.models.query_detector import (QueryDetectorConfig,
                                              init_query_model)
from tests.test_instblink_data import tiny_mpeblink  # noqa: F401

TINY = QueryDetectorConfig(
    num_stages=2, clip_length=5, num_queries=10, num_classes=1,
    channels=32, ffn_channels=64, num_heads=4, dyn_feat_channels=16,
    max_per_img=4, max_instances=3, roi_impl='mm')


def _data_cfg(ann, prefix, keep_ratio):
    return InstBlinkDataConfig(
        ann_file=ann, img_prefix=prefix, clip_length=5, scale=(64, 48),
        canvas=(64, 64), batch_size=2, max_instances=3,
        keep_ratio=keep_ratio)


def _assert_results_close(a, b, tol=5e-3):
    """Structure/None-pattern exact, floats at tol: the u8-ship path's
    on-device normalize differs from host numpy by 1 ULP (XLA folds the
    /std into a reciprocal multiply), which reaches ~2e-4 px in decoded
    boxes (exp amplification in the delta coder) and ~1e-8 in scores;
    everything else must match."""
    assert len(a) == len(b)
    for va, vb in zip(a, b):
        assert len(va) == len(vb)
        for ta, tb in zip(va, vb):
            assert set(ta) == set(tb)
            assert ta['video_id'] == tb['video_id']
            assert ta['category_id'] == tb['category_id']
            assert abs(ta['score'] - tb['score']) <= tol
            for fa, fb in zip(ta['bboxes'], tb['bboxes']):
                assert (fa is None) == (fb is None)
                if fa is not None:
                    np.testing.assert_allclose(fa, fb, atol=tol)
            if 'blink_scores' in ta:
                np.testing.assert_allclose(ta['blink_scores'],
                                           tb['blink_scores'], atol=tol)
                # event (start, end, confidence): frame indices exact,
                # confidence is a mean of the ULP-shifted scores
                assert len(ta['blinks_converted']) == \
                    len(tb['blinks_converted'])
                for ea, eb in zip(ta['blinks_converted'],
                                  tb['blinks_converted']):
                    assert list(ea[:2]) == list(eb[:2])
                    assert abs(ea[2] - eb[2]) <= tol


def _serial_results(ds, forward, ecfg, vids):
    """The round-4 flow: python decode, host f32 normalize, run_video."""
    import cv2

    from mcgaze_tpu.data import transforms as T
    out = []
    for vid_id in vids:
        imgs, whwh, sfs = [], [], []
        for p in ds.video_paths(vid_id):
            img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
            rimg, _b, sf = ds._resize(img, None)
            h, w = rimg.shape[:2]
            imgs.append(T.pad_to_canvas(T.normalize(rimg),
                                        ds.cfg.canvas))
            whwh.append([w, h, w, h])
            sfs.append(sf)
        ev = InstBlinkVideoEvaluator(forward, ecfg)
        out.append(ev.run_video(np.stack(imgs),
                                np.asarray(whwh, np.float32),
                                np.asarray(sfs, np.float32), vid_id))
    return out


@pytest.mark.parametrize('keep_ratio', [True, False])
def test_pipelined_e2e_matches_serial(tiny_mpeblink, keep_ratio):  # noqa: F811
    ann, prefix = tiny_mpeblink
    dc = _data_cfg(ann, prefix, keep_ratio)
    ds = InstBlinkClipDataset(dc)
    model, variables = init_query_model(TINY, jax.random.PRNGKey(0),
                                        image_size=dc.canvas)
    fwd, fwd_batched = make_query_eval_forward(model, TINY)
    forward = bind_query_forward(fwd, fwd_batched, variables)
    ecfg = InstBlinkEvalConfig(clip_length=5, overlap=2, max_per_img=4,
                               clip_batch=2)

    vids = ds.api.get_vid_ids()
    serial = _serial_results(ds, forward, ecfg, vids)

    ev = InstBlinkVideoEvaluator(forward, ecfg, data_cfg=dc)
    piped = list(ev.run_videos_from_paths(
        (vid_id, ds.video_paths(vid_id)) for vid_id in vids))

    # >1 virtual device received work (round-robin across the 8-CPU mesh)
    assert len(jax.local_devices()) == 8
    _assert_results_close(piped, serial)


def test_u8_ship_matches_f32(tiny_mpeblink):  # noqa: F811
    """ship_uint8=False (native f32 path) == default u8 path exactly."""
    ann, prefix = tiny_mpeblink
    dc = _data_cfg(ann, prefix, keep_ratio=False)
    ds = InstBlinkClipDataset(dc)
    model, variables = init_query_model(TINY, jax.random.PRNGKey(0),
                                        image_size=dc.canvas)
    fwd, fwd_batched = make_query_eval_forward(model, TINY)
    forward = bind_query_forward(fwd, fwd_batched, variables)
    vids = ds.api.get_vid_ids()
    pairs = [(v, ds.video_paths(v)) for v in vids]

    a = list(InstBlinkVideoEvaluator(
        forward, InstBlinkEvalConfig(clip_length=5, overlap=2,
                                     max_per_img=4, ship_uint8=True),
        data_cfg=dc).run_videos_from_paths(iter(pairs)))
    b = list(InstBlinkVideoEvaluator(
        forward, InstBlinkEvalConfig(clip_length=5, overlap=2,
                                     max_per_img=4, ship_uint8=False),
        data_cfg=dc).run_videos_from_paths(iter(pairs)))
    _assert_results_close(a, b)


def test_query_train_u8_batches_match_f32(tiny_mpeblink):  # noqa: F811
    """InstBlinkDataConfig.ship_uint8 + the step's device_normalize ==
    host-normalized f32 batches (loss within the normalize-fold ULP)."""
    from mcgaze_tpu.train.loop import OptimConfig
    from mcgaze_tpu.train.query_loop import (create_query_train_state,
                                             make_query_train_step)

    ann, prefix = tiny_mpeblink
    losses = []
    for ship in (False, True):
        dc = InstBlinkDataConfig(
            ann_file=ann, img_prefix=prefix, clip_length=5,
            scale=(64, 48), canvas=(64, 64), batch_size=2,
            max_instances=3, ship_uint8=ship)
        ds = InstBlinkClipDataset(dc, seed=3)
        batch = next(ds.batches(seed=4))
        assert batch['imgs'].dtype == (np.uint8 if ship else np.float32)
        state = create_query_train_state(TINY, OptimConfig(),
                                         jax.random.PRNGKey(0),
                                         image_size=dc.canvas)
        step = make_query_train_step(TINY, OptimConfig())
        _state, logs = step(state, batch)
        losses.append(float(logs['loss']))
    assert losses[0] == pytest.approx(losses[1], rel=1e-4)


def test_python_fallback_decode_matches_native(tiny_mpeblink,  # noqa: F811
                                               monkeypatch):
    """_decode_video's cv2/python fallback (no .so) must produce the
    native C++ pool's exact arrays, for both resize modes."""
    ann, prefix = tiny_mpeblink
    for keep_ratio in (True, False):
        dc = _data_cfg(ann, prefix, keep_ratio)
        ds = InstBlinkClipDataset(dc)
        paths = ds.video_paths(1)
        ev = InstBlinkVideoEvaluator(lambda i, w: None,
                                     InstBlinkEvalConfig(ship_uint8=False),
                                     data_cfg=dc)
        native = ev._decode_video(paths)
        ev_py = InstBlinkVideoEvaluator(lambda i, w: None,
                                        InstBlinkEvalConfig(
                                            ship_uint8=False),
                                        data_cfg=dc)
        ev_py._native = False            # force the python path
        py = ev_py._decode_video(paths)
        for a, b in zip(native, py):
            np.testing.assert_allclose(a, b, atol=1e-5)
