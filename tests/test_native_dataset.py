"""Native-loader batch path vs pure-Python batch path: identical streams
(same RNG draws, same geometry, same pixels — OpenCV is shared)."""
import numpy as np
import pytest

from mcgaze_tpu.data.dataset import DataConfig, Gaze360ClipDataset
from mcgaze_tpu.data.native_loader import native_available
from tests.test_data_and_driver import make_dataset

pytestmark = pytest.mark.skipif(not native_available(),
                                reason='native loader not built')


@pytest.fixture(scope='module')
def cfg_on_disk(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('gaze360n'))
    ann, prefix = make_dataset(root)
    return DataConfig(ann_file=ann, img_prefix=prefix, clip_length=7,
                      scale=(32, 32), canvas=(32, 32), crop_size=0.68,
                      flip_ratio=0.5, batch_size=2)


def test_native_batches_match_python(cfg_on_disk):
    # like-for-like f32 pipelines (ship_uint8 defaults ON and only the
    # native loader honors it; its equality proof is the dedicated
    # test_ship_uint8_train_batches_match_f32 below)
    import dataclasses
    cfg = dataclasses.replace(cfg_on_disk, ship_uint8=False)
    ds_native = Gaze360ClipDataset(cfg, seed=3, use_native=True)
    ds_python = Gaze360ClipDataset(cfg, seed=3, use_native=False)
    assert ds_native._native is not None and ds_python._native is None
    it_n = ds_native.batches(seed=5)
    it_p = ds_python.batches(seed=5)
    for _ in range(3):
        bn, bp = next(it_n), next(it_p)
        assert set(bn) == set(bp)
        for k in bp:
            np.testing.assert_allclose(bn[k], bp[k], atol=1e-5,
                                       err_msg=k)


def test_geometry_matches_full_pipeline(cfg_on_disk):
    from mcgaze_tpu.data import transforms as T
    ds = Gaze360ClipDataset(cfg_on_disk, seed=0, use_native=False)
    for params in (T.ClipParams(None, False), T.ClipParams(0.75, True)):
        vid_id, frame = ds.index[4]
        boxes, valid, gazes = ds._frame_gt(vid_id, frame)
        img = ds._load_image(vid_id, frame)
        full = T.process_frame(img, params, ds.cfg.scale, ds.cfg.canvas,
                               boxes=boxes.copy(), valid=valid.copy(),
                               gazes=gazes.copy())
        geo = T.process_frame_geometry(img.shape[:2], params, ds.cfg.scale,
                                       boxes=boxes.copy(),
                                       valid=valid.copy(),
                                       gazes=gazes.copy())
        assert geo['ok'] == full['ok']
        assert geo['img_shape'] == full['img_shape']
        np.testing.assert_allclose(geo['whwh'], full['whwh'])
        np.testing.assert_allclose(geo['boxes'], full['boxes'])
        np.testing.assert_allclose(geo['valid'], full['valid'])
        np.testing.assert_allclose(geo['gazes'], full['gazes'])


def test_ship_uint8_eval_matches_f32(cfg_on_disk):
    """ship_uint8 path (raw uint8 + in-forward normalization) must score
    identically to the default f32 path."""
    import json as _json
    import os.path as osp

    from mcgaze_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
    from mcgaze_tpu.evaluation.driver import EvalConfig, VideoGazeEvaluator

    video = _json.load(open(cfg_on_disk.ann_file))['videos'][0]
    paths = [osp.join(cfg_on_disk.img_prefix, n)
             for n in video['file_names']]

    def forward(imgs, whwh, t):
        imgs = np.asarray(imgs)
        if imgs.dtype == np.uint8:      # mirrors build_forward's in-jit step
            imgs = (imgs.astype(np.float32) - IMAGENET_MEAN) / IMAGENET_STD
            hh, ww = imgs.shape[1], imgs.shape[2]
            xx = np.arange(ww)[None, None, :]
            yy = np.arange(hh)[None, :, None]
            valid = ((xx < np.asarray(whwh)[:, 0, None, None]) &
                     (yy < np.asarray(whwh)[:, 1, None, None]))
            imgs = imgs * valid[..., None]
        k = imgs.shape[0]
        boxes = np.tile(np.asarray([[2., 2., 8., 8.]], np.float32),
                        (k, 3, 1)).reshape(k, 3, 4)
        scores = np.full((k, 3), 0.9, np.float32)
        g = imgs.mean(axis=(1, 2))
        g = g / np.linalg.norm(g, axis=-1, keepdims=True)
        return boxes, scores, dict(fusion=g, face=g, eyes=g, head=g)

    # the u8 fast path additionally requires the forward to declare it
    # normalizes uint8 itself (bind_forward sets this on the real CLIs)
    forward.accepts_uint8 = True

    base = dict(scale=(32, 32), canvas=(32, 32), crop_ratio=0.84,
                clip_batch=2)
    a = VideoGazeEvaluator(forward, EvalConfig(ship_uint8=False, **base)) \
        .run_video_from_paths(paths, video['id'])
    b = VideoGazeEvaluator(forward, EvalConfig(ship_uint8=True, **base)) \
        .run_video_from_paths(paths, video['id'])
    # the flag + declaration actually routed u8 (guard against silently
    # falling back to f32 and passing trivially)
    imgs, _, _, _ = VideoGazeEvaluator(
        forward, EvalConfig(ship_uint8=True, **base))._decode_video(
            paths, video['id'])
    assert np.asarray(imgs).dtype == np.uint8
    np.testing.assert_allclose(np.asarray(a['fusion_gazes']),
                               np.asarray(b['fusion_gazes']), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray([x or [0] * 4 for x in a['head_bboxes']]),
        np.asarray([x or [0] * 4 for x in b['head_bboxes']]), atol=1e-4)


def test_native_u8_pixels_roundtrip(cfg_on_disk):
    """load_u8 returns the exact resized pixels load() normalized."""
    import json as _json
    import os.path as osp

    from mcgaze_tpu.data.native_loader import NativeClipLoader
    from mcgaze_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    video = _json.load(open(cfg_on_disk.ann_file))['videos'][0]
    paths = [osp.join(cfg_on_disk.img_prefix, n)
             for n in video['file_names']][:4]
    loader = NativeClipLoader(n_threads=2)
    f32, meta_a = loader.load(paths, None, None, (32, 32), (32, 32))
    u8, meta_b = loader.load_u8(paths, None, None, (32, 32), (32, 32))
    np.testing.assert_array_equal(meta_a, meta_b)
    renorm = (u8.astype(np.float32) - IMAGENET_MEAN) / IMAGENET_STD
    # padded region: f32 path wrote 0.0, u8 path wrote pixel 0 -> only
    # compare the valid region
    nh, nw = meta_a[0, 4], meta_a[0, 5]
    np.testing.assert_allclose(renorm[:, :nh, :nw], f32[:, :nh, :nw],
                               atol=1e-5)


def test_ship_uint8_train_batches_match_f32(cfg_on_disk):
    """DataConfig.ship_uint8 (raw u8 training batches + in-step
    normalization, train/loop.py::loss_fn -> device_normalize) must
    produce the f32 pipeline's exact batch: same GT arrays, and
    device_normalize(u8) == the host-normalized f32 frames."""
    import dataclasses

    import jax.numpy as jnp

    from mcgaze_tpu.evaluation.forward import device_normalize

    if not native_available():
        pytest.skip('native loader unavailable')
    ds_f32 = Gaze360ClipDataset(
        dataclasses.replace(cfg_on_disk, ship_uint8=False), seed=3)
    ds_u8 = Gaze360ClipDataset(
        dataclasses.replace(cfg_on_disk, ship_uint8=True), seed=3)
    a = next(ds_f32.batches(batch_size=2, seed=9))
    b = next(ds_u8.batches(batch_size=2, seed=9))
    assert b['imgs'].dtype == np.uint8
    for k in ('img_whwh', 'gt_boxes', 'gt_valid', 'gt_gazes'):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    bs, t = b['imgs'].shape[:2]
    norm = device_normalize(
        jnp.asarray(b['imgs'].reshape(bs * t, *b['imgs'].shape[2:])),
        jnp.asarray(b['img_whwh'].reshape(bs * t, 4)))
    np.testing.assert_allclose(
        np.asarray(norm),
        a['imgs'].reshape(bs * t, *a['imgs'].shape[2:]), atol=1e-5)
