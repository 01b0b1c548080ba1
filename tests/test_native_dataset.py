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
    ds_native = Gaze360ClipDataset(cfg_on_disk, seed=3, use_native=True)
    ds_python = Gaze360ClipDataset(cfg_on_disk, seed=3, use_native=False)
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
