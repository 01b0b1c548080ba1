"""Native C++ clip loader vs the pure-Python transforms path: outputs must
match bitwise-near-exactly (same OpenCV underneath)."""
import os.path as osp

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from mcgaze_tpu.data import transforms as T
from mcgaze_tpu.data.native_loader import NativeClipLoader, native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason='native loader not built')


@pytest.fixture(scope='module')
def frames_on_disk(tmp_path_factory):
    d = tmp_path_factory.mktemp('frames')
    rng = np.random.RandomState(7)
    paths, imgs = [], []
    for i, (h, w) in enumerate([(120, 90), (64, 200), (224, 224)]):
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        p = str(d / f'{i}.png')
        cv2.imwrite(p, img)
        paths.append(p)
        imgs.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
    return paths, imgs


@pytest.mark.parametrize('crop,flip', [(None, False), (0.8, False),
                                       (0.68, True)])
def test_native_matches_python(frames_on_disk, crop, flip):
    paths, imgs = frames_on_disk
    scale, canvas = (224, 224), (224, 224)
    loader = NativeClipLoader(n_threads=2)
    out, meta = loader.load(paths, [crop] * len(paths),
                            [flip] * len(paths), scale, canvas)
    params = T.ClipParams(crop_ratio=crop, flip=flip)
    for i, img in enumerate(imgs):
        ref = T.process_frame(img, params, scale, canvas)
        np.testing.assert_allclose(out[i], ref['img'], atol=1e-5)
        nh, nw = ref['img_shape']
        assert (meta[i, 4], meta[i, 5]) == (nh, nw)
        assert (meta[i, 0], meta[i, 1]) == img.shape[:2]


def test_native_missing_file_raises(frames_on_disk):
    paths, _ = frames_on_disk
    loader = NativeClipLoader(n_threads=2)
    with pytest.raises(FileNotFoundError):
        loader.load([paths[0], '/nonexistent/x.png'], None, None,
                    (224, 224), (224, 224))


def test_native_large_batch_threads(frames_on_disk):
    paths, imgs = frames_on_disk
    loader = NativeClipLoader(n_threads=8)
    big = paths * 20
    out, meta = loader.load(big, None, None, (224, 224), (224, 224))
    assert out.shape == (60, 224, 224, 3)
    # spot check element 45 equals the python path for the same file
    ref = T.process_frame(imgs[45 % 3], T.ClipParams(), (224, 224),
                          (224, 224))
    np.testing.assert_allclose(out[45], ref['img'], atol=1e-5)
