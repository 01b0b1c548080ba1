"""Eval-math goldens vs torch ports of the reference scorers
(tools/calculate_mae_gaze360.py)."""
import math

import numpy as np
import pytest
import torch

from mcgaze_tpu.evaluation import mae


def torch_smooth_filter(inp, alpha=0.6):
    if inp.size(0) >= 2:
        out = alpha * inp
        out[0, :] += (1 - alpha) * inp[1, :]
        out[-1, :] += (1 - alpha) * inp[-2, :]
        out[1:-1, :] += (1 - alpha) * (inp[0:-2, :] + inp[2:, :]) / 2
        out = out / torch.norm(out, dim=1).unsqueeze(1)
    else:
        out = inp
    return out


def torch_angular_error(inp, target):
    target = target / torch.norm(target, dim=1).unsqueeze(1)
    dots = torch.bmm(target.view(-1, 1, 3), inp.view(-1, 3, 1)).view(-1)
    return (180 * torch.mean(torch.acos(dots)) / math.pi).item()


def unit(rng, n):
    v = rng.randn(n, 3)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def test_smooth_filter_matches():
    rng = np.random.RandomState(0)
    x = unit(rng, 25).astype(np.float32)
    ours = mae.smooth_filter(x)
    ref = torch_smooth_filter(torch.from_numpy(x.copy())).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
    # short track passthrough
    one = unit(rng, 1)
    np.testing.assert_allclose(mae.smooth_filter(one), one)


def test_angular_error_matches():
    rng = np.random.RandomState(1)
    p = unit(rng, 50).astype(np.float32)
    t = unit(rng, 50).astype(np.float32)
    ours = mae.mean_angular_error_deg(p, t)
    ref = torch_angular_error(torch.from_numpy(p), torch.from_numpy(t))
    assert ours == pytest.approx(ref, abs=1e-3)


def test_gaze_error_buckets():
    rng = np.random.RandomState(2)
    # two synthetic videos, predictions = gt rotated by a known angle
    videos, annos = [], []
    expected_err = 5.0  # degrees
    for vid in range(2):
        n = 20
        yaw = rng.uniform(-math.pi, math.pi, n)
        pitch = rng.uniform(-0.5, 0.5, n)
        gt = np.stack([np.cos(pitch) * np.sin(yaw), np.sin(pitch),
                       -np.cos(pitch) * np.cos(yaw)], 1)
        # rotate each gt by expected_err degrees around y-axis approx:
        th = math.radians(expected_err)
        rot = np.array([[math.cos(th), 0, math.sin(th)], [0, 1, 0],
                        [-math.sin(th), 0, math.cos(th)]])
        pred = gt @ rot.T
        videos.append({'fusion_gazes': pred.tolist()})
        annos.append({'gaze': gt.tolist()})
    res = mae.gaze_error(videos, {'annotations': annos}, smooth=False)
    # rotation around y changes direction by <= expected_err; front-90
    # bucket must exist and errors be <= the rotation angle
    assert 0 < res['front90'] <= expected_err + 1e-6
    assert 0 < res['mae360'] <= expected_err + 1e-6
    assert res['frames'] == 40


def test_l2cs_indexing_and_pitch_bucket():
    gt = [[0.0, 0.0, -1.0]] * 4
    annos = [{'gaze': [[1, 0, 0]] * 4}, {'gaze': [[0, 1, 0]] * 4},
             {'gaze': [[0, 0, 1]] * 4}, {'gaze': gt}]
    videos = [{'fusion_gazes': gt}]
    # l2cs=True reads annotation row anno_id*3 = 0
    res = mae.gaze_error(videos, {'annotations': annos}, smooth=False,
                         l2cs=True)
    assert res['mae360'] == pytest.approx(90.0, abs=1e-4)


def test_device_scorer_matches_numpy():
    """evaluation/mae_device.py (jitted f32, all videos in one program)
    vs the float64 numpy scorer: every bucket within 1e-3 deg, frame
    counts exact — covers smoothing edges, a length-1 video (the T<2
    passthrough), the l2cs pitch bucket, and no-smooth."""
    from mcgaze_tpu.evaluation.mae_device import gaze_error_device

    rng = np.random.RandomState(5)
    videos, annos = [], []
    for n in (7, 1, 12):        # incl. a single-frame video
        gt = rng.randn(n, 3)
        gt /= np.linalg.norm(gt, axis=1, keepdims=True)
        noise = rng.randn(n, 3) * 0.05
        pred = gt + noise
        pred /= np.linalg.norm(pred, axis=1, keepdims=True)
        videos.append({'fusion_gazes': pred.tolist()})
        annos.append({'gaze': gt.tolist()})
    anno_data = {'annotations': annos}

    for smooth in (True, False):
        a = mae.gaze_error(videos, anno_data, smooth=smooth)
        b = gaze_error_device(videos, anno_data, smooth=smooth)
        assert b['frames'] == a['frames']
        for k in ('mae360', 'front90', 'front20'):
            assert b[k] == pytest.approx(a[k], abs=1e-3), (smooth, k)

    # l2cs layout: 3 annotation rows per video, pitch<=20 extra bucket
    annos3 = []
    for a_ in annos:
        annos3.extend([a_, {'gaze': [[1, 0, 0]] * 1},
                       {'gaze': [[0, 1, 0]] * 1}])
    va = mae.gaze_error(videos, {'annotations': annos3}, l2cs=True)
    vb = gaze_error_device(videos, {'annotations': annos3}, l2cs=True)
    for k in ('mae360', 'front90', 'front20'):
        assert vb[k] == pytest.approx(va[k], abs=1e-3), k
