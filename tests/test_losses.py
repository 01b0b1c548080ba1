"""Loss goldens vs torch re-derivations of the reference formulas
(focal: mmdet/models/losses/focal_loss.py:13-59; arccos:
gaze_arccos_loss.py:56-66; temp: gaze_temp_loss.py:57-66)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mcgaze_tpu.ops import losses


def torch_focal(pred, target_onehot, gamma=2.0, alpha=0.25):
    p = pred.sigmoid()
    t = target_onehot.float()
    pt = (1 - p) * t + p * (1 - t)
    fw = (alpha * t + (1 - alpha) * (1 - t)) * pt.pow(gamma)
    return F.binary_cross_entropy_with_logits(pred, t, reduction='none') * fw


def test_focal_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(48, 1).astype(np.float32) * 3
    pos = (rng.rand(48, 1) > 0.5).astype(np.float32)
    num_pos = pos.sum()
    ours = float(losses.sigmoid_focal_loss(logits, pos, avg_factor=num_pos))
    ref = torch_focal(torch.from_numpy(logits),
                      torch.from_numpy(pos)).sum().item() / num_pos
    assert ours == pytest.approx(ref, rel=1e-5)


def test_l1_and_giou_masked_equals_gathered():
    rng = np.random.RandomState(1)
    n = 40
    pred = rng.uniform(0, 100, (n, 4)).astype(np.float32)
    pred[:, 2:] += pred[:, :2]
    tgt = pred + rng.uniform(-5, 5, (n, 4)).astype(np.float32)
    mask = (rng.rand(n) > 0.4).astype(np.float32)
    af = mask.sum()

    ours_l1 = float(losses.l1_loss(pred, tgt, mask[:, None], avg_factor=af))
    ref_l1 = np.abs(pred - tgt)[mask > 0].sum() / af
    assert ours_l1 == pytest.approx(float(ref_l1), rel=1e-5)

    ours_giou = float(losses.giou_loss(pred, tgt, mask, avg_factor=af))
    from mcgaze_tpu.geometry import giou
    ref_giou = (1 - np.asarray(giou(pred, tgt)))[mask > 0].sum() / af
    assert ours_giou == pytest.approx(float(ref_giou), rel=1e-5)


def test_arccos_matches_torch_gather_then_mean():
    rng = np.random.RandomState(2)
    n = 30
    pred = rng.randn(n, 3).astype(np.float32)
    pred /= np.linalg.norm(pred, axis=1, keepdims=True)
    tgt = rng.randn(n, 3).astype(np.float32)
    tgt /= np.linalg.norm(tgt, axis=1, keepdims=True)
    mask = (rng.rand(n) > 0.3).astype(np.float32)

    ours = float(losses.arccos_gaze_loss(pred, tgt, mask))
    p = torch.from_numpy(pred[mask > 0])
    t = torch.from_numpy(tgt[mask > 0])
    sim = F.cosine_similarity(p, t, dim=-1, eps=1e-6)
    sim = F.hardtanh(sim, -1.0 + 1e-6, 1.0 - 1e-6)
    ref = torch.acos(sim).mean().item()
    assert ours == pytest.approx(ref, rel=1e-4)


def test_cos_matches_torch_gather_then_mean():
    """Reference GazeCosLoss.forward: cos = sum(pred*target) clamped to
    [-1, 1], loss = (1 - cos).mean() over the gathered positive rows."""
    rng = np.random.RandomState(4)
    n = 30
    pred = rng.randn(n, 3).astype(np.float32)
    pred /= np.linalg.norm(pred, axis=1, keepdims=True)
    tgt = rng.randn(n, 3).astype(np.float32)
    tgt /= np.linalg.norm(tgt, axis=1, keepdims=True)
    mask = (rng.rand(n) > 0.3).astype(np.float32)

    ours = float(losses.cos_gaze_loss(pred, tgt, mask))
    p = torch.from_numpy(pred[mask > 0])
    t = torch.from_numpy(tgt[mask > 0])
    cos = torch.sum(p * t, dim=-1)
    cos[cos > 1] = 1
    cos[cos < -1] = -1
    ref = (1 - cos).mean().item()
    assert ours == pytest.approx(ref, rel=1e-5)


def test_pinball_matches_torch_formula():
    """Reference GazePinballLoss.forward with q1=0.1:
    loss = mean(max(.1*q10, -.9*q10)) + mean(max(.9*q90, -.1*q90)),
    q10 = target - (pred - var), q90 = target - (pred + var)."""
    rng = np.random.RandomState(5)
    n = 24
    pred = rng.randn(n, 3).astype(np.float32)
    tgt = rng.randn(n, 3).astype(np.float32)
    var = np.abs(rng.randn(n, 3)).astype(np.float32) * 0.2
    mask = (rng.rand(n) > 0.3).astype(np.float32)

    ours = float(losses.pinball_gaze_loss(pred, tgt, mask, var=var))
    p = torch.from_numpy(pred[mask > 0])
    t = torch.from_numpy(tgt[mask > 0])
    v = torch.from_numpy(var[mask > 0])
    q1, q9 = 0.1, 0.9
    q_10 = t - (p - v)
    q_90 = t - (p + v)
    loss_10 = torch.max(q1 * q_10, (q1 - 1) * q_10).mean()
    loss_90 = torch.max(q9 * q_90, (q9 - 1) * q_90).mean()
    ref = (loss_10 + loss_90).item()
    assert ours == pytest.approx(ref, rel=1e-5)


def test_pinball_zero_var_is_l1_mean():
    rng = np.random.RandomState(6)
    pred = rng.randn(10, 3).astype(np.float32)
    tgt = rng.randn(10, 3).astype(np.float32)
    mask = np.ones(10, np.float32)
    ours = float(losses.pinball_gaze_loss(pred, tgt, mask))
    assert ours == pytest.approx(float(np.abs(pred - tgt).mean()), rel=1e-5)


def test_fully_masked_gaze_losses_are_zero():
    pred = np.ones((6, 3), np.float32)
    tgt = np.ones((6, 3), np.float32) * 0.5
    mask = np.zeros(6, np.float32)
    for name, fn in losses.GAZE_LOSSES.items():
        assert float(fn(pred, tgt, mask)) == 0.0, name


def test_temporal_matches_torch():
    rng = np.random.RandomState(3)
    b, t = 4, 7
    pred = rng.randn(b, t, 3).astype(np.float32)
    ours = float(losses.temporal_gaze_loss(pred))
    p = torch.from_numpy(pred)
    loss = torch.zeros(b, t)
    loss[:, 0] = torch.sum(torch.abs(2 * p[:, 0] - 2 * p[:, 1]), dim=-1)
    loss[:, -1] = torch.sum(torch.abs(2 * p[:, -1] - 2 * p[:, -2]), dim=-1)
    loss[:, 1:-1] = torch.sum(
        torch.abs(2 * p[:, 1:-1] - p[:, 2:] - p[:, :-2]), dim=-1)
    assert ours == pytest.approx(loss.mean().item(), rel=1e-5)
