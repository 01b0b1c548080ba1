"""Clip-level Hungarian matcher (train/hungarian.py) vs scipy + golden
semantics of the target scatter.

The jittable solver must agree with scipy.optimize.linear_sum_assignment
(the exact routine the reference calls on CPU,
inference_hungarian_assigner.py:188-192) on the same cost matrices.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from mcgaze_tpu.train.hungarian import (PAD_COST, clip_cost_matrix,
                                        clip_targets_from_match,
                                        focal_cls_cost, hungarian,
                                        match_clip)


@pytest.mark.parametrize('m,n,seed', [(3, 100, 0), (1, 100, 1), (8, 100, 2),
                                      (5, 5, 3), (16, 100, 4), (2, 7, 5)])
def test_hungarian_matches_scipy(m, n, seed):
    rng = np.random.RandomState(seed)
    cost = rng.randn(m, n).astype(np.float32) * 10
    ours = np.asarray(jax.jit(hungarian)(jnp.asarray(cost)))
    rows, cols = linear_sum_assignment(cost)
    # continuous random costs -> unique optimum almost surely
    assert sorted(ours.tolist()) == sorted(set(ours.tolist())), 'not distinct'
    np.testing.assert_array_equal(np.sort(rows), np.arange(m))
    got = cost[np.arange(m), ours].sum()
    want = cost[rows, cols].sum()
    np.testing.assert_allclose(got, want, rtol=1e-5)
    np.testing.assert_array_equal(ours, cols[np.argsort(rows)])


def test_hungarian_ties_same_total_cost():
    # integer costs with ties: assignment may differ, total must not
    rng = np.random.RandomState(0)
    cost = rng.randint(0, 3, size=(6, 20)).astype(np.float32)
    ours = np.asarray(hungarian(jnp.asarray(cost)))
    rows, cols = linear_sum_assignment(cost)
    assert len(set(ours.tolist())) == 6
    np.testing.assert_allclose(cost[np.arange(6), ours].sum(),
                               cost[rows, cols].sum())


def test_hungarian_vmap():
    rng = np.random.RandomState(7)
    costs = rng.randn(4, 5, 30).astype(np.float32)
    batched = np.asarray(jax.jit(jax.vmap(hungarian))(jnp.asarray(costs)))
    for b in range(4):
        rows, cols = linear_sum_assignment(costs[b])
        np.testing.assert_allclose(
            costs[b][np.arange(5), batched[b]].sum(),
            costs[b][rows, cols].sum(), rtol=1e-5)


def test_focal_cls_cost_golden():
    """mmdet FocalLossCost formula (match_costs.py):
    pos - neg with alpha=.25 gamma=2 on sigmoid probs."""
    logits = jnp.asarray([[0.3, -1.2], [2.0, 0.1]], jnp.float32)
    labels = jnp.asarray([1, 0], jnp.int32)
    got = np.asarray(focal_cls_cost(logits, labels))
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    eps = 1e-12
    neg = -np.log(1 - p + eps) * 0.75 * p ** 2
    pos = -np.log(p + eps) * 0.25 * (1 - p) ** 2
    want = (pos - neg)[:, np.asarray(labels)]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _toy_clip(t=3, n=10, c=1, m=2, seed=0):
    rng = np.random.RandomState(seed)
    cls_logits = jnp.asarray(rng.randn(t, n, c), jnp.float32)
    # queries at random boxes; instance 0 sits near query 4, instance 1
    # near query 7 -> matching should find them
    boxes = rng.rand(t, n, 4).astype(np.float32) * 100
    boxes[..., 2:] += boxes[..., :2] + 20
    boxes[:, 4] = [10, 10, 40, 40]
    boxes[:, 7] = [60, 60, 90, 95]
    gt = np.zeros((m, t, 4), np.float32)
    gt[0] = [11, 10, 41, 40]
    gt[1] = [60, 61, 90, 94]
    present = np.ones((m, t), bool)
    present[1, 2] = False
    return (cls_logits, jnp.asarray(boxes), jnp.asarray([100., 100., 100., 100.]),
            jnp.asarray(gt), jnp.asarray([0] * m, jnp.int32),
            jnp.asarray(present), jnp.asarray([True] * m))


def test_match_clip_prefers_overlapping_queries():
    args = _toy_clip()
    match = np.asarray(match_clip(*args))
    assert match[0] == 4 and match[1] == 7


def test_clip_cost_pad_columns_uniform():
    (cl, bx, whwh, gt, lab, pres, _valid) = _toy_clip()
    valid = jnp.asarray([True, False])
    cost = np.asarray(clip_cost_matrix(cl, bx, whwh, gt, lab, pres, valid))
    assert np.all(cost[1] == np.float32(PAD_COST))
    assert not np.all(cost[0] == np.float32(PAD_COST))


def test_clip_targets_scatter_semantics():
    t, n, m, nc = 3, 6, 2, 1
    match = jnp.asarray([2, 5], jnp.int32)
    gt_boxes = jnp.asarray(np.arange(m * t * 4, dtype=np.float32)
                           .reshape(m, t, 4))
    gt_labels = jnp.asarray([0, 0], jnp.int32)
    present = jnp.asarray([[True, True, False], [True, False, True]])
    valid = jnp.asarray([True, True])
    blinks = jnp.asarray([[1, 0, 1], [0, 1, 1]], jnp.float32)
    tg = clip_targets_from_match(match, gt_boxes, gt_labels, present, valid,
                                 blinks, num_queries=n, num_classes=nc)
    labels = np.asarray(tg['labels'])
    pos = np.asarray(tg['pos_mask'])
    bt = np.asarray(tg['bbox_targets'])
    blink = np.asarray(tg['blink_targets'])
    # query 2 <- instance 0: fg in frames 0,1; bg in frame 2
    assert labels[0, 2] == 0 and labels[1, 2] == 0 and labels[2, 2] == nc
    # query 5 <- instance 1: fg frames 0,2
    assert labels[0, 5] == 0 and labels[1, 5] == nc and labels[2, 5] == 0
    # all other queries background everywhere
    others = [q for q in range(n) if q not in (2, 5)]
    assert np.all(labels[:, others] == nc)
    assert pos.sum() == 4.0
    np.testing.assert_allclose(bt[0, 2], np.asarray(gt_boxes)[0, 0])
    np.testing.assert_allclose(bt[2, 5], np.asarray(gt_boxes)[1, 2])
    np.testing.assert_allclose(bt[2, 2], 0.0)        # absent -> zeroed
    assert blink[0, 2] == 1 and blink[2, 5] == 1 and blink[1, 5] == 0


def test_clip_targets_invalid_slot_masked():
    t, n, m, nc = 2, 4, 2, 1
    match = jnp.asarray([1, 3], jnp.int32)
    gt_boxes = jnp.ones((m, t, 4), jnp.float32)
    present = jnp.ones((m, t), bool)
    valid = jnp.asarray([True, False])
    tg = clip_targets_from_match(match, gt_boxes,
                                 jnp.zeros((m,), jnp.int32), present, valid,
                                 None, num_queries=n, num_classes=nc)
    labels = np.asarray(tg['labels'])
    assert np.all(labels[:, 3] == nc)      # invalid slot's query stays bg
    assert np.all(labels[:, 1] == 0)
    assert np.asarray(tg['pos_mask']).sum() == t
