"""Train-step tests: loss semantics, schedule parity, frozen params, and a
sharded multi-device step on the virtual mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcgaze_tpu.models.mcgaze import ModelConfig
from mcgaze_tpu.parallel.mesh import batch_sharding, make_mesh
from mcgaze_tpu.train.loop import (OptimConfig, TrainState,
                                   create_train_state, make_train_step,
                                   step_warmup_schedule)
from mcgaze_tpu.train.targets import slot_layout_from_counts

IMG = 32


def tiny_cfg():
    # R26 + 2 stages + slim FFN: the loss/freeze/mask semantics under test
    # are depth-independent, and the full-R50 4-stage train-step compile
    # dominated suite wall time (~78s on this 1-core box)
    return ModelConfig(clip_length=7, backbone_depth=26, num_stages=2,
                       stage_loss_weights=(1.0, 1.0), ffn_channels=256)


def make_batch(rng, b=2, t=7, img=IMG):
    s = img / IMG                      # GT boxes scale with the canvas
    imgs = rng.randn(b, t, img, img, 3).astype(np.float32)
    whwh = np.tile(np.array([img, img, img, img], np.float32), (b, t, 1))
    boxes = np.zeros((b, t, 3, 4), np.float32)
    valid = np.zeros((b, t, 3), np.float32)
    gazes = np.zeros((b, t, 3, 3), np.float32)
    for i in range(b):
        for j in range(t):
            # alternate between full 3-clue frames and head-only frames
            if (i + j) % 3 == 0:
                bl = [[4 * s, 4 * s, 28 * s, 28 * s]]
                gl = [[0, 0, -1]]
            else:
                bl = [[8 * s, 8 * s, 16 * s, 16 * s],
                      [10 * s, 10 * s, 14 * s, 12 * s],
                      [4 * s, 4 * s, 28 * s, 28 * s]]
                gl = [[0, 0, -1]] * 3
            boxes[i, j], valid[i, j], gazes[i, j] = slot_layout_from_counts(
                bl, gl)
    return dict(imgs=jnp.asarray(imgs), img_whwh=jnp.asarray(whwh),
                gt_boxes=jnp.asarray(boxes), gt_valid=jnp.asarray(valid),
                gt_gazes=jnp.asarray(gazes))


def test_schedule_matches_mmcv_step_warmup():
    oc = OptimConfig()
    sched = step_warmup_schedule(oc)
    # warmup start: factor = ratio
    assert float(sched(0)) == pytest.approx(1e-3 * 1e-3, rel=1e-4)
    # mid-warmup t=500: 1 - 0.5*(1-0.001)
    assert float(sched(500)) == pytest.approx(1e-3 * (1 - 0.5 * 0.999),
                                              rel=1e-4)
    assert float(sched(1000)) == pytest.approx(1e-3, rel=1e-5)
    assert float(sched(5999)) == pytest.approx(1e-3, rel=1e-5)
    assert float(sched(6000)) == pytest.approx(1e-4, rel=1e-5)


def test_train_step_decreases_loss_and_freezes_stem():
    cfg = tiny_cfg()
    oc = OptimConfig(warmup_iters=1, warmup_ratio=1.0, grad_clip_norm=10.0,
                     lr=1e-3)
    state = create_train_state(cfg, oc, jax.random.PRNGKey(0),
                               image_size=(IMG, IMG))
    step = make_train_step(cfg, oc)
    batch = make_batch(np.random.RandomState(0))

    stem_before = np.asarray(
        state.params['backbone']['conv1']['kernel']).copy()
    l1_before = np.asarray(
        state.params['backbone']['layer1_0']['conv1']['kernel']).copy()
    l2_before = np.asarray(
        state.params['backbone']['layer2_0']['conv1']['kernel']).copy()
    head_before = np.asarray(
        state.params['bbox_head_0']['ffn_fc1']['kernel']).copy()

    losses = []
    for _ in range(4):
        state, logs = step(state, batch)
        losses.append(float(logs['loss']))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    np.testing.assert_array_equal(
        np.asarray(state.params['backbone']['conv1']['kernel']), stem_before)
    np.testing.assert_array_equal(
        np.asarray(state.params['backbone']['layer1_0']['conv1']['kernel']),
        l1_before)
    assert not np.allclose(
        np.asarray(state.params['backbone']['layer2_0']['conv1']['kernel']),
        l2_before)
    assert not np.allclose(
        np.asarray(state.params['bbox_head_0']['ffn_fc1']['kernel']),
        head_before)


def _sharded_equivalence(meshes, b):
    """The correctness claim behind replacing the reference's NCCL DDP
    (apis/train.py:113-124) with pjit over a mesh: one identical batch
    stepped on 1 device and on each given mesh must produce the same
    loss / grad-norm / updated params at fp32 tolerance. A wrong TP
    PartitionSpec in parallel/mesh.py would break this."""
    from mcgaze_tpu.parallel.mesh import param_shardings, replicated

    # T=3 clips: the sharding-equivalence property is shape-independent,
    # and the fp32 CPU convs here run once per mesh + unsharded,
    # dominating suite wall time at T=7 (32px is the floor — the stride-32
    # pyramid level vanishes below it)
    cfg = ModelConfig(clip_length=3, num_stages=2,
                      stage_loss_weights=(1.0, 1.0), backbone_depth=26,
                      ffn_channels=256)
    oc = OptimConfig()
    state0 = create_train_state(cfg, oc, jax.random.PRNGKey(0),
                                image_size=(IMG, IMG))
    step = make_train_step(cfg, oc)
    batch = make_batch(np.random.RandomState(1), b=b, t=3)

    def run(mesh):
        # the step donates its input state: give each run a fresh copy
        state = jax.tree.map(jnp.array, state0)
        b = batch
        if mesh is not None:
            state = state.replace(
                params=jax.device_put(state.params,
                                      param_shardings(mesh, state.params)),
                stats=jax.device_put(state.stats, replicated(mesh)),
                opt_state=jax.device_put(state.opt_state, replicated(mesh)),
                step=jax.device_put(state.step, replicated(mesh)),
            )
            bs = batch_sharding(mesh)
            b = {k: jax.device_put(v, bs) for k, v in batch.items()}
        new_state, logs = step(state, b)
        return (float(logs['loss']), float(logs['grad_norm']),
                jax.device_get(new_state.params))

    loss1, gn1, p1 = run(None)
    for mesh in meshes:
        lossm, gnm, pm = run(mesh)
        assert lossm == pytest.approx(loss1, rel=2e-5)
        assert gnm == pytest.approx(gn1, rel=2e-4)
        # Adam's first-step update is lr_eff*sign(grad) (lr_eff = lr *
        # warmup_ratio = 1e-6); params with noise-level grads can flip
        # sign under a different reduction order, so allow atol of ~3
        # update magnitudes. A wrong PartitionSpec diverges by orders of
        # magnitude more (and is also caught by the scalar checks above).
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4,
                                                    atol=3e-6),
            p1, pm)


@pytest.mark.slow
def test_sharded_step_matches_unsharded():
    """4x2 mesh: exercises BOTH the data axis and every TP rule. Slow
    suite: ~2 min on the 1-core box, almost all of it virtual-device
    barrier spin (measured 47s user / 84s sys for 128s wall — 8 CPU
    'devices' time-slicing one core). The sharded==unsharded claim stays
    continuously covered by __graft_entry__.dryrun_multichip, which the
    bench driver executes every round and which asserts the same
    loss-equality on the 8-device mesh."""
    _sharded_equivalence([make_mesh(n_data=4, n_model=2)], b=4)


@pytest.mark.slow
def test_sharded_step_matches_unsharded_8x1():
    """Pure-DP 8-way layout at the full test batch."""
    _sharded_equivalence([make_mesh(n_data=8, n_model=1)], b=8)


def test_loss_masks_head_only_frames():
    """face/eyes losses must come only from 3-GT frames."""
    from mcgaze_tpu.train.criterion import stage_losses
    from mcgaze_tpu.train.targets import flatten_targets
    cfg = tiny_cfg()
    rng = np.random.RandomState(2)
    b, t, n = 1, 7, 7
    # all frames head-only: face/eyes bbox+gaze losses must be exactly 0
    boxes = np.zeros((b, t, 3, 4), np.float32)
    valid = np.zeros((b, t, 3), np.float32)
    gazes = np.zeros((b, t, 3, 3), np.float32)
    boxes[:, :, 2] = [2, 2, 30, 30]
    valid[:, :, 2] = 1
    gazes[:, :, 2] = [0, 0, -1]
    whwh = np.tile(np.array([32., 32., 32., 32.], np.float32), (b, t, 1))
    tg = flatten_targets(jnp.asarray(boxes), jnp.asarray(valid),
                         jnp.asarray(gazes), jnp.asarray(whwh))
    g = rng.randn(n, 3).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    stage_out = dict(
        cls_logits=jnp.asarray(rng.randn(n, 3, 1).astype(np.float32)),
        boxes=jnp.asarray(
            np.tile([[1., 1., 20., 20.]], (n, 3, 1)).astype(np.float32)
            .reshape(n, 3, 4)),
        gaze=dict(fusion=jnp.asarray(g), face=jnp.asarray(g),
                  eyes=jnp.asarray(g), head=jnp.asarray(g)),
    )
    out = stage_losses(cfg, stage_out, tg, t)
    assert float(out['face_loss_bbox']) == 0.0
    assert float(out['eyes_loss_bbox']) == 0.0
    assert float(out['face_gaze_loss']) == 0.0
    assert float(out['head_loss_bbox']) > 0.0
    assert float(out['head_gaze_loss']) > 0.0
    # cls loss is never zero: negatives contribute focal background term
    assert float(out['face_loss_cls']) > 0.0


def test_sharded_step_matches_unsharded_2x1_fast():
    """Fast-suite sharded coverage (advisor round-3): the full
    params/grad-norm/updated-params equivalence on a minimal 2-device
    data mesh, so a PartitionSpec regression that happens to preserve
    the loss scalar can't ride the slow-marking of the 4x2/8x1 variants
    through fast CI. ~2x the single-step cost of the tiny config."""
    _sharded_equivalence([make_mesh(n_data=2, n_model=1)], b=2)


def test_sharded_step_matches_unsharded_1x2_fast():
    """Same, exercising only the TP axis (model=2, batch unsharded)."""
    _sharded_equivalence([make_mesh(n_data=1, n_model=2)], b=2)
