"""TeViT/InstBlink query detector: shapes, top-k track selection, and a
train-signal smoke test (loss decreases under AdamW on a fixed clip).

Reference behaviours pinned here: per-stage output shapes over
(B*T, num_queries) (instblink_roi_head.py:77-147), frame-averaged
sigmoid top-k selection (instblink_roi_head.py:356-383), and the blink
focal SIGN — sigmoid(blink_logit) = P(blink), matching the reference
where the `1 - targets` at blink_head.py:127 is mmcv label encoding
(label 0 = the positive class), not a semantic flip.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mcgaze_tpu.models.query_detector import (QueryDetector,
                                              QueryDetectorConfig,
                                              init_query_model, topk_tracks)
from mcgaze_tpu.train import query_criterion

TINY = QueryDetectorConfig(
    num_stages=2, clip_length=3, num_queries=10, num_classes=2,
    channels=32, ffn_channels=64, num_heads=4, dyn_feat_channels=16,
    max_per_img=4, max_instances=3, roi_impl='mm')


@pytest.fixture(scope='module')
def tiny_model():
    return init_query_model(TINY, jax.random.PRNGKey(0),
                            image_size=(64, 96))


def _batch(b, cfg, seed=0):
    rng = np.random.RandomState(seed)
    t, m = cfg.clip_length, cfg.max_instances
    h, w = 64, 96
    imgs = rng.randn(b * t, h, w, 3).astype(np.float32) * 0.1
    whwh = np.tile(np.asarray([[w, h, w, h]], np.float32), (b * t, 1))
    gt_boxes = rng.rand(b, m, t, 4).astype(np.float32) * 30
    gt_boxes[..., 2:] += gt_boxes[..., :2] + 8
    gt_labels = rng.randint(0, cfg.num_classes, size=(b, m))
    gt_present = np.ones((b, m, t), bool)
    gt_present[:, :, -1] = rng.rand(b, m) > 0.3
    inst_valid = np.ones((b, m), bool)
    inst_valid[:, -1] = False
    gt_blinks = rng.randint(0, 2, size=(b, m, t)).astype(np.float32)
    return dict(imgs=jnp.asarray(imgs), whwh=jnp.asarray(whwh),
                gt_boxes=jnp.asarray(gt_boxes),
                gt_labels=jnp.asarray(gt_labels, dtype=jnp.int32),
                gt_present=jnp.asarray(gt_present),
                inst_valid=jnp.asarray(inst_valid),
                gt_blinks=jnp.asarray(gt_blinks))


def test_forward_shapes(tiny_model):
    model, variables = tiny_model
    cfg = TINY
    b = 2
    batch = _batch(b, cfg)
    out = jax.jit(model.apply, static_argnames='clip_length')(
        variables, batch['imgs'], batch['whwh'],
        clip_length=cfg.clip_length)
    assert len(out['stages']) == cfg.num_stages
    for s in out['stages']:
        assert s['cls_logits'].shape == (b * cfg.clip_length,
                                         cfg.num_queries, cfg.num_classes)
        assert s['boxes'].shape == (b * cfg.clip_length, cfg.num_queries, 4)
        assert s['blink_logits'].shape == (b * cfg.clip_length,
                                           cfg.num_queries)
    # boxes are finite absolute coords
    assert np.isfinite(np.asarray(out['stages'][-1]['boxes'])).all()


def test_topk_tracks_selection():
    t, q, c, k = 3, 6, 2, 4
    rng = np.random.RandomState(0)
    logits = rng.randn(t, q, c).astype(np.float32)
    logits[:, 2, 1] = 5.0          # query 2 / class 1 dominates
    logits[:, 5, 0] = 4.0          # then query 5 / class 0
    boxes = rng.rand(t, q, 4).astype(np.float32)
    blink = rng.randn(t, q).astype(np.float32)
    out = topk_tracks(dict(cls_logits=jnp.asarray(logits),
                           boxes=jnp.asarray(boxes),
                           blink_logits=jnp.asarray(blink)),
                      clip_length=t, max_per_img=k, num_classes=c)
    qi = np.asarray(out['query_idx'])
    labels = np.asarray(out['labels'])
    assert qi[0] == 2 and labels[0] == 1
    assert qi[1] == 5 and labels[1] == 0
    assert out['boxes'].shape == (t, k, 4)
    assert out['blink'].shape == (t, k)
    # scores are frame-averaged sigmoids of the selected (query, class)
    want = 1 / (1 + np.exp(-logits[:, 2, 1]))
    np.testing.assert_allclose(np.asarray(out['scores'])[0], want.mean(),
                               rtol=1e-5)
    # per-frame boxes follow the selected query
    np.testing.assert_allclose(np.asarray(out['boxes'])[:, 0], boxes[:, 2])


def test_loss_keys_and_finiteness(tiny_model):
    model, variables = tiny_model
    cfg = TINY
    batch = _batch(2, cfg)
    @jax.jit
    def fwd_loss(variables, batch):
        out = model.apply(variables, batch['imgs'], batch['whwh'],
                          clip_length=cfg.clip_length)
        return query_criterion.total_loss(cfg, out, batch,
                                          cfg.clip_length)

    loss, logs = fwd_loss(variables, batch)
    for i in range(cfg.num_stages):
        for key in ('loss_cls', 'loss_bbox', 'loss_iou', 'loss_blink'):
            assert f'stage{i}_{key}' in logs
    vals = np.asarray(jax.tree.leaves(jax.tree.map(np.asarray, logs)))
    assert np.isfinite(vals).all()
    assert float(loss) > 0


def test_no_blink_config_drops_blink_loss():
    cfg = QueryDetectorConfig(
        num_stages=1, clip_length=2, num_queries=6, num_classes=1,
        channels=16, ffn_channels=32, num_heads=2, dyn_feat_channels=8,
        with_blink=False, max_instances=2, roi_impl='mm')
    model, variables = init_query_model(cfg, jax.random.PRNGKey(1),
                                        image_size=(32, 32))
    rng = np.random.RandomState(0)
    t, m = cfg.clip_length, cfg.max_instances
    imgs = jnp.asarray(rng.randn(t, 32, 32, 3), jnp.float32)
    whwh = jnp.tile(jnp.asarray([[32., 32., 32., 32.]]), (t, 1))
    out = jax.jit(model.apply, static_argnames='clip_length')(
        variables, imgs, whwh, clip_length=t)
    assert 'blink_logits' not in out['stages'][0]
    batch = dict(whwh=whwh,
                 gt_boxes=jnp.asarray(rng.rand(1, m, t, 4) * 10 + 5,
                                      jnp.float32),
                 gt_labels=jnp.zeros((1, m), jnp.int32),
                 gt_present=jnp.ones((1, m, t), bool),
                 inst_valid=jnp.ones((1, m), bool))
    _loss, logs = jax.jit(
        lambda o, b: query_criterion.total_loss(cfg, o, b, t))(out, batch)
    assert not any('blink' in k for k in logs)


@pytest.mark.slow
def test_training_signal(tiny_model):
    """A few AdamW steps on one fixed batch must reduce the loss."""
    model, variables = tiny_model
    cfg = TINY
    batch = _batch(1, cfg, seed=3)
    tx = optax.adamw(1e-4)
    params = variables['params']
    opt_state = tx.init(params)

    stats = variables.get('stats', {})

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply({'params': p, 'stats': stats},
                              batch['imgs'], batch['whwh'],
                              clip_length=cfg.clip_length)
            loss, logs = query_criterion.total_loss(cfg, out, batch,
                                                    cfg.clip_length)
            return loss, logs

        (loss, _logs), grads = jax.value_and_grad(loss_fn,
                                                  has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_blink_loss_sign_rewards_high_score_on_blink():
    """sigmoid(blink_logit) must mean P(blink): logits aligned with
    gt_blinks give a (much) lower loss_blink than anti-aligned logits.
    Pins the label-encoding translation of blink_head.py:127 (mmcv label
    0 = positive class) — the on-chip burn-in caught the criterion
    training the complement (scores exactly inverted vs GT, blink AP 0)."""
    cfg = TINY
    t, q, m, c = cfg.clip_length, 4, 2, cfg.num_classes
    rng = np.random.RandomState(0)
    gt_boxes = np.zeros((1, cfg.max_instances, t, 4), np.float32)
    gt_boxes[0, :, :, 0] = np.arange(cfg.max_instances)[:, None] * 20 + 4
    gt_boxes[0, :, :, 1] = 10
    gt_boxes[0, :, :, 2] = gt_boxes[0, :, :, 0] + 12
    gt_boxes[0, :, :, 3] = 30
    gt_blinks = rng.randint(0, 2, size=(1, cfg.max_instances, t)
                            ).astype(np.float32)
    inst_valid = np.zeros((1, cfg.max_instances), bool)
    inst_valid[0, :m] = True
    batch = dict(
        whwh=jnp.asarray(np.tile([[96., 64., 96., 64.]], (t, 1)),
                         jnp.float32),
        gt_boxes=jnp.asarray(gt_boxes),
        gt_labels=jnp.zeros((1, cfg.max_instances), jnp.int32),
        gt_present=jnp.ones((1, cfg.max_instances, t), bool),
        inst_valid=jnp.asarray(inst_valid),
        gt_blinks=jnp.asarray(gt_blinks))
    # query i sits exactly on instance i with a confident class-0 score;
    # surplus queries park far away with low scores
    boxes = np.zeros((t, q, 4), np.float32)
    boxes[:, :cfg.max_instances] = gt_boxes[0].transpose(1, 0, 2)
    boxes[:, cfg.max_instances:] = [80., 50., 90., 60.]
    cls_logits = np.full((t, q, c), -6.0, np.float32)
    cls_logits[:, :m, 0] = 6.0
    aligned = np.zeros((t, q), np.float32)
    aligned[:, :m] = (2.0 * gt_blinks[0, :m].T - 1.0) * 8.0

    def loss_blink(blink_logits):
        out = dict(cls_logits=jnp.asarray(cls_logits),
                   boxes=jnp.asarray(boxes, jnp.float32),
                   blink_logits=jnp.asarray(blink_logits, jnp.float32))
        return float(query_criterion.stage_losses(
            cfg, out, batch, t)['loss_blink'])

    low = loss_blink(aligned)
    high = loss_blink(-aligned)
    assert low < 0.1 * high, (low, high)


def test_topk_tracks_batched_matches_single(tiny_model):
    """topk_tracks_batched over b packed clips == topk_tracks per clip
    (same instblink_roi_head.py:351-383 math, vectorized for the
    clip_batch eval driver)."""
    from mcgaze_tpu.models.query_detector import topk_tracks_batched

    model, variables = tiny_model
    b, t = 3, TINY.clip_length
    batch = _batch(b, TINY, seed=5)
    out = jax.jit(lambda v, i, w: model.apply(v, i, w, clip_length=t))(
        variables, batch['imgs'], batch['whwh'])
    last = out['stages'][-1]

    got = topk_tracks_batched(last, b, t, TINY.max_per_img,
                              TINY.num_classes)
    for i in range(b):
        single = topk_tracks(
            {k: v[i * t:(i + 1) * t] for k, v in last.items()}, t,
            TINY.max_per_img, TINY.num_classes)
        for key in single:
            np.testing.assert_allclose(
                np.asarray(got[key][i]), np.asarray(single[key]),
                rtol=1e-6, atol=1e-6, err_msg=f'clip {i} {key}')


def test_driver_batched_windows_match_serial(tiny_model):
    """InstBlinkVideoEvaluator with a .batched forward (clip_batch
    windows per launch, pow2 padding) emits exactly the serial
    per-window results."""
    from functools import partial

    from mcgaze_tpu.evaluation.instblink_driver import (
        InstBlinkEvalConfig, InstBlinkVideoEvaluator)
    from mcgaze_tpu.models.query_detector import topk_tracks_batched

    model, variables = tiny_model
    t = TINY.clip_length
    f, h, w = 8, 64, 96
    rng = np.random.RandomState(9)
    frames = rng.randn(f, h, w, 3).astype(np.float32) * 0.1
    whwh = np.tile(np.asarray([[w, h, w, h]], np.float32), (f, 1))
    sfs = np.ones((f, 4), np.float32)

    @jax.jit
    def fwd(imgs, whwh_):
        out = model.apply(variables, imgs, whwh_, clip_length=t)
        return topk_tracks(out['stages'][-1], t, TINY.max_per_img,
                           TINY.num_classes)

    @partial(jax.jit, static_argnames='kq')
    def fwd_batched(imgs, whwh_, kq):
        out = model.apply(variables, imgs, whwh_, clip_length=t)
        return topk_tracks_batched(out['stages'][-1], kq, t,
                                   TINY.max_per_img, TINY.num_classes)

    def serial_np(imgs, whwh_):
        return {k: np.asarray(v) for k, v in
                fwd(jnp.asarray(imgs), jnp.asarray(whwh_)).items()}

    def batched_np(imgs, whwh_, kq):
        return {k: np.asarray(v) for k, v in
                fwd_batched(jnp.asarray(imgs), jnp.asarray(whwh_),
                            kq).items()}

    cfg = InstBlinkEvalConfig(clip_length=t, overlap=1, max_per_img=4,
                              clip_batch=2)
    serial = InstBlinkVideoEvaluator(serial_np, cfg).run_video(
        frames, whwh, sfs, video_id=1)

    serial_np.batched = batched_np   # type: ignore[attr-defined]
    batched = InstBlinkVideoEvaluator(serial_np, cfg).run_video(
        frames, whwh, sfs, video_id=1)

    # tolerances: the batched program is a different XLA compilation
    # (B=2/4 vs B=1), so bilinear RoI + 6-stage accumulation reassociates
    # — observed ~1e-4 absolute on ~300 px box coords
    assert len(serial) == len(batched) > 0
    for a, b_ in zip(serial, batched):
        assert a.keys() == b_.keys()
        for key in a:
            if key == 'bboxes':
                for fa, fb in zip(a[key], b_[key]):
                    if fa is None or fb is None:
                        assert fa is None and fb is None
                    else:
                        np.testing.assert_allclose(fa, fb, rtol=1e-4,
                                                   atol=5e-3)
            elif isinstance(a[key], list):
                np.testing.assert_allclose(a[key], b_[key], rtol=1e-4,
                                           atol=1e-4)
            else:
                assert a[key] == pytest.approx(b_[key], rel=1e-4,
                                               abs=1e-6)
