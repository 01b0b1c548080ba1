"""Train step for the TeViT/InstBlink query detectors.

Same shape as the MCGaze loop (train/loop.py): one donated jitted step
doing forward + Hungarian matching + losses + clip + AdamW; the
reference's per-clip python assignment loop (instblink_roi_head.py:
241-259, scipy on CPU inside the train step) is replaced by the in-jit
solver (train/hungarian.py), so the step never leaves the chip.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import optax

from ..models.query_detector import QueryDetector, QueryDetectorConfig
from .loop import OptimConfig, TrainState, make_optimizer
from .query_criterion import total_loss


def create_query_train_state(cfg: QueryDetectorConfig, oc: OptimConfig,
                             rng, image_size=(384, 640)) -> TrainState:
    from ..models.query_detector import init_query_model
    _, variables = init_query_model(cfg, rng, image_size)
    tx = make_optimizer(oc)
    return TrainState(params=variables['params'],
                      stats=variables.get('stats', {}),
                      opt_state=tx.init(variables['params']),
                      step=jax.numpy.zeros((), jax.numpy.int32),
                      ema_params=None)


def make_query_train_step(cfg: QueryDetectorConfig, oc: OptimConfig):
    """train_step(state, batch) -> (state, logs).

    batch: imgs (B*T, H, W, 3) normalised; whwh (B*T, 4);
    gt_boxes (B, M, T, 4) xyxy; gt_labels (B, M); gt_present (B, M, T);
    inst_valid (B, M); gt_blinks (B, M, T) when cfg.with_blink.
    """
    model = QueryDetector(cfg)
    tx = make_optimizer(oc)
    t = cfg.clip_length

    # MsgShifT trains with DropPath (reference msgshift.py:408,420,581);
    # the per-step RNG is deterministic (fold_in of the step counter) so
    # resumed runs replay the same mask stream
    use_droppath = (cfg.backbone == 'msgshift'
                    and cfg.msg_drop_path_rate > 0.0)

    def loss_fn(params, stats, batch, step):
        variables = {'params': params}
        if stats:
            variables['stats'] = stats
        kwargs = {}
        if use_droppath:
            kwargs = dict(train=True, rngs={'droppath': jax.random.fold_in(
                jax.random.PRNGKey(0x0d0b), step)})
        # raw-u8 batches normalize on device (identity for f32 —
        # InstBlinkDataConfig.ship_uint8, 4x less H2D per batch)
        from ..evaluation.forward import device_normalize
        imgs = device_normalize(batch['imgs'], batch['whwh'])
        out = model.apply(variables, imgs, batch['whwh'],
                          clip_length=t, **kwargs)
        return total_loss(cfg, out, batch, t)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch):
        (_loss, logs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.stats, batch,
                                   state.step)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        logs['grad_norm'] = optax.global_norm(grads)
        return dataclasses.replace(
            state, params=params, opt_state=opt_state,
            step=state.step + 1), logs

    return train_step
