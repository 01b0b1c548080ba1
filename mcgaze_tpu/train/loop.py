"""Optimizer, LR schedule and the single-jit sharded train step.

Replaces the reference's IterBasedRunner + hook pipeline (apis/train.py:141-170,
mmcv OptimizerHook with grad_clip 0.1, StepLrUpdaterHook with linear warmup):
everything — forward, loss, grad, clip, AdamW update — is one compiled XLA
program over the device mesh.

Optimizer parity (configs/multiclue_gaze/multiclue_gaze_r50_gaze360.py:100-112):
  AdamW lr 1e-3, wd 1e-4; backbone lr_mult 0.1; stem+stage1 frozen
  (frozen_stages=1); global-norm clip 0.1; linear warmup 1000 iters from
  ratio 1e-3; step x0.1 at iter 6000; 7000 iters total.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.mcgaze import MCGazeModel, ModelConfig
from .criterion import total_loss
from .targets import flatten_targets


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr: float = 1e-3
    weight_decay: float = 1e-4
    backbone_lr_mult: float = 0.1
    grad_clip_norm: float = 0.1
    warmup_iters: int = 1000
    warmup_ratio: float = 1e-3
    lr_steps: Sequence[int] = (6000,)
    lr_gamma: float = 0.1
    max_iters: int = 7000
    # EMA of params folded into the compiled step (reference mmcv EMAHook,
    # mmdet/core/hook/ema.py); 0.0 disables. Typical momentum 0.0002.
    ema_momentum: float = 0.0


def step_warmup_schedule(oc: OptimConfig) -> Callable:
    """mmcv StepLrUpdaterHook semantics: regular step lr scaled by the
    linear-warmup factor 1 - (1 - t/w)*(1 - ratio) for t < w."""
    steps = jnp.asarray(list(oc.lr_steps), jnp.int32)

    def sched(t):
        t = jnp.asarray(t, jnp.float32)
        regular = oc.lr * oc.lr_gamma ** jnp.sum(t >= steps)
        k = (1.0 - t / oc.warmup_iters) * (1.0 - oc.warmup_ratio)
        factor = jnp.where(t < oc.warmup_iters, 1.0 - k, 1.0)
        return regular * factor

    return sched


def _param_group(path) -> str:
    name = '/'.join(p.key if hasattr(p, 'key') else str(p) for p in path)
    if name.startswith('backbone/'):
        # frozen_stages=1: stem + layer1 get no updates at all.
        if (name.startswith('backbone/conv1') or
                name.startswith('backbone/bn1') or
                name.startswith('backbone/layer1_')):
            return 'frozen'
        return 'backbone'
    return 'head'


def make_optimizer(oc: OptimConfig) -> optax.GradientTransformation:
    sched = step_warmup_schedule(oc)

    def adamw(mult):
        return optax.adamw(lambda t: sched(t) * mult, b1=0.9, b2=0.999,
                           eps=1e-8, weight_decay=oc.weight_decay)

    labels = lambda params: jax.tree_util.tree_map_with_path(
        lambda path, _: _param_group(path), params)
    return optax.chain(
        optax.masked(optax.set_to_zero(),
                     lambda p: jax.tree_util.tree_map_with_path(
                         lambda path, _: _param_group(path) == 'frozen', p)),
        optax.clip_by_global_norm(oc.grad_clip_norm),
        optax.multi_transform(
            {'frozen': optax.set_to_zero(),
             'backbone': adamw(oc.backbone_lr_mult),
             'head': adamw(1.0)}, labels),
    )


@struct.dataclass
class TrainState:
    params: Any
    stats: Any
    opt_state: Any
    step: jnp.ndarray
    ema_params: Any = None


def create_train_state(cfg: ModelConfig, oc: OptimConfig, rng,
                       image_size=(224, 224)) -> TrainState:
    from ..models.mcgaze import init_model
    _, variables = init_model(cfg, rng, image_size)
    tx = make_optimizer(oc)
    return TrainState(params=variables['params'],
                      stats=variables.get('stats', {}),
                      opt_state=tx.init(variables['params']),
                      step=jnp.zeros((), jnp.int32),
                      # REAL copies, not jnp.asarray aliases: the donated
                      # train step would otherwise receive the same
                      # buffer as params AND ema_params and fail with
                      # 'Attempt to donate the same buffer twice'
                      ema_params=(jax.tree.map(
                          lambda x: jnp.array(x, copy=True),
                          variables['params'])
                                  if oc.ema_momentum else None))


def make_train_step(cfg: ModelConfig, oc: OptimConfig):
    """Returns train_step(state, batch) -> (state, logs); jit-able.

    batch dict (leading dims (B, T)):
      imgs (B,T,H,W,3) float32 normalised, img_whwh (B,T,4),
      gt_boxes (B,T,3,4), gt_valid (B,T,3), gt_gazes (B,T,3,3)
    """
    model = MCGazeModel(cfg)
    tx = make_optimizer(oc)

    def loss_fn(params, stats, batch):
        b, t = batch['imgs'].shape[:2]
        imgs = batch['imgs'].reshape(b * t, *batch['imgs'].shape[2:])
        whwh = batch['img_whwh'].reshape(b * t, 4)
        # raw uint8 batches (DataConfig.ship_uint8) normalize on-device
        from ..evaluation.forward import device_normalize
        imgs = device_normalize(imgs, whwh)
        out = model.apply({'params': params, 'stats': stats}, imgs, whwh,
                          clip_length=t)
        tg = flatten_targets(batch['gt_boxes'], batch['gt_valid'],
                             batch['gt_gazes'], batch['img_whwh'])
        return total_loss(cfg, out, tg, t)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch):
        (loss, logs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.stats, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        logs['grad_norm'] = optax.global_norm(grads)
        ema = state.ema_params
        if ema is not None:
            from .hooks import ema_update
            ema = ema_update(ema, params, oc.ema_momentum)
        return dataclasses.replace(
            state, params=params, opt_state=opt_state,
            step=state.step + 1, ema_params=ema), logs

    return train_step
