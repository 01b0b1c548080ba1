"""Jitted eval forward shared by the test CLIs and the in-training
validation hook.

The reference builds its eval model once via `init_detector`
(mmdet/apis/inference.py:30-57) and calls
`model(return_loss=False, rescale=True)`; here the analogue is a single
jitted function over (variables, imgs, whwh) so the SAME compiled
computation can be driven either with a restored checkpoint (tools/test*)
or with the live training params (ValidationHook).
"""
from __future__ import annotations

from functools import partial

import numpy as np


def device_normalize(imgs, whwh):
    """uint8 frames -> ImageNet-normalized f32 with the pad region
    zeroed, ON DEVICE (traced under the caller's jit). Raw u8 shipping
    moves 4x fewer bytes host->device; the reference pads AFTER
    normalize, so pad must be 0 in normalized space, not a normalized
    black pixel. f32 inputs (already normalized host-side) pass through
    untouched. Shared by the eval forwards and the train step."""
    import jax.numpy as jnp

    if imgs.dtype != jnp.uint8:
        return imgs
    from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD
    imgs = (imgs.astype(jnp.float32) -
            jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    hh, ww = imgs.shape[-3], imgs.shape[-2]
    xx = jnp.arange(ww)[None, None, :]
    yy = jnp.arange(hh)[None, :, None]
    valid = ((xx < whwh[:, 0, None, None]) &
             (yy < whwh[:, 1, None, None]))
    return imgs * valid[..., None]


def make_eval_forward(model_cfg, canvas=(224, 224), init_variables=True):
    """Returns (model, variables, fwd, fwd_dedup) where
    fwd(variables, imgs (N,H,W,3) f32|u8, whwh (N,4), t) ->
        (boxes (N,3,4), scores (N,3), gazes dict name->(N,3))
    and fwd_dedup is the unique-frame variant (docstring below).

    init_variables=False skips the (compile-heavy) jitted init and
    returns variables=None — for callers that always substitute their own
    params (the in-training ValidationHook)."""
    import jax
    import jax.numpy as jnp

    from ..models.mcgaze import MCGazeModel, init_model

    if init_variables:
        model, variables = init_model(model_cfg, jax.random.PRNGKey(0),
                                      image_size=canvas)
    else:
        model, variables = MCGazeModel(model_cfg), None

    normalize = device_normalize

    def last_stage(out):
        last = out['stages'][-1]
        return (last['boxes'], jax.nn.sigmoid(last['cls_logits'])[..., 0],
                last['gaze'])

    @partial(jax.jit, static_argnames=('t',))
    def fwd(variables, imgs, whwh, t):
        imgs = normalize(imgs, whwh)
        return last_stage(model.apply(variables, imgs, whwh, clip_length=t))

    @partial(jax.jit, static_argnames=('t',))
    def fwd_dedup(variables, frames, sel, whwh_u, t):
        """Frame-deduplicated forward: consecutive stride-4 clips share
        T - stride frames, so backbone+FPN run once per UNIQUE frame
        (`frames` (U,H,W,3), per-frame `whwh_u` (U,4)) and the pyramid is
        gathered per clip position by `sel` (K*T,) before the query
        stages. Numerically exact vs fwd on the duplicated layout (the
        backbone is per-frame); skips ~40% of the dominant conv cost the
        reference pays recomputing every clip
        (tools/test_gaze360_gaze.py:87-111)."""
        frames = normalize(frames, whwh_u)
        feats = model.apply(variables, frames,
                            method=MCGazeModel.extract_features)
        out = model.apply(variables, feats, whwh_u[sel], clip_length=t,
                          frame_idx=sel,
                          method=MCGazeModel.run_heads)
        return last_stage(out)

    return model, variables, fwd, fwd_dedup


def make_query_eval_forward(model, mc):
    """Query-family (InstBlink/TeViT) analogue of make_eval_forward:
    (fwd, fwd_batched) with on-device u8 normalization and top-k track
    selection inside the jit (reference apis/test.py:81-135 +
    instblink_roi_head.py:351-383).

    fwd(variables, imgs (T,H,W,3) f32|u8, whwh (T,4)) -> topk_tracks dict
    fwd_batched(variables, imgs (Kq*T,...), whwh, kq) -> batched layout
    """
    import jax

    from ..models.query_detector import topk_tracks, topk_tracks_batched

    @jax.jit
    def fwd(variables, imgs, whwh):
        imgs = device_normalize(imgs, whwh)
        t = imgs.shape[0]
        out = model.apply(variables, imgs, whwh, clip_length=t)
        return topk_tracks(out['stages'][-1], t, mc.max_per_img,
                           mc.num_classes)

    @partial(jax.jit, static_argnames=('kq',))
    def fwd_batched(variables, imgs, whwh, kq):
        imgs = device_normalize(imgs, whwh)
        t = imgs.shape[0] // kq
        out = model.apply(variables, imgs, whwh, clip_length=t)
        return topk_tracks_batched(out['stages'][-1], kq, t,
                                   mc.max_per_img, mc.num_classes)

    return fwd, fwd_batched


def _device_resident(variables):
    """vars_for(x): the variables pytree replicated once per device a
    device-committed input lives on, cached — each local device
    evaluates with its own resident copy instead of re-shipping params
    per call (shared by bind_forward and bind_query_forward)."""
    import jax

    dev_variables = {}

    def vars_for(x):
        devs = getattr(x, 'devices', None)
        if devs is None:
            return variables
        try:
            (dev,) = devs()
        except (TypeError, ValueError):
            return variables
        if dev not in dev_variables:
            dev_variables[dev] = jax.device_put(variables, dev)
        return dev_variables[dev]

    return vars_for


def bind_query_forward(fwd, fwd_batched, variables):
    """bind_forward for the query family: forward(imgs, whwh) -> device
    track dict, with `.batched(imgs, whwh, kq)` attached and per-device
    resident params (the same vars_for caching as bind_forward, so the
    InstBlink driver can round-robin videos over jax.local_devices()).
    Outputs stay DEVICE arrays — the driver packs one readback per
    video (instblink_driver._submit_video)."""
    import jax.numpy as jnp

    vars_for = _device_resident(variables)

    def forward(imgs, whwh):
        return fwd(vars_for(imgs), jnp.asarray(imgs), jnp.asarray(whwh))

    forward.accepts_uint8 = True

    def batched(imgs, whwh, kq):
        return fwd_batched(vars_for(imgs), jnp.asarray(imgs),
                           jnp.asarray(whwh), kq)

    forward.batched = batched
    return forward


def bind_forward(fwd, variables, fwd_dedup=None):
    """Close fwd over a fixed variables pytree (the VideoGazeEvaluator
    forward_fn signature). When fwd_dedup is given it is attached as
    forward.dedup(frames (U,...), sel (K*T,), whwh_u (U,4), t) and the
    driver prefers it (EvalConfig.dedup_frames).

    Device-pinned inputs run WHERE THEY LIVE: when `imgs` is committed to
    a local device (the driver round-robins whole videos across
    jax.local_devices(), the single-process analogue of the reference's
    one-process-per-GPU eval, apis/test.py:81-135), the variables pytree
    is replicated to that device once and cached, so each of the N local
    devices evaluates its videos with its own resident copy instead of
    re-shipping params per call.

    Outputs are returned as DEVICE arrays (not forced to numpy): jit
    dispatch is async, so the driver can submit every chunk of a video
    and pay one device->host sync when it np.asarray's the results
    (driver._submit_clips/_collect_clips)."""
    import jax.numpy as jnp

    vars_for = _device_resident(variables)

    def forward(imgs, whwh, t):
        return fwd(vars_for(imgs), jnp.asarray(imgs), jnp.asarray(whwh), t)

    # the jitted fwd normalizes uint8 inputs on-device (normalize()
    # above), so the driver may ship raw u8 frames (EvalConfig.ship_uint8)
    forward.accepts_uint8 = True

    if fwd_dedup is not None:
        def dedup(frames, sel, whwh_u, t):
            return fwd_dedup(vars_for(frames), jnp.asarray(frames),
                             jnp.asarray(sel, jnp.int32),
                             jnp.asarray(whwh_u), t)

        forward.dedup = dedup
    return forward
