"""Fused clue x frame attention — Pallas TPU kernel.

The reference STQI head runs TWO self-attention passes with ONE shared
MultiheadAttention module + LayerNorm (gaze_stqi_head.py:148-167): first
over the 3 clue queries within each frame (seq=3, batch=B*T), then over
the 7 frames for each clue (seq=T, batch=B*3), re-projecting qkv from the
first pass's output. Sequence lengths 3 and 7 are far below MXU tile
sizes, so as separate XLA ops each pass is latency-bound: per stage,
2 attentions + 2 LNs + 6 projections of tiny tensors each bounce through
HBM.

Kernel design (Mosaic-friendly: no reshape/slice below 128-lane
granularity anywhere):
  * one grid program per CLIP holds its (T*Q, C) = (21, 256) token block
    and the shared weights in VMEM;
  * both passes become ONE full 21-token attention each, restricted by a
    STRUCTURAL mask — block-diagonal within frames for the spatial pass,
    same-clue-index for the temporal pass (tokens are t-major, q-minor);
  * heads are separated with multiplicative LANE masks: q*mask_h against
    unmasked k contracts to exactly head h's logits (the other lanes are
    zero), and attn_h @ (v*mask_h) accumulates head h's output lanes —
    8x redundant MACs on tensors this small cost nothing and avoid the
    (t, q, 3, heads, hd) shape casts Mosaic cannot lower.

Numerics match models.heads.TorchMHA + LayerNorm (fp32 compute, LN eps
1e-5, matching torch) to float tolerance (max abs diff ~1e-6 on a v5e).

MEASURED RESULT (v5e-1, 32 clips, fp32): unfused XLA path 1.14 ms, this
kernel 1.85 ms (packed 32 clips/program) / 1.41 ms (1 clip/program). At
(Q=3, T=7, C=256) XLA's batched tiny-attention is already faster than a
masked-full-attention kernel paying 8x head-mask + clip-mask redundancy —
so `ModelConfig.fused_attention` stays False by default; the kernel is
kept as the measured baseline for future shapes where fusion wins (longer
clips, more queries, wider channels).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _layer_norm(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _masked_attention(x, wqkv, bqkv, wout, bout, seq_mask, heads):
    """x (S, C) tokens; seq_mask (S, S) bool of allowed attention edges.
    Per-head restriction via lane masks; returns x + out_proj(attn)."""
    s, c = x.shape
    hd = c // heads
    qkv = jnp.dot(x, wqkv, preferred_element_type=jnp.float32) + bqkv
    # lane slices at C-multiples (128-aligned) are supported
    q = qkv[:, :c]
    k = qkv[:, c:2 * c]
    v = qkv[:, 2 * c:]
    neg = jnp.float32(-1e9)
    bias = jnp.where(seq_mask, 0.0, neg)            # (S, S)
    lane = jax.lax.broadcasted_iota(jnp.int32, (s, c), 1)
    out = jnp.zeros((s, c), jnp.float32)
    scale = jax.lax.rsqrt(jnp.float32(hd))
    for h in range(heads):
        hmask = ((lane // hd) == h).astype(jnp.float32)
        qh = q * hmask
        logits = jnp.dot(qh, k.T,
                         preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(logits + bias, axis=-1)
        out = out + jnp.dot(attn, v * hmask,
                            preferred_element_type=jnp.float32)
    out = jnp.dot(out, wout, preferred_element_type=jnp.float32) + bout
    return x + out


def _kernel(x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, lns_ref, lnb_ref,
            out_ref, *, heads, clip_length, num_queries):
    t, q = clip_length, num_queries
    s = t * q
    x = x_ref[0].astype(jnp.float32)                # (K*S, C): K clips
    ks = x.shape[0]
    wqkv = wqkv_ref[:].astype(jnp.float32)
    bqkv = bqkv_ref[:].astype(jnp.float32)
    wout = wout_ref[:].astype(jnp.float32)
    bout = bout_ref[:].astype(jnp.float32)
    lns = lns_ref[:].astype(jnp.float32)
    lnb = lnb_ref[:].astype(jnp.float32)

    # Token layout: clip-major, then frame, then clue. Masks restrict
    # attention to the same clip AND (same frame | same clue); packing K
    # clips per program turns the tiny per-clip attention into MXU-sized
    # (K*S, C) matmuls.
    row = jax.lax.broadcasted_iota(jnp.int32, (ks, ks), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (ks, ks), 1)
    same_clip = (row // s) == (col // s)
    spatial = same_clip & ((row % s) // q == (col % s) // q)   # same frame
    temporal = same_clip & ((row % q) == (col % q))            # same clue

    y = _masked_attention(x, wqkv, bqkv, wout, bout, spatial, heads)
    y = _layer_norm(y, lns, lnb)
    y = _masked_attention(y, wqkv, bqkv, wout, bout, temporal, heads)
    y = _layer_norm(y, lns, lnb)
    out_ref[0] = y.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=('clip_length', 'heads', 'interpret'))
def fused_stqi_attention(query: jnp.ndarray, wqkv: jnp.ndarray,
                         bqkv: jnp.ndarray, wout: jnp.ndarray,
                         bout: jnp.ndarray, ln_scale: jnp.ndarray,
                         ln_bias: jnp.ndarray, clip_length: int,
                         heads: int = 8,
                         interpret: bool | None = None) -> jnp.ndarray:
    """query (N=B*T, Q, C) -> (N, Q, C): spatial attn + LN + temporal attn
    + LN fused into one kernel launch (grid over clips).

    wqkv (C, 3C), bqkv (3C,), wout (C, C), bout (C,), ln_* (C,).
    """
    if interpret is None:       # auto: interpret off-TPU (tests on CPU)
        interpret = jax.default_backend() != 'tpu'
    n, q, c = query.shape
    t = clip_length
    assert n % t == 0, (n, t)
    b = n // t
    s = t * q
    # Pack up to 32 clips (672 tokens) per program; the clip-block mask
    # keeps them independent while the matmuls reach MXU-friendly sizes.
    k = b
    for cand in range(min(b, 32), 0, -1):
        if b % cand == 0:
            k = cand
            break
    x = query.reshape(b // k, k * s, c)

    out = pl.pallas_call(
        partial(_kernel, heads=heads, clip_length=t, num_queries=q),
        grid=(b // k,),
        in_specs=[
            pl.BlockSpec((1, k * s, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k * s, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b // k, k * s, c), query.dtype),
        interpret=interpret,
    )(x, wqkv, bqkv, wout, bout, ln_scale, ln_bias)
    return out.reshape(n, q, c)
