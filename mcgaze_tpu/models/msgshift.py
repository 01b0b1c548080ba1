"""MsgShifT: PVTv2 backbone with temporal messenger-token shift (TeViT).

Reference: /root/reference/mmdet/models/backbones/msgshift.py (763 LoC,
the "Temporally Efficient Vision Transformer" backbone, arXiv
2105.01928). Architecture as shipped by the `MsgShifT` subclass
(msgshift.py:751-763): PVTv2 — patch sizes (7,3,3,3), strides
(4,2,2,2), pads (3,1,1,1), no absolute position embedding, LayerNorm
after each stage, convolutional FFN — with `num_msg_tokens` learned
messenger tokens that ride along every stage and are rolled across the
clip's time axis after each encoder layer (msgshift.py:435-441):
tokens are chunked into len(shift_strides) groups, group g rolls by
shift_strides[g] frames (sign alternating per layer, last layer of an
odd-depth stage unshifted — msgshift.py:677-684). The messengers are
the ONLY cross-frame channel: remove them and the backbone is
frame-independent.

Messenger tokens have no spatial extent, so every conv the spatial
tokens pass through is applied to them as the conv's spatially-summed
kernel (a plain matmul): msgshift.py:142 (patch embed), :225-229
(MixFFN fc1/dwconv/fc2), :312 (SRA spatial reduction). This equals
running the conv on a constant patch holding the token
(tests/test_msgshift.py pins that identity).

TPU-first notes: NHWC layout throughout; the temporal roll is a static
jnp.roll on a (B, T, groups, tokens/group, C) view — XLA lowers it to a
collective-free relayout; all stages unroll into the enclosing jit.
LayerNorm epsilon is 1e-6 here (norm_cfg at msgshift.py:586), unlike
the heads' torch-default 1e-5.

DropPath (stochastic depth): the reference wraps both residual adds of
every encoder layer in DropPath with a linear 0 -> drop_path_rate (0.1)
ramp over the 16 layers (msgshift.py:408,420,581,638: the
`dropout_layer=dict(type='DropPath')` on attention and FFN, rates from
torch.linspace). Replicated here as per-frame bernoulli masks on the
residual branches, active only when the caller passes
``deterministic=False`` AND provides a ``'droppath'`` RNG (the query
train step threads a per-step fold_in key); eval numerics are untouched
(tests/test_msgshift.py pins eval == drop_path_rate=0 forward).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

LN_EPS_PVT = 1e-6


class CrossMHA(nn.Module):
    """torch.nn.MultiheadAttention with distinct query / key-value inputs
    and packed in_proj layout (kernel (E, 3E) = torch in_proj_weight.T),
    matching models/heads.py::TorchMHA's import convention."""
    embed: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, kv_in):
        e, h = self.embed, self.heads
        hd = e // h
        # Packed (E, 3E) in-proj, full GEMM on both inputs then sliced.
        # MEASURED: slicing the kernel per path instead (q pays only its
        # E-wide third — "don't compute 3E and discard 2/3") is SLOWER
        # on the v5e-1: whole MsgShifT fwd 11x384x640 bf16 = 30.0 ms
        # full-3E vs 31.6 ms sliced-q + packed-kv (31.7 fully split) —
        # the 3E-wide GEMM tiles the MXU lanes better than three E-wide
        # ones, so the "wasted" columns are free. Keep the packed form.
        qkv = nn.Dense(3 * e, dtype=self.dtype, name='qkv')
        q = qkv(q_in)[..., :e]
        kv = qkv(kv_in)
        k, v = kv[..., e:2 * e], kv[..., 2 * e:]

        def split(t):
            b, s = t.shape[0], t.shape[1]
            return t.reshape(b, s, h, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        logits = jnp.einsum('bhqd,bhkd->bhqk', qh, kh,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.asarray(hd, jnp.float32))
        attn = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        out = jnp.einsum('bhqk,bhkd->bhqd', attn, vh)
        b, s = q_in.shape[0], q_in.shape[1]
        out = out.transpose(0, 2, 1, 3).reshape(b, s, e)
        return nn.Dense(e, dtype=self.dtype, name='out')(out)


class PatchEmbed(nn.Module):
    """Strided conv patch embedding; messenger tokens go through the
    spatially-summed kernel (msgshift.py:125-148)."""
    embed_dim: int
    patch: int
    stride: int
    pad: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, msg):
        """x (N, H, W, C); msg (N, M, C) -> (x', (h, w), msg')."""
        conv = nn.Conv(self.embed_dim, (self.patch, self.patch),
                       strides=(self.stride, self.stride),
                       padding=[(self.pad, self.pad), (self.pad, self.pad)],
                       dtype=self.dtype, name='proj')
        x = conv(x)
        kernel = conv.variables['params']['kernel']          # (k,k,C,E)
        bias = conv.variables['params']['bias']
        w_sum = kernel.sum((0, 1)).astype(self.dtype)        # (C, E)
        msg = msg @ w_sum + bias.astype(self.dtype)
        h, w = x.shape[1], x.shape[2]
        x = x.reshape(x.shape[0], h * w, self.embed_dim)
        norm = nn.LayerNorm(epsilon=LN_EPS_PVT, dtype=self.dtype,
                            name='norm')
        return norm(x), (h, w), norm(msg)


class SRAttention(nn.Module):
    """Spatial-reduction attention over [spatial tokens; messengers]
    (msgshift.py:306-338): queries are the concatenation, keys/values
    are the sr-conv-reduced spatial tokens concatenated with the
    sr-projected messengers, both LayerNormed."""
    channels: int
    heads: int
    sr_ratio: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw, msg):
        n, _l, c = x.shape
        m = msg.shape[1]
        h, w = hw
        x_q = jnp.concatenate([x, msg], axis=1)
        if self.sr_ratio > 1:
            sr = nn.Conv(self.channels, (self.sr_ratio, self.sr_ratio),
                         strides=(self.sr_ratio, self.sr_ratio),
                         dtype=self.dtype, name='sr')
            x_kv = sr(x.reshape(n, h, w, c))
            x_kv = x_kv.reshape(n, -1, c)
            kernel = sr.variables['params']['kernel']
            bias = sr.variables['params']['bias']
            msg_kv = msg @ kernel.sum((0, 1)).astype(self.dtype) \
                + bias.astype(self.dtype)
            x_kv = jnp.concatenate([x_kv, msg_kv], axis=1)
            x_kv = nn.LayerNorm(epsilon=LN_EPS_PVT, dtype=self.dtype,
                                name='sr_norm')(x_kv)
        else:
            x_kv = x
        out = CrossMHA(self.channels, self.heads, dtype=self.dtype,
                       name='attn')(x_q, x_kv)
        return out[:, :-m], out[:, -m:]


class MixFFN(nn.Module):
    """1x1 conv -> 3x3 depthwise -> GELU -> 1x1 conv (msgshift.py:150-236);
    messengers take the spatially-summed kernels (:225-229 — the
    depthwise conv becomes a per-channel scale)."""
    channels: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw, msg):
        n, _l, c = x.shape
        h, w = hw
        fc1 = nn.Conv(self.hidden, (1, 1), dtype=self.dtype, name='fc1')
        dw = nn.Conv(self.hidden, (3, 3), padding=[(1, 1), (1, 1)],
                     feature_group_count=self.hidden, dtype=self.dtype,
                     name='dw')
        fc2 = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name='fc2')
        y = fc1(x.reshape(n, h, w, c))
        y = nn.gelu(dw(y), approximate=False)
        y = fc2(y).reshape(n, h * w, c)

        msg = msg @ fc1.variables['params']['kernel'][0, 0].astype(self.dtype) \
            + fc1.variables['params']['bias'].astype(self.dtype)
        dw_scale = dw.variables['params']['kernel'].sum((0, 1, 2)
                                                        ).astype(self.dtype)
        msg = msg * dw_scale + dw.variables['params']['bias'].astype(self.dtype)
        msg = nn.gelu(msg, approximate=False)
        msg = msg @ fc2.variables['params']['kernel'][0, 0].astype(self.dtype) \
            + fc2.variables['params']['bias'].astype(self.dtype)
        return y, msg


def shift_msg_tokens(msg: jnp.ndarray, clip_length: int,
                     strides: Tuple[int, ...]) -> jnp.ndarray:
    """Roll messenger-token groups across the time axis
    (msgshift.py:436-440). msg (B*T, M, C), M divisible by len(strides)."""
    bt, m, c = msg.shape
    t = clip_length
    b = bt // t
    g = len(strides)
    msg = msg.reshape(b, t, g, m // g, c)
    rolled = [jnp.roll(msg[:, :, i], s, axis=1) for i, s in
              enumerate(strides)]
    return jnp.stack(rolled, axis=2).reshape(bt, m, c)


class PVTEncoderLayer(nn.Module):
    channels: int
    heads: int
    hidden: int
    sr_ratio: int
    # stochastic-depth rate for this layer's two residual branches
    # (reference msgshift.py:408,420: DropPath around attention and FFN,
    # independent masks per branch, shared across the spatial and
    # messenger tokens of a frame — they form ONE token sequence there)
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def _branch_mask(self, n):
        """Per-frame keep/scale mask, mmcv DropPath semantics: sample a
        bernoulli(keep) per leading-dim row, scale kept rows 1/keep."""
        keep = 1.0 - self.drop_path
        mask = jax.random.bernoulli(self.make_rng('droppath'), keep,
                                    (n, 1, 1))
        return mask.astype(self.dtype) / keep

    @nn.compact
    def __call__(self, x, hw, msg, deterministic: bool = True):
        drop = self.drop_path > 0.0 and not deterministic
        norm1 = nn.LayerNorm(epsilon=LN_EPS_PVT, dtype=self.dtype,
                             name='norm1')
        ax, amsg = SRAttention(self.channels, self.heads, self.sr_ratio,
                               dtype=self.dtype, name='attn')(
                                   norm1(x), hw, norm1(msg))
        if drop:
            m = self._branch_mask(x.shape[0])
            ax, amsg = ax * m, amsg * m
        x, msg = x + ax, msg + amsg
        norm2 = nn.LayerNorm(epsilon=LN_EPS_PVT, dtype=self.dtype,
                             name='norm2')
        fx, fmsg = MixFFN(self.channels, self.hidden, dtype=self.dtype,
                          name='ffn')(norm2(x), hw, norm2(msg))
        if drop:
            m = self._branch_mask(x.shape[0])
            fx, fmsg = fx * m, fmsg * m
        return x + fx, msg + fmsg


class MsgShifT(nn.Module):
    """The shipped MsgShifT configuration (msgshift.py:563-589,751-763).

    Call with (B*T, H, W, 3) frames; H, W multiples of 32. Returns the
    4-level pyramid (strides 4/8/16/32, channels 64/128/320/512) ready
    for the shared FPN neck.
    """
    num_msg_tokens: int = 32
    shift_strides: Tuple[int, ...] = (1, -1, 2, -2)
    embed_dim: int = 64
    num_layers: Tuple[int, ...] = (3, 4, 6, 3)
    num_heads: Tuple[int, ...] = (1, 2, 5, 8)
    patch_sizes: Tuple[int, ...] = (7, 3, 3, 3)
    strides: Tuple[int, ...] = (4, 2, 2, 2)
    paddings: Tuple[int, ...] = (3, 1, 1, 1)
    sr_ratios: Tuple[int, ...] = (8, 4, 2, 1)
    mlp_ratios: Tuple[int, ...] = (8, 8, 4, 4)
    # stochastic-depth ceiling; per-layer rate ramps linearly 0 -> this
    # over the 16 layers (reference msgshift.py:581 default 0.1, :638
    # torch.linspace rule). Only active with deterministic=False + a
    # 'droppath' RNG; the default eval/parity paths are unchanged.
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @property
    def stage_channels(self):
        return tuple(self.embed_dim * h for h in self.num_heads)

    @nn.compact
    def __call__(self, x, clip_length: int, deterministic: bool = True):
        """x (B*T, H, W, 3) -> 4-level tuple of NHWC features."""
        msg0 = self.param('msg_tokens',
                          nn.initializers.truncated_normal(0.02),
                          (1, self.num_msg_tokens, 3))
        msg = jnp.broadcast_to(msg0, (x.shape[0],) + msg0.shape[1:]
                               ).astype(self.dtype)
        total = sum(self.num_layers)
        outs = []
        gl = 0                        # global layer index for the ramp
        for i, depth in enumerate(self.num_layers):
            ch = self.stage_channels[i]
            x, hw, msg = PatchEmbed(ch, self.patch_sizes[i],
                                    self.strides[i], self.paddings[i],
                                    dtype=self.dtype,
                                    name=f'patch_embed{i}')(x, msg)
            for lid in range(depth):
                dpr = self.drop_path_rate * gl / max(total - 1, 1)
                gl += 1
                x, msg = PVTEncoderLayer(
                    ch, self.num_heads[i], self.mlp_ratios[i] * ch,
                    self.sr_ratios[i], drop_path=dpr, dtype=self.dtype,
                    name=f'stage{i}_layer{lid}')(
                        x, hw, msg, deterministic=deterministic)
                # shift directions alternate per layer; the last layer of
                # an odd-depth stage does not shift (msgshift.py:677-684)
                last_odd = (lid == depth - 1) and (depth % 2 == 1)
                if not last_odd:
                    strides = (self.shift_strides if lid % 2 == 0 else
                               tuple(-s for s in self.shift_strides))
                    msg = shift_msg_tokens(msg, clip_length, strides)
            norm = nn.LayerNorm(epsilon=LN_EPS_PVT, dtype=self.dtype,
                                name=f'stage{i}_norm')
            x, msg = norm(x), norm(msg)
            h, w = hw
            outs.append(x.reshape(x.shape[0], h, w, ch))
            x = outs[-1]
        return tuple(outs)
