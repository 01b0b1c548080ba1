"""Query-interaction and gaze heads.

Re-designs of the reference heads as static-shape flax modules:
  * STQIHead  -> mmdet/models/roi_heads/bbox_heads/gaze_stqi_head.py
                 (spatial + temporal self-attention with ONE shared
                 attention module and ONE shared LayerNorm, DynamicConv
                 instance interaction, FFN, per-clue cls/reg towers)
  * GazeHead  -> mmdet/models/roi_heads/mask_heads/gaze_head.py
                 (per-clue gaze towers, detached confidence towers,
                 learned 9->3 fusion, unit-normalised outputs)

The dual-layout attention of the reference (seq=3 queries over batch B*T,
then seq=T frames over batch B*3) is kept as two calls into the same
module — with (3, T) = (3, 7) these are tiny MXU ops that XLA fuses into
the surrounding GEMMs; the win on TPU comes from batching B*T, not from a
bespoke kernel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch/mmcv nn.LayerNorm epsilon (flax's default is 1e-6) — checkpoint
# parity requires matching it everywhere.
LN_EPS = 1e-5


class TorchMHA(nn.Module):
    """Self-attention numerically equivalent to torch.nn.MultiheadAttention
    wrapped by mmcv's residual MultiheadAttention brick (identity + attn).

    Param layout uses fused qkv/out Dense kernels of shape (E, 3E)/(E, E) so
    a torch `in_proj_weight` imports as its transpose.
    """
    embed: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, S, E) -> (B, S, E) with residual added."""
        e, h = self.embed, self.heads
        hd = e // h
        qkv = nn.Dense(3 * e, dtype=self.dtype, name='qkv')(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, s = x.shape[0], x.shape[1]

        def heads_split(t):
            return t.reshape(b, s, h, hd).transpose(0, 2, 1, 3)

        q, k, v = map(heads_split, (q, k, v))
        logits = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.asarray(hd, jnp.float32))
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum('bhqk,bhkd->bhqd', attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, e)
        out = nn.Dense(e, dtype=self.dtype, name='out')(out)
        return x + out  # mmcv MultiheadAttention residual


class _DenseParams(nn.Module):
    """Declares a Dense layer's params WITHOUT computing — lets the fused
    pallas attention path own the math while keeping the param tree (and
    the per-path init RNG draws) identical to the unfused nn.Dense."""
    in_features: int
    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param('kernel', nn.initializers.lecun_normal(),
                       (self.in_features, self.out_features))
        if not self.use_bias:
            return (k,)
        b = self.param('bias', nn.initializers.zeros, (self.out_features,))
        return k, b


class _LayerNormParams(nn.Module):
    features: int

    @nn.compact
    def __call__(self):
        s = self.param('scale', nn.initializers.ones, (self.features,))
        b = self.param('bias', nn.initializers.zeros, (self.features,))
        return s, b


class _MLPTowerParams(nn.Module):
    """Param tree of MLPTower (fc{i} Dense-no-bias + ln{i} LayerNorm)
    WITHOUT computing — the batched-clue path stacks the per-clue kernels
    and runs ONE batched GEMM per layer. Same names/shapes as MLPTower,
    so the init RNG draws and every checkpoint remain identical."""
    features: int
    num_layers: int
    in_features: int

    @nn.compact
    def __call__(self):
        layers = []
        fin = self.in_features
        for i in range(self.num_layers):
            (k,) = _DenseParams(fin, self.features, use_bias=False,
                                name=f'fc{i}')()
            s, b = _LayerNormParams(self.features, name=f'ln{i}')()
            layers.append((k, s, b))
            fin = self.features
        return layers


def _layer_norm(x32, scale, bias, eps=LN_EPS):
    """LayerNorm over the last dim in fp32 (matches nn.LayerNorm, whose
    statistics are computed in at-least-float32)."""
    mean = jnp.mean(x32, -1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x32 * x32, -1, keepdims=True) - mean * mean, 0.0)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _batched_towers(x, towers, dtype):
    """x: (N, Q, C); towers: per-clue list of _MLPTowerParams layer lists.
    Runs the Q per-clue MLP towers as one batched GEMM + per-clue
    LayerNorm per layer (Q=3 towers of identical shape -> a single
    (Q, C, C') bmm the MXU executes in one dispatch, instead of Q
    separate Dense calls; the heads path is latency-bound)."""
    q = len(towers)
    for li in range(len(towers[0])):
        kern = jnp.stack([t[li][0] for t in towers]).astype(dtype)
        scale = jnp.stack([t[li][1] for t in towers])[None]
        bias = jnp.stack([t[li][2] for t in towers])[None]
        y = jnp.einsum('nqc,qcd->nqd', x.astype(dtype), kern,
                       preferred_element_type=jnp.float32)
        x = nn.relu(_layer_norm(y, scale, bias)).astype(dtype)
    return x


def _batched_heads(x, heads, dtype):
    """x: (N, Q, C); heads: per-clue (kernel, bias) from _DenseParams.
    One (Q, C, O) batched GEMM replacing Q tiny Dense calls."""
    kern = jnp.stack([h[0] for h in heads]).astype(dtype)
    bias = jnp.stack([h[1] for h in heads]).astype(dtype)
    return (jnp.einsum('nqc,qco->nqo', x.astype(dtype), kern,
                       preferred_element_type=jnp.float32).astype(dtype)
            + bias[None])


class MLPTower(nn.Module):
    """n x (Dense-no-bias -> LayerNorm -> ReLU), as used by every cls/reg/
    gaze projection tower in the reference heads."""
    features: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                         name=f'fc{i}')(x)
            x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name=f'ln{i}')(x)
            x = nn.relu(x)
        return x


class DynamicConv(nn.Module):
    """Query-conditioned 1x1 conv over the RoI feature
    (reference mmdet/models/utils/transformer.py:1055-1164)."""
    channels: int = 256
    feat_channels: int = 64
    roi_size: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, roi):
        """query: (M, C); roi: (M, S, S, C) -> (M, C)."""
        c, f = self.channels, self.feat_channels
        m = query.shape[0]
        hw = self.roi_size * self.roi_size
        params = nn.Dense(2 * c * f, dtype=self.dtype,
                          name='dynamic_layer')(query)
        p_in = params[:, :c * f].reshape(m, c, f)
        p_out = params[:, c * f:].reshape(m, f, c)

        x = roi.reshape(m, hw, c)
        x = jnp.einsum('msc,mcf->msf', x, p_in,
                       preferred_element_type=jnp.float32).astype(self.dtype)
        x = nn.relu(nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name='norm_in')(x))
        x = jnp.einsum('msf,mfc->msc', x, p_out,
                       preferred_element_type=jnp.float32).astype(self.dtype)
        x = nn.relu(nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name='norm_out')(x))
        x = x.reshape(m, hw * c)
        x = nn.Dense(c, dtype=self.dtype, name='fc_layer')(x)
        x = nn.relu(nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name='fc_norm')(x))
        return x


class STQIHead(nn.Module):
    """One refinement stage: spatio-temporal query interaction + per-clue
    classification logits and box deltas."""
    channels: int = 256
    num_heads: int = 8
    ffn_channels: int = 2048
    feat_channels: int = 64
    roi_size: int = 7
    num_queries: int = 3
    num_cls_fcs: int = 1
    num_reg_fcs: int = 3
    fused_attention: bool = False
    batched_clues: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feat, query, clip_length):
        """roi_feat: (N*Q, S, S, C); query: (N, Q, C); N = B*T.

        Returns (cls_logits (N, Q, 1), deltas (N, Q, 4), obj_feat (N, Q, C)).
        """
        n, nq, c = query.shape
        t = clip_length
        b = n // t

        if self.fused_attention:
            # One pallas kernel per stage for (a)+(b)+both LNs
            # (ops/stqi_attention.py). Param tree identical to the unfused
            # path: 'attention/{qkv,out}' + 'attention_norm'.
            from ..ops.stqi_attention import fused_stqi_attention

            class _W(nn.Module):
                channels: int

                @nn.compact
                def __call__(self):
                    return (_DenseParams(self.channels, 3 * self.channels,
                                         name='qkv')(),
                            _DenseParams(self.channels, self.channels,
                                         name='out')())

            (wqkv, bqkv), (wout, bout) = _W(self.channels,
                                            name='attention')()
            lns, lnb = _LayerNormParams(self.channels,
                                        name='attention_norm')()
            q = fused_stqi_attention(query.astype(jnp.float32), wqkv, bqkv,
                                     wout, bout, lns, lnb,
                                     clip_length=t, heads=self.num_heads)
            q = q.astype(self.dtype)
        else:
            attn = TorchMHA(self.channels, self.num_heads, dtype=self.dtype,
                            name='attention')
            attn_norm = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                                     name='attention_norm')

            # (a) spatial self-attention: the Q clue queries of each frame
            # attend to each other (batch = B*T).
            q = attn_norm(attn(query))
            # (b) temporal self-attention with the SAME weights and norm:
            # each clue query attends across the T frames (batch = B*Q).
            q = q.reshape(b, t, nq, c).transpose(0, 2, 1, 3).reshape(
                b * nq, t, c)
            q = attn_norm(attn(q))
            q = q.reshape(b, nq, t, c).transpose(0, 2, 1, 3).reshape(
                n, nq, c)

        # (c) instance-interactive DynamicConv + residual + LN.
        flat_q = q.reshape(n * nq, c)
        iic = DynamicConv(self.channels, self.feat_channels, self.roi_size,
                          dtype=self.dtype,
                          name='instance_interactive_conv')(flat_q, roi_feat)
        obj = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name='iic_norm')(flat_q + iic)

        # (d) FFN (residual inside, norm after — mmcv FFN + ffn_norm).
        y = nn.Dense(self.ffn_channels, dtype=self.dtype, name='ffn_fc1')(obj)
        y = nn.relu(y)
        y = nn.Dense(self.channels, dtype=self.dtype, name='ffn_fc2')(y)
        obj = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name='ffn_norm')(obj + y)

        # (e) towers + per-clue linear heads.
        cls_feat = MLPTower(c, self.num_cls_fcs, dtype=self.dtype,
                            name='cls_tower')(obj).reshape(n, nq, c)
        reg_feat = MLPTower(c, self.num_reg_fcs, dtype=self.dtype,
                            name='reg_tower')(obj).reshape(n, nq, c)
        clues = ('face', 'eyes', 'head')[:nq]
        if self.batched_clues:
            cls_heads = [_DenseParams(c, 1, name=f'{clue}_fc_cls')()
                         for clue in clues]
            reg_heads = [_DenseParams(c, 4, name=f'{clue}_fc_reg')()
                         for clue in clues]
            cls_logits = _batched_heads(cls_feat, cls_heads, self.dtype)
            deltas = _batched_heads(reg_feat, reg_heads, self.dtype)
        else:
            cls_logits = jnp.stack(
                [nn.Dense(1, dtype=self.dtype,
                          name=f'{clue}_fc_cls')(cls_feat[:, i])
                 for i, clue in enumerate(clues)], axis=1)  # (N, Q, 1)
            deltas = jnp.stack(
                [nn.Dense(4, dtype=self.dtype,
                          name=f'{clue}_fc_reg')(reg_feat[:, i])
                 for i, clue in enumerate(clues)], axis=1)  # (N, Q, 4)
        return cls_logits, deltas, obj.reshape(n, nq, c)


class GazeHead(nn.Module):
    """Per-clue gaze regression + confidence-weighted fusion."""
    channels: int = 256
    gaze_dim: int = 3
    batched_clues: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obj_feat):
        """obj_feat: (N, Q=3, C) -> dict of unit gaze vectors (N, 3)."""
        eps_free_norm = lambda v: v / jnp.linalg.norm(v, axis=-1,
                                                      keepdims=True)
        if self.batched_clues:
            # Same params, one (3, C, C') bmm per tower layer instead of
            # three Dense calls (reference towers at gaze_head.py:71-107
            # are identical shapes per clue).
            c = self.channels
            clues = ('face', 'eyes', 'head')
            towers_g = [_MLPTowerParams(c, 2, c, name=f'gaze_{clue}_fcs')()
                        for clue in clues]
            heads_g = [_DenseParams(c, 3, name=f'fc_{clue}')()
                       for clue in clues]
            towers_c = [_MLPTowerParams(c, 2, c,
                                        name=f'gaze_{clue}_confidence')()
                        for clue in clues]
            heads_c = [_DenseParams(c, self.gaze_dim,
                                    name=f'fc_{clue}_confidence')()
                       for clue in clues]
            g = _batched_towers(obj_feat, towers_g, self.dtype)
            gazes_q = _batched_heads(g, heads_g, self.dtype)   # (N, 3, 3)
            # Confidence towers see DETACHED features (gaze_head.py:168).
            f = _batched_towers(jax.lax.stop_gradient(obj_feat),
                                towers_c, self.dtype)
            confs_q = _batched_heads(f, heads_c, self.dtype)   # (N, 3, 3)
            n = obj_feat.shape[0]
            # (N, Q, 3) -> (N, 9) q-major == concat([c_i * g_i], -1)
            fused_in = (confs_q * gazes_q).reshape(n, 3 * 3)
            fusion = nn.Dense(3, dtype=self.dtype,
                              name='fc_gaze')(fused_in)
            return dict(
                fusion=eps_free_norm(fusion),
                face=eps_free_norm(gazes_q[:, 0]),
                eyes=eps_free_norm(gazes_q[:, 1]),
                head=eps_free_norm(gazes_q[:, 2]),
            )
        gazes = []
        confs = []
        for i, clue in enumerate(('face', 'eyes', 'head')):
            g = MLPTower(self.channels, 2, dtype=self.dtype,
                         name=f'gaze_{clue}_fcs')(obj_feat[:, i])
            gazes.append(nn.Dense(3, dtype=self.dtype,
                                  name=f'fc_{clue}')(g))
            # Confidence towers see DETACHED features (gaze_head.py:168-181).
            f = jax.lax.stop_gradient(obj_feat[:, i])
            f = MLPTower(self.channels, 2, dtype=self.dtype,
                         name=f'gaze_{clue}_confidence')(f)
            confs.append(nn.Dense(self.gaze_dim, dtype=self.dtype,
                                  name=f'fc_{clue}_confidence')(f))
        fused_in = jnp.concatenate([c * g for c, g in zip(confs, gazes)],
                                   axis=-1)                  # (N, 9)
        fusion = nn.Dense(3, dtype=self.dtype, name='fc_gaze')(fused_in)
        return dict(
            fusion=eps_free_norm(fusion),
            face=eps_free_norm(gazes[0]),
            eyes=eps_free_norm(gazes[1]),
            head=eps_free_norm(gazes[2]),
        )
