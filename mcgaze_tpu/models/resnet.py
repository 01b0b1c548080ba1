"""ResNet backbone (NHWC, frozen-BN), TPU-first.

Functional parity target: the reference's ResNet-50 configured with
frozen_stages=1, norm_eval=True (reference mmdet/models/backbones/resnet.py
+ configs/multiclue_gaze/multiclue_gaze_r50_gaze360.py:11-20), i.e. every
BatchNorm normalises with *running statistics* both at train and test time.
We therefore model BN as an affine transform whose mean/var live in a
separate 'stats' variable collection (never optimised, never decayed);
the stem+stage1 parameter freeze is applied as an optimizer mask, matching
`frozen_stages=1`.

TPU notes: NHWC layout (XLA's native conv layout on TPU), bf16-friendly
(params fp32, activations cast via `dtype`), everything static-shaped.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# depth -> (block counts per stage)
RESNET_SPECS = {
    18: (2, 2, 2, 2),
    26: (1, 1, 1, 1),  # bottleneck; tiny variant for fast tests
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
}
BASIC_DEPTHS = (18, 34)


class FrozenBatchNorm(nn.Module):
    """BN with running stats fixed (norm_eval=True semantics).

    scale/bias are trainable params; mean/var sit in the 'stats' collection
    so the optimizer and weight decay never touch them.
    """
    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param('scale', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        mean = self.variable('stats', 'mean',
                             lambda: jnp.zeros(self.features, jnp.float32))
        var = self.variable('stats', 'var',
                            lambda: jnp.ones(self.features, jnp.float32))
        inv = scale * jax.lax.rsqrt(var.value + self.eps)
        w = inv.astype(self.dtype)
        b = (bias - mean.value * inv).astype(self.dtype)
        return x * w + b


class Bottleneck(nn.Module):
    """torchvision-style bottleneck ('pytorch' style: stride on the 3x3)."""
    mid: int
    stride: int = 1
    expansion: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.mid * self.expansion
        identity = x
        y = nn.Conv(self.mid, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv1')(x)
        y = FrozenBatchNorm(self.mid, dtype=self.dtype, name='bn1')(y)
        y = nn.relu(y)
        y = nn.Conv(self.mid, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name='conv2')(y)
        y = FrozenBatchNorm(self.mid, dtype=self.dtype, name='bn2')(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv3')(y)
        y = FrozenBatchNorm(out_ch, dtype=self.dtype, name='bn3')(y)
        if x.shape[-1] != out_ch or self.stride != 1:
            identity = nn.Conv(out_ch, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name='downsample_conv')(x)
            identity = FrozenBatchNorm(out_ch, dtype=self.dtype,
                                       name='downsample_bn')(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """4-stage ResNet, returns the (C2, C3, C4, C5) pyramid (strides 4..32)."""
    depth: int = 50
    out_indices: Sequence[int] = (0, 1, 2, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        blocks = RESNET_SPECS[self.depth]
        assert self.depth not in BASIC_DEPTHS, 'bottleneck depths only'
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name='conv1')(x)
        x = FrozenBatchNorm(64, dtype=self.dtype, name='bn1')(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        mid = 64
        for stage, n_blocks in enumerate(blocks):
            stride = 1 if stage == 0 else 2
            for i in range(n_blocks):
                x = Bottleneck(mid, stride=stride if i == 0 else 1,
                               dtype=self.dtype,
                               name=f'layer{stage + 1}_{i}')(x)
            if stage in self.out_indices:
                outs.append(x)
            mid *= 2
        return tuple(outs)
