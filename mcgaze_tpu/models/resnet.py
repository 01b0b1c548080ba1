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
import numpy as np
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
        if x is None:
            # folded-affine access (w, b) in f32 for the fused-bottleneck
            # path; declares the same params/stats as the normal path
            return inv, bias - mean.value * inv
        w = inv.astype(self.dtype)
        b = (bias - mean.value * inv).astype(self.dtype)
        return x * w + b


class _Kernel(nn.Module):
    """Param-twin of nn.Conv: declares the identically named/shaped/
    initialised 'kernel' so the fused-bottleneck path produces the same
    parameter tree as the compute path (checkpoints interchange freely)."""
    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param('kernel', nn.initializers.lecun_normal(),
                          self.shape)


class Bottleneck(nn.Module):
    """torchvision-style bottleneck ('pytorch' style: stride on the 3x3)."""
    mid: int
    stride: int = 1
    expansion: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, collect: bool = False):
        if collect:
            return self._collect(x)
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

    def _collect(self, x):
        """Declare this block's params (same tree as the compute path)
        and return (conv kernel, folded-BN (w, b)) pairs for
        ops/fused_bottleneck.py. Only valid for stride-1 blocks."""
        assert self.stride == 1, 'fused chains are stride-1 only'
        out_ch = self.mid * self.expansion
        cin = x.shape[-1]
        args = [
            _Kernel((1, 1, cin, self.mid), name='conv1')(),
            FrozenBatchNorm(self.mid, dtype=self.dtype, name='bn1')(None),
            _Kernel((3, 3, self.mid, self.mid), name='conv2')(),
            FrozenBatchNorm(self.mid, dtype=self.dtype, name='bn2')(None),
            _Kernel((1, 1, self.mid, out_ch), name='conv3')(),
            FrozenBatchNorm(out_ch, dtype=self.dtype, name='bn3')(None),
        ]
        if cin != out_ch:
            args += [
                _Kernel((1, 1, cin, out_ch), name='downsample_conv')(),
                FrozenBatchNorm(out_ch, dtype=self.dtype,
                                name='downsample_bn')(None),
            ]
        return args


# Per-pallas-call folded-weight budget: layer4's per-block ~9 MB of bf16
# weights must stay under VMEM (~16 MB) alongside double-buffered
# activations, so chains are split greedily at this limit.
_FUSED_WEIGHT_BUDGET = 10 * 2 ** 20


class ResNet(nn.Module):
    """4-stage ResNet, returns the (C2, C3, C4, C5) pyramid (strides 4..32).

    fused_blocks runs stride-1 bottlenecks through the fused pallas chain
    (ops/fused_bottleneck.py) — same parameter tree, same numerics.
    True fuses every stage; a tuple of stage indices (0-based) fuses only
    those stages (layer1's 64-wide mid channels pad to 128 MXU lanes, so
    per-stage selection matters). Stride-2 lead-in blocks stay on the XLA
    path.
    """
    depth: int = 50
    out_indices: Sequence[int] = (0, 1, 2, 3)
    dtype: jnp.dtype = jnp.float32
    fused_blocks: bool | Sequence[int] = False
    # Space-to-depth stem (the MLPerf ResNet trick): rewrite the
    # 7x7-stride-2 conv on (H, W, 3) as a 4x4-stride-1 conv on the 2x2
    # space-to-depth input (H/2, W/2, 12). Numerically the SAME dot
    # products (the 7x7 kernel zero-pads to 8x8 and regroups — done
    # in-forward, so the parameter stays the torchvision (7,7,3,64)
    # layout and checkpoints are unaffected). Equality pinned by
    # tests/test_torch_parity.py::test_s2d_stem_matches_plain.
    # MEASURED NEUTRAL on the v5e-1 (224 frames, 224 px, bf16, serial
    # chains): full backbone 18.53 ms plain vs 18.77 ms s2d — XLA
    # already lays out the in-context 3-channel stem well, so this
    # stays opt-in (same discipline as fused_blocks). The classic win
    # applies when the stem is input-layout-bound, which this program
    # is not.
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x):
        blocks = RESNET_SPECS[self.depth]
        assert self.depth not in BASIC_DEPTHS, 'bottleneck depths only'
        if self.s2d_stem:
            x = self._s2d_stem(x)
        else:
            x = nn.Conv(64, (7, 7), strides=(2, 2),
                        padding=[(3, 3), (3, 3)], use_bias=False,
                        dtype=self.dtype, name='conv1')(x)
        x = FrozenBatchNorm(64, dtype=self.dtype, name='bn1')(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        mid = 64
        for stage, n_blocks in enumerate(blocks):
            stride = 1 if stage == 0 else 2
            start = 0
            if stride != 1:
                # stride-2 lead-in block on the XLA path
                x = Bottleneck(mid, stride=stride, dtype=self.dtype,
                               name=f'layer{stage + 1}_0')(x)
                start = 1
            fuse = (self.fused_blocks is True
                    or (not isinstance(self.fused_blocks, bool)
                        and stage in tuple(self.fused_blocks)))
            if fuse:
                x = self._fused_chain(x, stage, mid, range(start, n_blocks))
            else:
                for i in range(start, n_blocks):
                    x = Bottleneck(mid, stride=1, dtype=self.dtype,
                                   name=f'layer{stage + 1}_{i}')(x)
            if stage in self.out_indices:
                outs.append(x)
            mid *= 2
        return tuple(outs)

    def _s2d_stem(self, x):
        """conv1 as a space-to-depth 4x4 conv (docstring at s2d_stem).

        Output pixel o of the stride-2 conv reads padded-input columns
        P[2o .. 2o+6] (pad 3 each side). Grouping P pairwise
        (G[g] = (P[2g], P[2g+1]), 230 -> 115 groups for H=224) makes
        that window groups g = o..o+3 — a 4-tap stride-1 conv whose
        kernel tap (kk, r) is 7x7-kernel tap 2kk+r (tap index 7 hits
        the zero pad row/col). Declares the SAME conv1/kernel param
        (7, 7, 3, 64) as the plain stem and regroups it in-forward.
        """
        n, h, w, c = x.shape
        assert h % 2 == 0 and w % 2 == 0, 's2d stem needs even H, W'
        k7 = _Kernel((7, 7, 3, 64), name='conv1')()
        k8 = jnp.pad(k7, ((0, 1), (0, 1), (0, 0), (0, 0)))
        k4 = (k8.reshape(4, 2, 4, 2, 3, 64)
              .transpose(0, 2, 1, 3, 4, 5)
              .reshape(4, 4, 4 * 3, 64)).astype(self.dtype)
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        xg = (xp.reshape(n, (h + 6) // 2, 2, (w + 6) // 2, 2, c)
              .transpose(0, 1, 3, 2, 4, 5)
              .reshape(n, (h + 6) // 2, (w + 6) // 2, 4 * c))
        return jax.lax.conv_general_dilated(
            xg, k4, window_strides=(1, 1), padding='VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    def _fused_chain(self, x, stage, mid, block_ids):
        from ..ops.fused_bottleneck import (fold_block_params,
                                            fused_bottleneck_chain_diff)
        n, h, w, c = x.shape
        groups, cur, cur_bytes = [], [], 0
        cin = c
        for i in block_ids:
            # collect only reads the channel count; block inputs widen to
            # mid*4 after the first chained block
            x_like = jnp.zeros((1, 1, 1, cin), self.dtype)
            args = Bottleneck(mid, stride=1, dtype=self.dtype,
                              name=f'layer{stage + 1}_{i}')(x_like,
                                                            collect=True)
            cin = mid * 4
            folded = fold_block_params(*args, dtype=self.dtype)
            nbytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                         for a in folded)
            if cur and cur_bytes + nbytes > _FUSED_WEIGHT_BUDGET:
                groups.append(tuple(cur))
                cur, cur_bytes = [], 0
            cur.extend(folded)
            cur_bytes += nbytes
        if cur:
            groups.append(tuple(cur))
        y = x.reshape(n, h * w, c)
        for weights in groups:
            y = fused_bottleneck_chain_diff(y, weights, h, w)
        return y.reshape(n, h, w, y.shape[-1])
