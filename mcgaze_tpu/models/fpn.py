"""Feature Pyramid Network (reference mmdet/models/necks/fpn.py configured
as in configs/multiclue_gaze/multiclue_gaze_r50_gaze360.py:21-27:
in [256,512,1024,2048] -> 4 outs of 256, add_extra_convs='on_input' which is
a no-op when num_outs == len(in_channels)).

Top-down pathway uses exact 2x nearest upsampling (inputs are padded to a
multiple of 32 by the data pipeline, so adjacent levels are exact doubles) —
implemented as a reshape-broadcast, which XLA lowers to a cheap relayout.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        assert len(inputs) == self.num_outs, 'extra-conv levels not needed'
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f'lateral_{i}')(x) for i, x in enumerate(inputs)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + upsample2x_nearest(laterals[i])
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name=f'fpn_{i}')(x)
            for i, x in enumerate(laterals)
        ]
        return tuple(outs)
