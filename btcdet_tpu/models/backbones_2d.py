"""Dense BEV 2D backbone (reference
`btcdet/models/backbones_2d/base_bev_backbone.py`).

Conv pyramid with per-block stride + transposed-conv upsampling and
channel concat. NHWC layout, BN eps 1e-3 / torch-momentum 0.01 like the
reference. This is dense conv2d -- pure MXU work, left to XLA.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class _BN(nn.Module):
    momentum: float = 0.01  # torch convention
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.momentum,  # flax decay convention
            epsilon=self.epsilon,
        )(x)


class BaseBEVBackbone(nn.Module):
    layer_nums: Sequence[int]
    layer_strides: Sequence[int]
    num_filters: Sequence[int]
    upsample_strides: Sequence[int]
    num_upsample_filters: Sequence[int]

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, C) -> (B, H, W, sum(num_upsample_filters))."""
        ups = []
        for i, n_layers in enumerate(self.layer_nums):
            x = nn.Conv(
                self.num_filters[i], (3, 3), strides=self.layer_strides[i],
                padding=1, use_bias=False,
            )(x)
            x = _BN()(x, train)
            x = nn.relu(x)
            for _ in range(n_layers):
                x = nn.Conv(self.num_filters[i], (3, 3), padding=1, use_bias=False)(x)
                x = _BN()(x, train)
                x = nn.relu(x)
            if i < len(self.upsample_strides):
                s = self.upsample_strides[i]
                if s > 1:
                    u = nn.ConvTranspose(
                        self.num_upsample_filters[i], (s, s), strides=(s, s),
                        use_bias=False,
                    )(x)
                else:
                    u = nn.Conv(
                        self.num_upsample_filters[i], (1, 1), strides=int(round(1 / s)) if s < 1 else 1,
                        use_bias=False,
                    )(x)
                u = _BN()(u, train)
                u = nn.relu(u)
                ups.append(u)
        if len(ups) > 1:
            return jnp.concatenate(ups, axis=-1)
        return ups[0] if ups else x
