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

from ..utils import common


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
    # bf16 conv compute (params stay f32; BN statistics computed in f32):
    # this path is dense MXU work on (B, 200, 176, 128-256) maps, so
    # bf16 doubles MXU rate and halves the HBM traffic of the pyramid
    compute_dtype: jnp.dtype | None = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, C) -> (B, H, W, sum(num_upsample_filters))."""
        dt = self.compute_dtype
        if dt == jnp.bfloat16:
            dt = common.activation_dtype()

        def conv(c, k, s=1):
            return nn.Conv(c, k, strides=s, padding=k[0] // 2,
                           use_bias=False, dtype=dt)

        def bn_relu(h, bn):
            return nn.relu(bn(h.astype(jnp.float32), train))

        ups = []
        for i, n_layers in enumerate(self.layer_nums):
            x = conv(self.num_filters[i], (3, 3), self.layer_strides[i])(x)
            x = bn_relu(x, _BN())
            for _ in range(n_layers):
                x = conv(self.num_filters[i], (3, 3))(x)
                x = bn_relu(x, _BN())
            if i < len(self.upsample_strides):
                s = self.upsample_strides[i]
                if s > 1:
                    u = nn.ConvTranspose(
                        self.num_upsample_filters[i], (s, s), strides=(s, s),
                        use_bias=False, dtype=dt,
                    )(x)
                else:
                    u = nn.Conv(
                        self.num_upsample_filters[i], (1, 1),
                        strides=int(round(1 / s)) if s < 1 else 1,
                        use_bias=False, dtype=dt,
                    )(x)
                u = bn_relu(u, _BN())
                ups.append(u)
        if len(ups) > 1:
            return jnp.concatenate(ups, axis=-1)
        return ups[0] if ups else x
