"""MAP_TO_BEV modules (reference `btcdet/models/backbones_2d/map_to_bev/`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import sparse
from ..utils import common


class HeightCompression:
    """Densify the encoded sparse tensor and fold z into channels
    (reference `height_compression.py:10-26`). Channels-last: the
    (B, nz, ny, nx, C) dense tensor becomes (B, ny, nx, nz*C)."""

    def __init__(self, model_cfg=None):
        self.num_bev_features = model_cfg.NUM_BEV_FEATURES if model_cfg else None

    def __call__(self, st: sparse.SparseTensor) -> jax.Array:
        # bf16 scatter: the dense BEV map is ~90 MB/frame in f32 and its
        # only consumer is the bf16 conv pyramid, so densify at bf16 to
        # halve the scatter+read HBM traffic
        st = st.replace(features=st.features.astype(common.activation_dtype()))
        d = st.dense(layout="yzx")  # (B, ny, nz, nx, C): scatter-native
        B, ny, nz, nx, C = d.shape
        return d.transpose(0, 1, 3, 2, 4).reshape(B, ny, nx, nz * C)


class PointPillarScatter:
    """Scatter pillar features onto the BEV canvas (reference
    `pointpillar_scatter.py`; unused by the shipped config, kept for
    API parity). coords are (N, 4) (b, z=0, y, x)."""

    def __init__(self, model_cfg, grid_size):
        self.num_bev_features = model_cfg.NUM_BEV_FEATURES
        self.nx, self.ny = int(grid_size[0]), int(grid_size[1])

    def __call__(self, pillar_features, coords, batch_size: int) -> jax.Array:
        C = pillar_features.shape[-1]
        canvas = jnp.zeros((batch_size * self.ny * self.nx + 1, C), pillar_features.dtype)
        valid = coords[:, 0] >= 0
        idx = (coords[:, 0] * self.ny + coords[:, 2]) * self.nx + coords[:, 3]
        idx = jnp.where(valid, idx, batch_size * self.ny * self.nx)
        canvas = canvas.at[idx].set(jnp.where(valid[:, None], pillar_features, 0.0))
        return canvas[:-1].reshape(batch_size, self.ny, self.nx, C)
