"""ROI-aware voxel pooling + roi point sampling (reference
`btcdet/ops/roiaware_pool3d` and `roipoint_pool3d` CUDA extensions).

Static-shape JAX formulations:
  roiaware_pool3d   pool point features into a per-roi local voxel grid
                    (max or avg), the PartA2-style op
  roipoint_pool3d   sample a fixed number of points per (enlarged) roi

`points_in_boxes` itself lives in `btcdet_tpu/utils/box_utils`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import common


def roiaware_pool3d(
    rois,            # (N, 7)
    points,          # (P, 3)
    point_features,  # (P, C)
    points_mask,     # (P,)
    out_size=(6, 6, 6),
    pool_method: str = "max",
):
    """-> (N, oz, oy, ox, C). Points are binned into each roi's local
    grid (canonical frame); empty cells give 0."""
    oz, oy, ox = out_size
    N = rois.shape[0]
    C = point_features.shape[-1]

    def one_roi(roi):
        local = points - roi[0:3]
        local = common.rotate_points_along_z(local[None], -roi[6:7])[0]
        dims = roi[3:6]
        inb = jnp.all(jnp.abs(local) <= dims / 2, axis=1) & points_mask
        # local cell index
        cell = jnp.floor(
            (local + dims / 2) / (dims / jnp.asarray([ox, oy, oz], jnp.float32))
        ).astype(jnp.int32)
        cell = jnp.clip(cell, 0, jnp.asarray([ox - 1, oy - 1, oz - 1]))
        lin = (cell[:, 2] * oy + cell[:, 1]) * ox + cell[:, 0]
        lin = jnp.where(inb, lin, oz * oy * ox)
        if pool_method == "max":
            grid = jnp.full((oz * oy * ox + 1, C), -jnp.inf)
            grid = grid.at[lin].max(jnp.where(inb[:, None], point_features, -jnp.inf))
            grid = jnp.where(jnp.isfinite(grid), grid, 0.0)
        else:
            acc = jnp.zeros((oz * oy * ox + 1, C)).at[lin].add(
                jnp.where(inb[:, None], point_features, 0.0)
            )
            cnt = jnp.zeros((oz * oy * ox + 1,)).at[lin].add(inb.astype(jnp.float32))
            grid = acc / jnp.maximum(cnt[:, None], 1.0)
        return grid[:-1].reshape(oz, oy, ox, C)

    return jax.vmap(one_roi)(rois)


def roipoint_pool3d(
    rois, points, point_features, points_mask,
    num_sampled_points: int = 512, extra_width=(0.0, 0.0, 0.0),
):
    """-> (N, num_sampled, 3 + C), empty_flag (N,). First
    `num_sampled_points` in-box points in order, wrapped when fewer
    (matching the CUDA sampler's repeat-fill)."""
    from ..utils import box_utils

    enlarged = box_utils.enlarge_box3d(rois, extra_width)

    def one_roi(roi):
        local = points - roi[0:3]
        rot = common.rotate_points_along_z(local[None], -roi[6:7])[0]
        inb = jnp.all(jnp.abs(rot) <= roi[3:6] / 2, axis=1) & points_mask
        order = jnp.argsort(~inb)  # in-box first, stable
        cnt = inb.sum()
        take = order[jnp.arange(num_sampled_points) % jnp.maximum(cnt, 1)]
        feats = jnp.concatenate([points, point_features], axis=-1)[take]
        feats = jnp.where(cnt > 0, feats, 0.0)
        return feats, cnt == 0

    return jax.vmap(one_roi)(enlarged)
