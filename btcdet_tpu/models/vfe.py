"""Voxel feature encoders (reference `btcdet/models/backbones_3d/vfe/`).

Param-free reductions over the per-voxel point slots; plain callables
(no flax params needed). All operate on the flat voxel tables produced
by the voxelizer: voxels (N, P, C), voxel_num_points (N,).
"""

from __future__ import annotations

import jax.numpy as jnp


def _slot_mask(voxel_num_points, max_points: int):
    return (
        jnp.arange(max_points, dtype=jnp.int32)[None, :] < voxel_num_points[:, None]
    )


class MeanVFE:
    """Reference `mean_vfe.py`. Plain mode: per-voxel mean of all point
    features. maxprob mode (`MAX_VFE: True`): xyz averaged over all
    points, intensity-range channels averaged over raw points only
    (last channel < 0.1), trailing occ-code channels max-pooled."""

    def __init__(self, model_cfg=None, num_raw_features: int = 4, maxprob: bool = False, xyz_dim: int = 3):
        self.maxprob = maxprob
        self.num_raw_features = num_raw_features
        self.xyz_dim = xyz_dim

    def __call__(self, voxels, voxel_num_points):
        mask = _slot_mask(voxel_num_points, voxels.shape[1])
        normalizer = jnp.clip(voxel_num_points[:, None].astype(voxels.dtype), 1.0, None)
        if not self.maxprob:
            vm = jnp.where(mask[..., None], voxels, 0.0)
            return vm.sum(axis=1) / normalizer
        raw_mask = (voxels[:, :, -1] < 0.1) & mask
        raw_norm = jnp.clip(raw_mask.sum(axis=1, keepdims=True).astype(voxels.dtype), 1.0, None)
        xyz_mean = (
            jnp.where(mask[..., None], voxels[:, :, : self.xyz_dim], 0.0).sum(1) / normalizer
        )
        inten_mean = (
            jnp.where(raw_mask[..., None], voxels[:, :, self.xyz_dim : self.num_raw_features], 0.0).sum(1)
            / raw_norm
        )
        occ_max = jnp.where(
            mask[..., None], voxels[:, :, self.num_raw_features :], -jnp.inf
        ).max(axis=1)
        occ_max = jnp.where(jnp.isfinite(occ_max), occ_max, 0.0)
        return jnp.concatenate([xyz_mean, inten_mean, occ_max], axis=-1)


class OccVFE:
    """Reference `occ_vfe.py`: separates raw points (occ-prob channel at
    index num_raw_features < 0.05... the reference tests channel -1) from
    predicted occupancy points. Voxels containing only occ points use the
    occ mean; trailing occ-code channels are max-pooled and also exported
    separately as `occ_voxel_features` for the backbone side branch."""

    def __init__(self, model_cfg=None, num_raw_features: int = 4):
        self.num_raw_features = num_raw_features

    def __call__(self, voxels, voxel_num_points):
        """-> (voxel_features (N, num_raw + n_code), occ_voxel_features)."""
        mask = _slot_mask(voxel_num_points, voxels.shape[1])
        raw_mask = (voxels[:, :, -1] < 0.05) & mask
        occ_mask = (voxels[:, :, -1] >= 0.05) & mask
        raw_n = raw_mask.sum(1, keepdims=True)
        occ_n = occ_mask.sum(1, keepdims=True)
        occ_voxel_mask = (occ_n > 0) & (raw_n < 1)
        raw_norm = jnp.clip(raw_n.astype(voxels.dtype), 1.0, None)
        occ_norm = jnp.clip(occ_n.astype(voxels.dtype), 1.0, None)
        nrf = self.num_raw_features
        f_raw = jnp.where(raw_mask[..., None], voxels[:, :, :nrf], 0.0).sum(1) / raw_norm
        f_occ = jnp.where(occ_mask[..., None], voxels[:, :, :nrf], 0.0).sum(1) / occ_norm
        feat = f_raw + occ_voxel_mask.astype(voxels.dtype) * f_occ
        occ_max = jnp.where(mask[..., None], voxels[:, :, nrf:], -jnp.inf).max(axis=1)
        occ_max = jnp.where(jnp.isfinite(occ_max), occ_max, 0.0)
        return jnp.concatenate([feat, occ_max], axis=-1), occ_max
