"""Point-feature abstraction (reference
`btcdet/models/backbones_3d/pfe/abstraction_template.py` -- the
PV-RCNN-style VoxelSetAbstraction; registered but unused by the shipped
BtcDet config, kept for registry parity).

FPS keypoints from the raw cloud, then multi-scale grouping: raw points,
selected sparse conv levels (voxel centers as support points), and
bilinear BEV features, concatenated per keypoint.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import group_ops, sparse
from ..utils import common


class VoxelSetAbstraction(nn.Module):
    num_keypoints: int = 2048
    point_source: str = "raw_points"
    features_source: Sequence[str] = ("bev", "x_conv3", "x_conv4", "raw_points")
    sa_radii: Any = ((0.4, 0.8), (1.2, 2.4), (2.4, 4.8))
    sa_nsamples: Any = ((16, 16), (16, 32), (16, 32))
    sa_mlps: Any = (((16, 16), (16, 16)), ((64, 64), (64, 64)), ((64, 64), (64, 64)))
    bev_stride: int = 8
    point_cloud_range: Sequence[float] = (0, -40, -3, 70.4, 40, 1)
    voxel_size: Sequence[float] = (0.05, 0.05, 0.1)
    num_out_features: int = 128

    @nn.compact
    def __call__(
        self,
        points_xyz,          # (B, N, 3)
        points_mask,         # (B, N)
        points_feat=None,    # (B, N, C)
        multi_scale: dict | None = None,   # name -> SparseTensor
        bev_features=None,   # (B, H, W, C)
        train: bool = False,
    ):
        B = points_xyz.shape[0]
        kp_idx = group_ops.furthest_point_sample(points_xyz, points_mask, self.num_keypoints)
        keypoints = jax.vmap(lambda p, i: p[i])(points_xyz, kp_idx)  # (B, K, 3)
        kp_mask = jax.vmap(lambda m, i: m[i])(points_mask, kp_idx)

        feats = []
        si = 0
        if "raw_points" in self.features_source:
            sa = group_ops.PointSAModuleMSG(
                radii=list(self.sa_radii[si]), nsamples=list(self.sa_nsamples[si]),
                mlps=[[(points_feat.shape[-1] if points_feat is not None else 0) + 3, *m]
                      for m in self.sa_mlps[si]],
                name="sa_raw",
            )
            feats.append(sa(points_xyz, points_mask, keypoints, kp_mask,
                            features=points_feat, train=train))
            si += 1
        if multi_scale is not None:
            for name in self.features_source:
                st = multi_scale.get(name)
                if st is None or not isinstance(st, sparse.SparseTensor):
                    continue
                level = int(name[-1]) if name.startswith("x_conv") else 4
                centers = common.get_voxel_centers(
                    st.coords[:, 1:4],
                    downsample_times=2 ** (level - 1),
                    voxel_size=self.voxel_size,
                    point_cloud_range=self.point_cloud_range,
                )
                # per-frame masks from the batch column
                sup_xyz = jnp.broadcast_to(centers[None], (B,) + centers.shape)
                sup_mask = jnp.stack(
                    [(st.coords[:, 0] == b) & st.valid for b in range(B)], axis=0
                )
                sup_feat = jnp.broadcast_to(
                    st.features[None], (B,) + st.features.shape
                )
                sa = group_ops.PointSAModuleMSG(
                    radii=list(self.sa_radii[min(si, len(self.sa_radii) - 1)]),
                    nsamples=list(self.sa_nsamples[min(si, len(self.sa_nsamples) - 1)]),
                    mlps=[[st.features.shape[-1] + 3, *m]
                          for m in self.sa_mlps[min(si, len(self.sa_mlps) - 1)]],
                    name=f"sa_{name}",
                )
                feats.append(sa(sup_xyz, sup_mask, keypoints, kp_mask,
                                features=sup_feat, train=train))
                si += 1
        if "bev" in self.features_source and bev_features is not None:
            lo = jnp.asarray(self.point_cloud_range[:2])
            vs = jnp.asarray(self.voxel_size[:2]) * self.bev_stride
            xi = (keypoints[..., 0] - lo[0]) / vs[0] - 0.5
            yi = (keypoints[..., 1] - lo[1]) / vs[1] - 0.5
            bevf = jax.vmap(common.bilinear_interpolate)(bev_features, xi, yi)
            feats.append(bevf)

        out = jnp.concatenate(feats, axis=-1)
        out = nn.Dense(self.num_out_features, use_bias=False)(out)
        out = nn.relu(out)
        return keypoints, jnp.where(kp_mask[..., None], out, 0.0), kp_mask
