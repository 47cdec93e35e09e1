"""ConvHead -- BtcDet's ROI refinement head (reference
`btcdet/models/roi_heads/conv_head.py`).

Per roi, a 3x3x3 grid of points is built inside the (rotated) box
(`get_dense_grid_points:408`); three feature sources are pooled at every
grid point (shipped config `FEATURES_SOURCE: [x_combine, raw_points,
occ_points]`):

  raw_points  multi-radius ball query + PointNet SA over the raw cloud
  occ_points  same over the predicted occupancy points (prob feature)
  x_combine   a local mini-grid (PART_SCENE_SIZE / KER_SIZE, e.g.
              2x4x12 cells) is laid out around each roi grid point
              (scaled to the roi dims, rotated by roi yaw), the sparse
              stride-8 `x_combine` tensor is trilinearly sampled at the
              cell centers, and a small conv3d stack reduces the local
              grid to one feature vector.

TPU redesign of the x_combine branch: the reference re-voxelizes the
sampled cells into a per-grid-point *sparse* tensor and runs sparse
convs (`splat_features_2_grids` + spconv). Here the local grids are
tiny and mostly full, so we keep them dense -- `.dense()` the x_combine
tensor once, gather with trilinear weights, and run dense conv3d
(channels-last, MXU) over the (B*N*grid_num, 2, 4, 12, C) batch,
chunked over rois to bound memory. POINT_ROT rotates grouped offsets
into the roi frame exactly like the reference QueryAndGroup addition.

Losses follow `roi_head_template.get_box_cls_layer_loss:198` (BCE on
IoU-soft labels) and `get_box_reg_layer_loss:134` (canonical smooth-L1 +
corner loss).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import group_ops, sparse
from ...utils import box_coder as box_coder_utils
from ...utils import common, loss_utils
from . import roi_head_utils


def get_dense_grid_points(rois, grid_size, dim_times: float = 1.0):
    """Local grid points inside each roi (reference
    `get_dense_grid_points:408`, e2e=False branch). rois: (..., 7) ->
    (..., prod(grid), 3) in the *unrotated* local frame."""
    gz, gy, gx = grid_size
    idx = np.stack(np.meshgrid(
        np.arange(gz), np.arange(gy), np.arange(gx), indexing="ij"
    ), axis=-1).reshape(-1, 3).astype(np.float32)  # (G, 3) zyx
    idx_xyz = jnp.asarray(idx[:, ::-1].copy())  # (G, 3) xyz
    denom = jnp.asarray([gx, gy, gz], jnp.float32)
    dims = rois[..., 3:6] * dim_times  # (..., 3)
    return (idx_xyz + 0.5) * dims[..., None, :] / denom - dims[..., None, :] / 2


def global_roi_grid_points(rois, grid_size, dim_times: float = 1.0):
    """(..., N, 7) -> (..., N, G, 3) global-frame grid points
    (reference `get_global_grid_points_of_roi:394`)."""
    local = get_dense_grid_points(rois, grid_size, dim_times)  # (..., N, G, 3)
    shp = local.shape
    flat = local.reshape(-1, shp[-2], 3)
    yaw = rois[..., 6].reshape(-1)
    rotated = common.rotate_points_along_z(flat, yaw).reshape(shp)
    return rotated + rois[..., None, 0:3]


class _BN1d(nn.Module):
    """Masked BatchNorm1d. Defaults (eps 1e-3, momentum 0.01) match the
    reference backbone norm_fn used by the xc conv stack
    (`conv_head.py:16,126`); the FC trunk instances pass torch
    BatchNorm1d DEFAULTS (eps 1e-5, momentum 0.1) because the reference
    `make_fc_layers` (`roi_head_template.py:29-43`) and
    `create_shared_fc` (`conv_head.py:155-167`) construct bare
    `nn.BatchNorm1d` — golden-pinned by tests/test_golden_chain.py."""

    momentum: float = 0.01
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, mask, train: bool):
        return sparse.MaskedBatchNorm(
            momentum=self.momentum, epsilon=self.epsilon
        )(x, mask, use_running_average=not train)


class ConvHead(nn.Module):
    """See module docstring. Static config mirrors MODEL.ROI_HEAD."""

    num_class: int
    grid_size: Sequence[int] = (3, 3, 3)
    dim_times: float = 1.0
    point_rot: bool = True
    features_source: Sequence[str] = ("x_combine", "raw_points", "occ_points")
    raw_mlps: Sequence[Sequence[int]] = ((16, 16),) * 4
    raw_radii: Sequence[float] = (0.4, 0.8, 1.2, 2.4)
    raw_nsamples: Sequence[int] = (16, 16, 32, 64)
    occ_mlps: Sequence[Sequence[int]] = ((16, 16),) * 3
    occ_radii: Sequence[float] = (0.8, 1.2, 2.4)
    occ_nsamples: Sequence[int] = (16, 16, 32)
    raw_feat_dim: int = 1   # intensity
    occ_feat_dim: int = 1   # prob
    # x_combine local grid
    xc_part_scene: Sequence[float] = (-0.8, -0.8, -2.4, 0.8, 0.8, 2.4)  # zyx lo, zyx hi
    xc_ker_size: Sequence[float] = (0.8, 0.4, 0.4)  # zyx
    xc_kernels: Sequence[Sequence[int]] = ((3, 3, 3), (3, 3, 3), (2, 2, 3))
    xc_paddings: Sequence[Sequence[int]] = ((1, 1, 1), (1, 1, 1), (0, 0, 0))
    xc_strides: Sequence[Sequence[int]] = ((1, 1, 2), (1, 2, 2), (2, 2, 3))
    xc_channels: Sequence[int] = (128, 128, 128, 128)
    xc_downsample: Sequence[int] = (8, 8, 8)
    xc_scene_times: float = 1.0
    shared_fc: Sequence[int] = (256, 128)
    cls_fc: Sequence[int] = (128, 64)
    reg_fc: Sequence[int] = (128, 64)
    dp_ratio: float = 0.3
    point_cloud_range: Sequence[float] = (0, -40, -3, 70.4, 40, 1)
    det_voxel_size: Sequence[float] = (0.05, 0.05, 0.1)
    roi_chunk: int = 32
    box_coder_name: str = "ResidualCoder"
    # approx_max_k ball queries: ~10x faster on TPU; the reference CUDA
    # ball query's "first K in scan order" is itself an arbitrary subset,
    # so a 0.95-recall approximate neighbor set is an equivalent-quality
    # grouping (training adapts; eval uses the same net consistently)
    approx_query: bool = True
    # bf16 activations in the pooling branches + FC trunk (params and BN
    # statistics stay f32): halves the HBM traffic of the x_combine
    # trilinear gathers and doubles MXU rate for the local conv stack
    compute_dtype: Any = jnp.bfloat16
    # loss weights (LOSS_CONFIG)
    rcnn_cls_weight: float = 1.0
    rcnn_reg_weight: float = 1.0
    rcnn_corner_weight: float = 1.0
    code_weights: Sequence[float] = (1.0,) * 7
    corner_loss: bool = True

    @property
    def box_coder(self):
        return box_coder_utils.build_box_coder(self.box_coder_name)

    @property
    def grid_num(self) -> int:
        return int(np.prod(self.grid_size))

    @property
    def xc_local_grid(self):
        ps = np.asarray(self.xc_part_scene, np.float32)
        ker = np.asarray(self.xc_ker_size, np.float32)
        return tuple(np.around((ps[3:] - ps[:3]) / ker).astype(int).tolist())  # (z, y, x)

    @nn.compact
    def __call__(
        self,
        rois,                 # (B, N, 7)
        roi_valid,            # (B, N) bool
        points_xyz=None,      # (B, P, 3) raw points
        points_feat=None,     # (B, P, Craw)
        points_mask=None,     # (B, P)
        occ_xyz=None,         # (B, Q, 3) occupancy points
        occ_feat=None,        # (B, Q, 1) prob
        occ_mask=None,        # (B, Q)
        x_combine: sparse.SparseTensor | None = None,
        train: bool = False,
    ):
        """Returns (rcnn_cls (B*N, num_class), rcnn_reg (B*N, code))."""
        B, N, _ = rois.shape
        G = self.grid_num
        grid_pts = global_roi_grid_points(rois, self.grid_size, self.dim_times)  # (B, N, G, 3)
        new_xyz = grid_pts.reshape(B, N * G, 3)
        new_mask = jnp.broadcast_to(roi_valid[:, :, None], (B, N, G)).reshape(B, N * G)

        rot = None
        if self.point_rot:
            # reference: rotateMatrix = torch_get_yaw_rotation(-roi_yaw)
            # = STANDARD R(-yaw) = [[c, s], [-s, c]](yaw). Our
            # rotation_matrix_z(t) is the TRANSPOSED convention
            # ([[c, s], [-s, c]](t), built for p @ R right-multiplies), so
            # the reference matrix is rotation_matrix_z(+yaw) — passing
            # -yaw here rotated grouped offsets the WRONG WAY (canonical
            # +yaw instead of -yaw; self-consistent when trained from
            # scratch, but wrong for imported reference checkpoints —
            # caught by tests/test_golden_full.py).
            rot = common.rotation_matrix_z(rois[..., 6])  # (B, N, 3, 3)
            rot = jnp.broadcast_to(rot[:, :, None], (B, N, G, 3, 3)).reshape(B, N * G, 3, 3)

        feats = []
        if "raw_points" in self.features_source and points_xyz is not None:
            sa = group_ops.PointSAModuleMSG(
                radii=list(self.raw_radii), nsamples=list(self.raw_nsamples),
                mlps=[[self.raw_feat_dim + 3, *m] for m in self.raw_mlps],
                approx_query=self.approx_query, dtype=self.compute_dtype,
                name="SA_rawpoints",
            )
            feats.append(sa(
                points_xyz, points_mask, new_xyz, new_mask,
                features=points_feat, train=train, rotate_matrix=rot,
                group_centers=rois[..., :3], group_size=G,
            ))
            self.sow("intermediates", "sa_rawpoints", feats[-1])
        if "occ_points" in self.features_source and occ_xyz is not None:
            sa = group_ops.PointSAModuleMSG(
                radii=list(self.occ_radii), nsamples=list(self.occ_nsamples),
                mlps=[[self.occ_feat_dim + 3, *m] for m in self.occ_mlps],
                approx_query=self.approx_query, dtype=self.compute_dtype,
                name="SA_occpoints",
            )
            feats.append(sa(
                occ_xyz, occ_mask, new_xyz, new_mask,
                features=occ_feat, train=train, rotate_matrix=rot,
                group_centers=rois[..., :3], group_size=G,
            ))
            self.sow("intermediates", "sa_occpoints", feats[-1])
        if "x_combine" in self.features_source and x_combine is not None:
            feats.append(self._x_combine_pool(rois, roi_valid, grid_pts, x_combine, train))
            self.sow("intermediates", "xc_pool", feats[-1])

        out = jnp.concatenate([f.astype(self.compute_dtype) for f in feats], axis=-1)
        C = out.shape[-1]
        # GRID-MAJOR flatten (row j = g*C + c). The reference flattens
        # C-major ((BN, C, G).view(BN, C*G, 1), conv_head.py:374-379);
        # ref_import.t_fc_pooled reorders the first FC's input axis to
        # compensate — golden-pinned by tests/test_golden_chain.py. Keep
        # the two in sync if this layout ever changes.
        out = out.reshape(B * N, G * C)

        h = out
        mask_bn = roi_valid.reshape(B * N)
        for i, c in enumerate(self.shared_fc):
            h = nn.Dense(c, use_bias=False, dtype=self.compute_dtype,
                         name=f"shared_fc_{i}")(h)
            h = _BN1d(momentum=0.1, epsilon=1e-5,
                      name=f"shared_bn_{i}")(h, mask_bn, train)
            h = nn.relu(h)
            if i != len(self.shared_fc) - 1 and self.dp_ratio > 0:
                h = nn.Dropout(self.dp_ratio, deterministic=not train)(h)

        def fc_head(x, fcs, out_dim, name):
            for i, c in enumerate(fcs):
                x = nn.Dense(c, use_bias=False, dtype=self.compute_dtype,
                             name=f"{name}_{i}")(x)
                x = _BN1d(momentum=0.1, epsilon=1e-5,
                          name=f"{name}_bn_{i}")(x, mask_bn, train)
                x = nn.relu(x)
                if i == 0 and self.dp_ratio > 0:
                    x = nn.Dropout(self.dp_ratio, deterministic=not train)(x)
            # final projection in f32 (loss-facing logits/residuals)
            return nn.Dense(
                out_dim, name=f"{name}_out",
                kernel_init=nn.initializers.normal(0.001),
            )(x.astype(jnp.float32))

        rcnn_cls = fc_head(h, self.cls_fc, self.num_class, "cls")
        rcnn_reg = fc_head(h, self.reg_fc, self.box_coder.code_size * self.num_class, "reg")
        return rcnn_cls, rcnn_reg

    def _x_combine_pool(self, rois, roi_valid, grid_pts, x_combine, train):
        """Local-grid trilinear sampling + dense conv stack (see module
        docstring; reference `create_local_conv_grid:209` +
        `interpolate_from_3d_features:509` + CONV_LAYER convs)."""
        B, N, G, _ = grid_pts.shape
        lz, ly, lx = self.xc_local_grid
        L = lz * ly * lx

        C = x_combine.features.shape[-1]

        # local rois: center at grid point, dims scaled, same yaw
        local_rois = jnp.concatenate([
            grid_pts.reshape(B, N * G, 3),
            jnp.broadcast_to(rois[:, :, None, 3:6] * self.xc_scene_times, (B, N, G, 3)).reshape(B, N * G, 3),
            jnp.broadcast_to(rois[:, :, None, 6:7], (B, N, G, 1)).reshape(B, N * G, 1),
        ], axis=-1)
        sample_pts = global_roi_grid_points(local_rois, (lz, ly, lx), 1.0)  # (B, N*G, L, 3)

        lo = jnp.asarray(self.point_cloud_range[:3], jnp.float32)
        vs = jnp.asarray(self.det_voxel_size, jnp.float32) * jnp.asarray(self.xc_downsample, jnp.float32)

        conv_params = list(zip(self.xc_kernels, self.xc_strides, self.xc_paddings))
        convs = [
            nn.Conv(self.xc_channels[i + 1], tuple(k), strides=tuple(s),
                    padding=[(p0, p0) for p0 in p], use_bias=False,
                    dtype=self.compute_dtype, name=f"xc_conv_{i}")
            for i, (k, s, p) in enumerate(conv_params)
        ]
        bns = [_BN1d(name=f"xc_bn_{i}") for i in range(len(conv_params))]

        def conv_stack(g, m):
            """Dense conv stack with the reference's SPARSE-site
            semantics: cells whose interpolated feature is exactly zero
            are INACTIVE (`interpolate_from_3d_features` keeps only
            nonzero samples, conv_head.py:528-530), so each 'spconv'
            layer's output sites are the occupancy dilation of its input
            sites, BN statistics run over active sites only, and the BN
            bias never propagates through inactive cells — golden-pinned
            by tests/test_golden_full.py. g: (R', lz, ly, lx, C);
            m: (R',) roi validity."""
            act = (jnp.any(jnp.abs(g) > 0, axis=-1, keepdims=True)
                   & m[:, None, None, None, None]).astype(jnp.float32)
            for conv, bn, (k, s, p) in zip(convs, bns, conv_params):
                g = conv(g)
                act = jax.lax.conv_general_dilated(
                    act, jnp.ones(tuple(k) + (1, 1), jnp.float32),
                    window_strides=tuple(s), padding=[(q, q) for q in p],
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                ) > 0.5
                sh = g.shape
                mflat = jnp.broadcast_to(act[..., 0], sh[:-1]).reshape(-1)
                gflat = bn(g.reshape(-1, sh[-1]), mflat, train)
                g = jnp.where(act, nn.relu(gflat).reshape(sh), 0.0)
                act = act.astype(jnp.float32)
            return g

        def pool_chunk(args):
            # bf16 table: the 8 corner gathers are this path's HBM traffic
            dense = x_combine.dense().astype(self.compute_dtype)
            pts, valid = args  # (B, nc*G, L, 3), (B, nc*G)
            tgt = (pts - lo) / vs - 0.5  # fractional grid coords (x, y, z axis order)
            zyx = jnp.stack([tgt[..., 2], tgt[..., 1], tgt[..., 0]], axis=-1)
            M = pts.shape[1]
            sampled = jax.vmap(common.trilinear_interpolate_dense)(
                dense, zyx.reshape(B, M * L, 3)
            )  # (B, M*L, C) f32 accum over bf16 corners
            g = sampled.astype(self.compute_dtype).reshape(B * M, lz, ly, lx, C)
            g = conv_stack(g, valid.reshape(B * M))
            return g.reshape(B, M, -1)

        # fused Pallas sampler: per-roi windowed one-hot-matmul trilinear
        # (ops/pallas_interp.py) replaces the 8-corner gather -- the
        # gather is this branch's dominant cost (~13 ms/frame eval)
        from ...ops import pallas_interp
        S = G * L
        tile = pallas_interp.pick_tile(S, D=int(x_combine.spatial_shape[0]))
        if (sparse.use_pallas("interp") and C <= 128
                and x_combine.spatial_shape[0] <= 11 and tile is not None):
            R = B * N
            pts_r = sample_pts.reshape(R, S, 3)
            tgt = (pts_r - lo) / vs - 0.5
            zyx_r = jnp.stack([tgt[..., 2], tgt[..., 1], tgt[..., 0]], -1)
            cyx = jnp.stack([
                (rois[..., 1] - lo[1]) / vs[1] - 0.5,
                (rois[..., 0] - lo[0]) / vs[0] - 0.5,
            ], axis=-1).reshape(R, 2)
            roi_b = jnp.repeat(jnp.arange(B, dtype=jnp.int32), N)
            val_r = jnp.broadcast_to(roi_valid.reshape(R)[:, None], (R, S))
            sampled = pallas_interp.trilinear_pool_ad(
                x_combine.dense(), jax.lax.stop_gradient(zyx_r),
                jax.lax.stop_gradient(cyx), roi_b, val_r, tile)
            g = sampled.astype(self.compute_dtype).reshape(R * G, lz, ly, lx, C)
            m = jnp.broadcast_to(roi_valid.reshape(R)[:, None], (R, G)).reshape(-1)
            g = conv_stack(g, m)
            return g.reshape(B, N * G, -1)

        # chunk over rois to bound the (B*N*G, lz, ly, lx, C) intermediate
        # at train time (activations are kept for backward); at eval the
        # chunk pad/transpose shuffles cost ~12 ms/frame, so run one-shot
        nc = min(self.roi_chunk, N) if train else N
        pad_n = (-N) % nc
        Np = N + pad_n
        sp = jnp.pad(sample_pts.reshape(B, N, G, L, 3), ((0, 0), (0, pad_n), (0, 0), (0, 0), (0, 0)))
        rv = jnp.pad(roi_valid, ((0, 0), (0, pad_n)))
        pts = sp.reshape(B, Np // nc, nc * G, L, 3).transpose(1, 0, 2, 3, 4)
        val = jnp.broadcast_to(rv[:, :, None], (B, Np, G)).reshape(
            B, Np // nc, nc * G).transpose(1, 0, 2)
        outs = [pool_chunk((pts[i], val[i])) for i in range(Np // nc)]
        out = jnp.concatenate(outs, axis=1)  # (B, Np*G, C)
        return out.reshape(B, Np, G, -1)[:, :N].reshape(B, N * G, -1)

    # ------------------------------------------------------------ losses

    def get_loss(self, fwd, targets):
        """fwd: dict with rcnn_cls (B*N, 1), rcnn_reg (B*N, code);
        targets: output of roi_head_utils.assign_targets."""
        rcnn_cls = fwd["rcnn_cls"].reshape(-1)
        rcnn_reg = fwd["rcnn_reg"]
        cls_labels = targets["rcnn_cls_labels"].reshape(-1)
        valid = targets["roi_valid"].reshape(-1)

        bce = loss_utils.binary_cross_entropy_with_logits(rcnn_cls, cls_labels)
        cls_loss = (bce * valid).sum() / jnp.clip(valid.sum(), 1.0, None)
        cls_loss = cls_loss * self.rcnn_cls_weight

        rois = targets["rois"].reshape(-1, 7)
        gt_canon = targets["gt_of_rois"].reshape(-1, 7)
        reg_mask = targets["reg_valid_mask"].reshape(-1)
        local_anchor = jnp.concatenate(
            [jnp.zeros_like(rois[:, :3]), rois[:, 3:6], jnp.zeros_like(rois[:, 6:7])],
            axis=-1,
        )
        reg_targets = self.box_coder.encode(gt_canon, local_anchor)
        reg_loss_el = loss_utils.weighted_smooth_l1_loss(
            rcnn_reg[None], reg_targets[None], code_weights=self.code_weights
        )[0]
        fg_norm = jnp.clip(reg_mask.sum(), 1.0, None)
        reg_loss = (reg_loss_el.sum(-1) * reg_mask).sum() / fg_norm * self.rcnn_reg_weight

        losses = {"rcnn_loss_cls": cls_loss, "rcnn_loss_reg": reg_loss}
        total = cls_loss + reg_loss
        if self.corner_loss:
            decoded = self.box_coder.decode(rcnn_reg, local_anchor)
            roi_ry = rois[:, 6]
            xyz = common.rotate_points_along_z(decoded[:, None, 0:3], roi_ry)[:, 0]
            global_pred = jnp.concatenate(
                [xyz + rois[:, 0:3], decoded[:, 3:6], (decoded[:, 6:7] + roi_ry[:, None])],
                axis=-1,
            )
            gt_src = targets["gt_of_rois_src"].reshape(-1, 7)
            corner = loss_utils.get_corner_loss_lidar(global_pred, gt_src)
            corner_loss = (corner * reg_mask).sum() / fg_norm * self.rcnn_corner_weight
            losses["rcnn_loss_corner"] = corner_loss
            total = total + corner_loss
        losses["rcnn_loss"] = total
        return total, losses

    def generate_predicted_boxes(self, rois, rcnn_cls, rcnn_reg):
        """Decode rcnn_reg back to global boxes (reference
        `conv_head.generate_predicted_boxes:427`)."""
        B, N, _ = rois.shape
        code = self.box_coder.code_size
        cls_preds = rcnn_cls.reshape(B, N, -1)
        reg = rcnn_reg.reshape(B, N, code)
        local_anchor = jnp.concatenate(
            [jnp.zeros_like(rois[..., :3]), rois[..., 3:6], jnp.zeros_like(rois[..., 6:7])],
            axis=-1,
        )
        decoded = self.box_coder.decode(reg, local_anchor)  # (B, N, 7)
        flat = decoded.reshape(-1, 7)
        ry = rois[..., 6].reshape(-1)
        xyz = common.rotate_points_along_z(flat[:, None, 0:3], ry)[:, 0]
        boxes = jnp.concatenate(
            [xyz + rois.reshape(-1, 7)[:, 0:3], flat[:, 3:6], (flat[:, 6] + ry)[:, None]],
            axis=-1,
        ).reshape(B, N, 7)
        return cls_preds, boxes
