"""BtcNet detector assembly (reference
`btcdet/models/detectors/{btcnet.py, detector3d_template.py}`).

One flax module composes the two sub-networks exactly like the
reference's module topologies (`detector3d_template.py:28-34`):

  occ:  occ_targets -> vfe -> backbone_3d -> occ_dense_head -> occ_pnt_update
  det:  vfe -> backbone_3d -> map_to_bev -> backbone_2d -> dense_head -> roi_head

The universal data bus is a plain dict of jnp arrays ("batch"), all
static shapes. `build_network(cfg, ...)` reads the reference YAML schema
and constructs the module; parameters live in two top-level collections
(`occ_modules` / `det_modules` naming is preserved through parameter
paths `occ_*` / everything else) so the dual-optimizer split and
prefix-filtered checkpoint loading survive (reference
`detector3d_template.py:594-678`).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import iou3d, sparse, voxelizer
from ...utils import common
from .. import backbones_2d, map_to_bev, vfe
from .. import backbones_3d
from ..dense_heads import anchor_head as anchor_head_mod
from ..occ import occ_subnet
from ..roi_heads import conv_head as conv_head_mod
from ..roi_heads import roi_head_utils

# occ-subnet dense masks exported (train only) for the OCC_PNT_UPDATE.VIS
# debug views, read by utils.vis_utils.collect_occ_vis_clouds
# Eval-time tiered width for the det backbone input (see
# `_tiered_backbone`): skipped below this PER-FRAME capacity so tiny CPU
# test configs don't pay the 3x branch compile, while real small-batch
# runs (B=1 eval at reference caps is ~50k/frame merged) still tier.
# Tests monkeypatch it.
TIER_MIN_CAPACITY = 8_192

VIS_MASK_KEYS = (
    "general_cls_loss_mask", "fore_voxelwise_mask", "mirr_voxelwise_mask",
    "bm_voxelwise_mask", "pos_mask", "neg_mask", "occ_voxelwise_mask",
    "vcc_mask", "voxel_drop_mask", "forebox_label", "res_mtrx",
)


class BtcNet(nn.Module):
    """Full detector. Config objects are reference-schema EasyDicts."""

    model_cfg: Any
    data_cfg: Any
    class_names: Sequence[str]
    det_grid_size: tuple       # (nx, ny, nz)
    point_cloud_range: tuple
    det_voxel_size: tuple
    num_point_features: int = 4
    axis_name: str | None = None
    # optional NamedSharding for the dense BEV feature maps [B, H, W, C]:
    # with a ('dp','sp') mesh, P('dp','sp') spatially partitions the 2D
    # conv pyramid over H (GSPMD inserts the halo exchanges). The sparse
    # stages stay dp-sharded; see SURVEY.md §5.7.
    bev_sharding: Any = None

    @staticmethod
    def _level_caps(bb_cfg, mode: str):
        """BACKBONE_3D.LEVEL_CAPACITIES: flat list (shared) or
        {train: [...], test: [...]} per-mode static site capacities."""
        lc = bb_cfg.get("LEVEL_CAPACITIES")
        if not lc:
            return None
        if hasattr(lc, "get") and not isinstance(lc, (list, tuple)):
            lc = lc.get(mode)
        return tuple(int(c) for c in lc) if lc else None

    def setup(self):
        mc = self.model_cfg
        self.use_occ = mc.get("OCC", None) is not None
        # intensity clamp (reference `btcnet.py:16-30`, DATA_CONFIG.CLAMP:
        # "tanh" or a positive max); None/<=0 disables
        self.clamp_max = self.data_cfg.get("CLAMP", None)
        # per-frame bernoulli gate on using occ points at train
        # (reference `btcnet.py:37-41`, USEOCC_PERCENTAGE)
        occ_data = self.data_cfg.get("OCC", None)
        self.useocc_percentage = float(
            occ_data.get("USEOCC_PERCENTAGE", 1.0)) if occ_data else 1.0
        if self.use_occ:
            from ...config import CfgBox

            # fused merge+VFE: valid only for the OccVFE reduction; an
            # explicit OCC_PNT_UPDATE.FUSED_VFE=False restores the
            # materialized merged point table (e.g. for debugging)
            fused_nrf = 0
            if mc.VFE.NAME == "OccVFE" and bool(
                mc.OCC.OCC_PNT_UPDATE.get("FUSED_VFE", True)
            ):
                fused_nrf = int(self.num_point_features)
            self.occ = occ_subnet.OccSubnet(
                model_cfg=CfgBox(mc.OCC),
                data_cfg=self.data_cfg,
                point_cloud_range=self.point_cloud_range,
                # plumb the real det voxel size: OccSubnet's default is
                # the flagship 0.05 grid, silently wrong for any other
                # config (caught by tests/test_golden_full.py — occ-point
                # det voxel coords came out 2x at the mini 0.1 grid)
                det_voxel_size=tuple(self.det_voxel_size),
                axis_name=self.axis_name,
                fused_vfe_nrf=fused_nrf,
                name="occ_subnet",
            )
            self.occ_code_num = int(self.data_cfg.OCC.get("CODE_NUM_DIM", 2))
        else:
            self.occ_code_num = 0

        if mc.VFE.NAME == "OccVFE":
            self.det_vfe = vfe.OccVFE(num_raw_features=self.num_point_features)
        else:
            self.det_vfe = vfe.MeanVFE(num_raw_features=self.num_point_features)

        bb = mc.BACKBONE_3D
        self.backbone_3d = backbones_3d.VoxelBackBone8xOcc(
            input_channels=self.num_point_features + self.occ_code_num,
            occ_code_num=self.occ_code_num,
            occ_conv_type=tuple(bb.get("OCC_CONV_TYPE", [])),
            occ_conv_exec=tuple(bb.get("OCC_CONV_EXECUTE", [])),
            out_feat_type=tuple(bb.get("OUT_FEAT_TYPE", ["None"] * 4 + ["big_bev_combine"])),
            out_att=tuple(bb.get("OCC_ATT", [False] * 4)),
            channels=tuple(bb.get("CHANNELS", (16, 32, 64, 64, 128))),
            level_caps=self._level_caps(bb, "train"),
            level_caps_eval=self._level_caps(bb, "test"),
            axis_name=self.axis_name,
            name="det_backbone_3d",
        )
        self.height_compression = map_to_bev.HeightCompression(mc.MAP_TO_BEV)
        b2 = mc.BACKBONE_2D
        self.backbone_2d = backbones_2d.BaseBEVBackbone(
            layer_nums=tuple(b2.LAYER_NUMS),
            layer_strides=tuple(b2.LAYER_STRIDES),
            num_filters=tuple(b2.NUM_FILTERS),
            upsample_strides=tuple(b2.UPSAMPLE_STRIDES),
            num_upsample_filters=tuple(b2.NUM_UPSAMPLE_FILTERS),
            name="det_backbone_2d",
        )

        dh = mc.DENSE_HEAD
        anchors, anchor_class, per_loc = anchor_head_mod.generate_anchors(
            self.point_cloud_range, self.det_grid_size, dh.ANCHOR_GENERATOR_CONFIG
        )
        self.dense_head = anchor_head_mod.AnchorHeadSingle(
            num_class=len(self.class_names),
            anchors=anchors,
            anchor_class=anchor_class,
            num_anchors_per_location=per_loc,
            use_direction_classifier=dh.get("USE_DIRECTION_CLASSIFIER", True),
            dir_offset=dh.get("DIR_OFFSET", 0.78539),
            dir_limit_offset=dh.get("DIR_LIMIT_OFFSET", 0.0),
            num_dir_bins=dh.get("NUM_DIR_BINS", 2),
            matched_thresholds=tuple(c["matched_threshold"] for c in dh.ANCHOR_GENERATOR_CONFIG),
            unmatched_thresholds=tuple(c["unmatched_threshold"] for c in dh.ANCHOR_GENERATOR_CONFIG),
            match_height=dh.TARGET_ASSIGNER_CONFIG.get("MATCH_HEIGHT", False),
            cls_weight=dh.LOSS_CONFIG.LOSS_WEIGHTS["cls_weight"],
            loc_weight=dh.LOSS_CONFIG.LOSS_WEIGHTS["loc_weight"],
            dir_weight=dh.LOSS_CONFIG.LOSS_WEIGHTS["dir_weight"],
            code_weights=tuple(dh.LOSS_CONFIG.LOSS_WEIGHTS["code_weights"]),
            name="det_dense_head",
        )

        rh = mc.get("ROI_HEAD", None)
        self.use_roi_head = rh is not None
        if self.use_roi_head:
            cg = rh.CONV_GRID_POOL
            xc = cg.CONV_LAYER.get("x_combine", None)
            self.roi_head = conv_head_mod.ConvHead(
                num_class=1 if rh.get("CLASS_AGNOSTIC", True) else len(self.class_names),
                grid_size=tuple(cg.GRID_SIZE),
                dim_times=cg.get("DIM_TIMES", 1.0),
                point_rot=cg.get("POINT_ROT", False),
                features_source=tuple(cg.FEATURES_SOURCE),
                raw_mlps=tuple(tuple(m) for m in cg.CONV_LAYER["raw_points"].MLPS)
                if "raw_points" in cg.FEATURES_SOURCE else ((16, 16),),
                raw_radii=tuple(cg.CONV_LAYER["raw_points"].POOL_RADIUS)
                if "raw_points" in cg.FEATURES_SOURCE else (0.8,),
                raw_nsamples=tuple(cg.CONV_LAYER["raw_points"].NSAMPLE)
                if "raw_points" in cg.FEATURES_SOURCE else (16,),
                occ_mlps=tuple(tuple(m) for m in cg.CONV_LAYER["occ_points"].MLPS)
                if "occ_points" in cg.FEATURES_SOURCE else ((16, 16),),
                occ_radii=tuple(cg.CONV_LAYER["occ_points"].POOL_RADIUS)
                if "occ_points" in cg.FEATURES_SOURCE else (0.8,),
                occ_nsamples=tuple(cg.CONV_LAYER["occ_points"].NSAMPLE)
                if "occ_points" in cg.FEATURES_SOURCE else (16,),
                raw_feat_dim=self.num_point_features - 3,
                xc_part_scene=tuple(xc.PART_SCENE_SIZE) if xc else (-0.8, -0.8, -2.4, 0.8, 0.8, 2.4),
                xc_ker_size=tuple(xc.KER_SIZE) if xc else (0.8, 0.4, 0.4),
                xc_kernels=tuple(tuple(k) for k in xc.KERNEL) if xc else ((3, 3, 3),),
                xc_paddings=tuple(tuple(p) for p in xc.PADDING) if xc else ((1, 1, 1),),
                xc_strides=tuple(tuple(s) for s in xc.STRIDE) if xc else ((1, 1, 1),),
                xc_channels=tuple(xc.CHANNEL) if xc else (128, 128),
                xc_downsample=tuple(xc.DOWNSAMPLE_FACTOR) if xc else (8, 8, 8),
                xc_scene_times=xc.get("SCENE_TIMES", 1.0) if xc else 1.0,
                shared_fc=tuple(rh.SHARED_FC),
                cls_fc=tuple(rh.CLS_FC),
                reg_fc=tuple(rh.REG_FC),
                dp_ratio=rh.get("DP_RATIO", 0.0),
                point_cloud_range=tuple(self.point_cloud_range),
                det_voxel_size=tuple(self.det_voxel_size),
                rcnn_cls_weight=rh.LOSS_CONFIG.LOSS_WEIGHTS["rcnn_cls_weight"],
                rcnn_reg_weight=rh.LOSS_CONFIG.LOSS_WEIGHTS["rcnn_reg_weight"],
                rcnn_corner_weight=rh.LOSS_CONFIG.LOSS_WEIGHTS["rcnn_corner_weight"],
                code_weights=tuple(rh.LOSS_CONFIG.LOSS_WEIGHTS["code_weights"]),
                corner_loss=rh.LOSS_CONFIG.get("CORNER_LOSS_REGULARIZATION", True),
                # parity-study switches (docs/PARITY_RISKS.md): exact
                # top-k ball/shell queries and f32 activations
                approx_query=bool(rh.get("APPROX_QUERY", True)),
                compute_dtype=(jnp.float32 if str(
                    rh.get("COMPUTE_DTYPE", "bf16")) in ("f32", "fp32", "float32")
                    else common.activation_dtype()),
                name="det_roi_head",
            )
            self.nms_cfg_train = rh.NMS_CONFIG.TRAIN
            self.nms_cfg_test = rh.NMS_CONFIG.TEST
            tc = rh.TARGET_CONFIG
            self.target_cfg = dict(
                roi_per_image=int(tc.ROI_PER_IMAGE), fg_ratio=float(tc.FG_RATIO),
                reg_fg_thresh=float(tc.REG_FG_THRESH), cls_fg_thresh=float(tc.CLS_FG_THRESH),
                cls_bg_thresh=float(tc.CLS_BG_THRESH), cls_bg_thresh_lo=float(tc.CLS_BG_THRESH_LO),
                hard_bg_ratio=float(tc.HARD_BG_RATIO),
            )

    def _tiered_backbone(self, st, occ_code, train: bool):
        """Run the det 3D backbone at the smallest static input width
        covering the live row count (VERDICT r4 perf: the merged det
        table's capacity is per_frame_vox + K//4 — 50k/frame at the
        reference 40k eval caps — while live occupancy on KITTI-like
        scans is ~20-25k/frame, so the input-level convs/qk/BN pay ~2x
        padding). Rows are key-sorted valid-first (`sparse.from_coords`),
        so a prefix slice at width >= nnz is exact; a batch-level
        `nn.cond` chain picks width cap/4, cap/2, or full. Branch
        outputs are capacity-identical because every downstream level's
        capacity is a static config value (LEVEL_CAPACITIES).

        Eval-only (train runs smaller caps and mutates BN stats inside
        the branches), and skipped below TIER_MIN_CAPACITY so tiny test
        configs don't pay the 3x branch compile."""
        cap = st.keys.shape[0]
        if train or cap // max(int(st.batch_size), 1) < TIER_MIN_CAPACITY:
            return self.backbone_3d(st, occ_code, train=train)

        def rup(w):  # Pallas tile alignment
            return -(-w // 256) * 256

        tiers = [w for w in (rup(cap // 4), rup(cap // 2)) if w < cap]

        # Branch outputs must agree in shape: with LEVEL_CAPACITIES set
        # (the flagship config) every level's capacity is static and the
        # pads below are no-ops; without them capacities inherit the
        # input width, so pad back to the full-width capacities.
        bb = self.backbone_3d
        enc_cap = bb._cap(3, False, st.batch_size) or cap
        # x_combine's grid depends on the combine variant: big_bev_combine/
        # big_combine live on the x_conv4 grid (level cap index 2), plain
        # 'combine' ends at the strided spconv5 (level cap index 4)
        xc_level = 4 if bb.out_feat_type[4] == "combine" else 2
        xc_cap = bb._cap(xc_level, False, st.batch_size) or cap

        def bb_at(width):
            def f(mdl, st, occ):
                stw = sparse.prefix(st, width)
                occw = occ[:width] if occ is not None else None
                o = mdl.backbone_3d(stw, occw, train=False)
                enc = sparse.pad_capacity(o["encoded"], enc_cap)
                xc = o["x_combine"]
                if xc is not None:
                    xc = sparse.pad_capacity(xc, xc_cap)
                return enc, xc
            return f

        def chain(i):
            if i == len(tiers):
                return bb_at(cap)

            def f(mdl, st, occ):
                return nn.cond(st.nnz <= tiers[i], bb_at(tiers[i]),
                               chain(i + 1), mdl, st, occ)
            return f

        encoded, x_combine = chain(0)(self, st, occ_code)
        return {"encoded": encoded, "x_combine": x_combine}

    def __call__(self, batch: dict, train: bool = False):
        """batch keys (all static shapes):
          points (B, P, 3+F), points_mask (B, P)
          voxels (NV, mp, C), voxel_coords (NV, 4), voxel_num_points (NV)
          [occ_*: occ grid voxel set when the occ subnet is enabled]
          gt_boxes (B, G, 8) [train]
        Returns a dict with predictions and (train) losses.
        """
        out = {}
        batch_size = int(batch["points"].shape[0])
        # det sparse grid pads z by +1 (reference `spconv_backbone.py:635`
        # `sparse_shape = grid_size[::-1] + [1, 0, 0]`): KITTI's 40-voxel z
        # becomes 41 so the stride chain lands at 41->21->11->5->2 and the
        # BEV map keeps nz=2 (256 features), not nz=1
        nz, ny, nx = int(self.det_grid_size[2]) + 1, int(self.det_grid_size[1]), int(self.det_grid_size[0])

        if self.clamp_max is not None and (
            self.clamp_max == "tanh" or float(self.clamp_max) > 0.0
        ):
            batch = _clamp_intensity(batch, self.clamp_max)
        if self.use_occ and train and "use_occ_prob" not in batch:
            prob = jax.random.uniform(
                self.make_rng("sampling"), (batch_size,), maxval=0.9999
            )
            batch = dict(batch)
            batch["use_occ_prob"] = prob <= self.useocc_percentage

        occ_pnts = None
        occ_pnts_mask = None

        if self.use_occ:
            occ_out = self.occ(batch, train=train)
            out.update({f"occ_{k}": v for k, v in occ_out.items() if k.startswith("loss") or k.startswith("metric")})
            # PassOccVox: merge predicted occ points into the det voxel set
            voxels = occ_out.get("det_voxels")  # absent under fused VFE
            voxel_coords = occ_out["det_voxel_coords"]
            voxel_num_points = occ_out["det_voxel_num_points"]
            occ_pnts = occ_out["occ_points"]            # (B, Q, 4+) xyz + prob
            occ_pnts_mask = occ_out["occ_points_mask"]  # (B, Q)
            out["occ_probs"] = occ_out.get("probs")
            out["occ_points"] = occ_pnts
            out["occ_points_mask"] = occ_pnts_mask
            if not train:
                # occupancy P/R/F1 diagnostics (reference
                # `occ_post_processing`, `detector3d_template.py:479`)
                out["occ_pos_mask"] = occ_out["pos_mask"]
                out["occ_cls_mask"] = occ_out["general_cls_loss_mask"]
            if train and "loss" in occ_out:
                out["occ_loss"] = occ_out["loss"]
            if train:
                # dense masks for the OCC_PNT_UPDATE.VIS debug views
                # (collect_occ_vis_clouds); XLA dead-code-eliminates
                # these from the train step, which only keeps the loss
                for k in VIS_MASK_KEYS:
                    if occ_out.get(k) is not None:
                        out[k] = occ_out[k]
        else:
            voxels = batch["voxels"]
            voxel_coords = batch["voxel_coords"]
            voxel_num_points = batch["voxel_num_points"]

        if self.use_occ and "det_voxel_features" in occ_out:
            # fused merge+VFE already reduced the merged table
            voxel_features = occ_out["det_voxel_features"]
            occ_code = occ_out["det_occ_code"]
        elif isinstance(self.det_vfe, vfe.OccVFE) and self.use_occ:
            voxel_features, occ_code = self.det_vfe(voxels, voxel_num_points)
        else:
            voxel_features = self.det_vfe(voxels, voxel_num_points)
            occ_code = None

        # per-frame blocks are key-sorted but padding rows sit at each
        # frame's end (and between the det and extra regions of the
        # merged table), so a global re-sort is still required — and
        # occ_code must ride the SAME permutation: the backbone zips it
        # row-wise onto the sorted tensor (`st.replace(features=occ)`),
        # so an unsorted side table would attach each voxel's occ code
        # to a different voxel (silent quality bug, fixed r4).
        if occ_code is not None:
            st, occ_code = sparse.from_coords(
                voxel_features, voxel_coords, (nz, ny, nx), batch_size,
                aux=occ_code,
            )
        else:
            st = sparse.from_coords(
                voxel_features, voxel_coords, (nz, ny, nx), batch_size
            )
        bb_out = self._tiered_backbone(st, occ_code, train)
        # profiler prefix hooks: unused keys are DCE'd by jit probes that
        # return a single earlier output, so exporting these is free
        out["encoded_features"] = bb_out["encoded"].features
        spatial = self.height_compression(bb_out["encoded"])
        out["spatial_features"] = spatial
        if self.bev_sharding is not None:
            spatial = jax.lax.with_sharding_constraint(spatial, self.bev_sharding)
        spatial_2d = self.backbone_2d(spatial, train=train)
        if self.bev_sharding is not None:
            spatial_2d = jax.lax.with_sharding_constraint(spatial_2d, self.bev_sharding)
        out["spatial_features_2d"] = spatial_2d
        head_out = self.dense_head(
            spatial_2d, gt_boxes=batch.get("gt_boxes"), train=train
        )
        out["rpn_cls_preds"] = head_out["cls_preds"]
        out["rpn_box_preds"] = head_out["batch_box_preds"]

        if self.use_roi_head:
            nms_cfg = self.nms_cfg_train if train else self.nms_cfg_test
            proposals = roi_head_utils.proposal_layer(
                head_out["batch_box_preds"],
                head_out["cls_preds"],
                nms_pre=int(nms_cfg["NMS_PRE_MAXSIZE"]),
                nms_post=int(nms_cfg["NMS_POST_MAXSIZE"]),
                nms_thresh=float(nms_cfg["NMS_THRESH"]),
            )
            if train:
                rng = self.make_rng("sampling")
                targets = roi_head_utils.assign_targets(
                    rng, proposals, batch["gt_boxes"], **self.target_cfg
                )
                rois, roi_valid = targets["rois"], targets["roi_valid"]
            else:
                targets = None
                rois, roi_valid = proposals.rois, proposals.roi_valid

            rcnn_cls, rcnn_reg = self.roi_head(
                rois, roi_valid,
                points_xyz=batch["points"][..., :3],
                points_feat=batch["points"][..., 3:],
                points_mask=batch["points_mask"],
                occ_xyz=occ_pnts[..., :3] if occ_pnts is not None else None,
                occ_feat=occ_pnts[..., 3:4] if occ_pnts is not None else None,
                occ_mask=occ_pnts_mask,
                x_combine=bb_out["x_combine"],
                train=train,
            )
            out["rois"] = rois
            out["roi_valid"] = roi_valid
            if train:
                out["rcnn_targets"] = targets
                out["rcnn_cls"] = rcnn_cls
                out["rcnn_reg"] = rcnn_reg
            else:
                cls_preds, box_preds = self.roi_head.generate_predicted_boxes(
                    rois, rcnn_cls, rcnn_reg
                )
                out["batch_cls_preds"] = cls_preds
                out["batch_box_preds"] = box_preds
                out["roi_labels"] = proposals.roi_labels

        if train:
            total, losses = self.get_training_loss(out, head_out)
            out["loss"] = total
            out["loss_dict"] = losses
        return out

    def get_training_loss(self, out, head_out):
        """occ loss + rpn loss + rcnn loss (reference `btcnet.py:91`)."""
        rpn_loss, losses = self.dense_head.get_loss(head_out)
        total = rpn_loss
        if self.use_roi_head and "rcnn_targets" in out:
            rcnn_loss, rcnn_losses = self.roi_head.get_loss(
                {"rcnn_cls": out["rcnn_cls"], "rcnn_reg": out["rcnn_reg"]},
                out["rcnn_targets"],
            )
            total = total + rcnn_loss
            losses.update(rcnn_losses)
        if self.use_occ and "occ_loss" in out:
            total = total + out["occ_loss"]
            losses["occ_loss"] = out["occ_loss"]
        return total, losses


def _clamp_intensity(batch, clamp_max):
    """Clamp/tanh the intensity channel of points and every voxel table
    (reference `BtcNet.clamp`, `btcnet.py:16-30`)."""
    def f(x):
        if clamp_max == "tanh":
            return jnp.tanh(x)
        return jnp.clip(x, 0.0, float(clamp_max))

    batch = dict(batch)
    if "points" in batch:
        pts = batch["points"]
        batch["points"] = pts.at[..., 3].set(f(pts[..., 3]))
    for k in ("voxels", "occ_voxels", "det_voxels"):
        if k in batch:
            v = batch[k]
            batch[k] = v.at[..., 3].set(f(v[..., 3]))
    return batch


def post_processing(out, post_cfg, num_class: int):
    """Final per-frame NMS over the refined boxes (reference
    `detector3d_template.post_processing:363`). Class-agnostic path.

    Returns dict of (B, post_max) arrays: boxes, scores, labels, valid.
    """
    nms_cfg = post_cfg.NMS_CONFIG
    score_thresh = float(post_cfg.SCORE_THRESH)
    cls_preds = out["batch_cls_preds"]  # (B, N, 1) raw logits
    box_preds = out["batch_box_preds"]  # (B, N, 7)
    roi_labels = out.get("roi_labels")
    roi_valid = out.get("roi_valid")

    scores = jax.nn.sigmoid(cls_preds.max(axis=-1))
    labels = roi_labels if roi_labels is not None else (
        cls_preds.argmax(axis=-1).astype(jnp.int32) + 1
    )
    valid = (scores >= score_thresh)
    if roi_valid is not None:
        valid = valid & roi_valid

    def per_frame(boxes, sc, val, lab):
        idx, keep = iou3d.nms_rotated(
            boxes, sc, val,
            thresh=float(nms_cfg.NMS_THRESH),
            pre_max_size=int(nms_cfg.NMS_PRE_MAXSIZE),
            post_max_size=int(nms_cfg.NMS_POST_MAXSIZE),
        )
        return boxes[idx], sc[idx], lab[idx], keep

    b, s, l, v = jax.vmap(per_frame)(box_preds, scores, valid, labels)
    return {
        "pred_boxes": jnp.where(v[..., None], b, 0.0),
        "pred_scores": jnp.where(v, s, 0.0),
        "pred_labels": jnp.where(v, l, 0),
        "pred_valid": v,
    }


def build_network(model_cfg, data_cfg, class_names, axis_name: str | None = None,
                  bev_sharding=None):
    """Construct BtcNet from reference-schema configs."""
    pcr = tuple(data_cfg.POINT_CLOUD_RANGE)
    det_vox = None
    for proc in data_cfg.DATA_PROCESSOR:
        if proc.NAME in ("det_transform_points_to_voxels", "transform_points_to_voxels"):
            det_vox = tuple(proc.VOXEL_SIZE)
    assert det_vox is not None, "no det voxelization in DATA_PROCESSOR"
    gx, gy, gz = voxelizer.compute_grid_size(pcr, det_vox)
    n_feat = len(data_cfg.POINT_FEATURE_ENCODING["used_feature_list"])
    from ...config import CfgBox as _CfgBox  # local alias avoids shadowing
    return BtcNet(
        model_cfg=_CfgBox(model_cfg),
        data_cfg=_CfgBox(data_cfg),
        class_names=tuple(class_names),
        det_grid_size=(gx, gy, gz),
        point_cloud_range=pcr,
        det_voxel_size=det_vox,
        num_point_features=n_feat,
        axis_name=axis_name,
        bev_sharding=bev_sharding,
    )
