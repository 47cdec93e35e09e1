"""RPN anchor head (reference `btcdet/models/dense_heads/`):
AnchorGenerator (`target_assigner/anchor_generator.py`),
AxisAlignedTargetAssigner (`axis_aligned_target_assigner.py`) fully
vectorized on device (the reference round-trips argmax through numpy),
and AnchorHeadSingle (`anchor_head_single.py`) with the focal cls /
sin-difference smooth-L1 / direction-bin losses of
`anchor_head_template.py`.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils import box_coder as box_coder_utils
from ...utils import box_utils, common, loss_utils


def generate_anchors(anchor_range, grid_size, anchor_configs):
    """Dense anchors per class config. grid_size: (nx, ny) of the full det
    grid; each config uses its feature_map_stride (all configs must share
    one stride so the per-location anchors interleave into the conv
    output layout [y, x, class, size, rot]).

    Returns (anchors (A_total, 7) float32, anchor_class (A_total,) int32
    0-based class index, per-location count). Matches the reference
    permute at `anchor_generator.py:56` for single-z-anchor configs.
    """
    per_class_loc = []  # each (gy, gx, S*R*Z, 7)
    strides = {cfg["feature_map_stride"] for cfg in anchor_configs}
    assert len(strides) == 1, "mixed feature_map_stride unsupported"
    num_per_loc = 0
    for cfg in anchor_configs:
        stride = cfg["feature_map_stride"]
        gx, gy = int(grid_size[0] // stride), int(grid_size[1] // stride)
        sizes = np.array(cfg["anchor_sizes"], np.float32)
        rots = np.array(cfg["anchor_rotations"], np.float32)
        heights = np.array(cfg["anchor_bottom_heights"], np.float32)
        align = cfg.get("align_center", False)
        if align:
            x_stride = (anchor_range[3] - anchor_range[0]) / gx
            y_stride = (anchor_range[4] - anchor_range[1]) / gy
            x_off, y_off = x_stride / 2, y_stride / 2
        else:
            x_stride = (anchor_range[3] - anchor_range[0]) / (gx - 1)
            y_stride = (anchor_range[4] - anchor_range[1]) / (gy - 1)
            x_off, y_off = 0.0, 0.0
        xs = anchor_range[0] + x_off + x_stride * np.arange(gx, dtype=np.float32)
        ys = anchor_range[1] + y_off + y_stride * np.arange(gy, dtype=np.float32)

        # layout [z, y, x, size, rot, 7] -> per-location [y, x, Z*S*R, 7]
        Z, S, R = len(heights), len(sizes), len(rots)
        a = np.zeros((Z, gy, gx, S, R, 7), np.float32)
        a[..., 0] = xs[None, None, :, None, None]
        a[..., 1] = ys[None, :, None, None, None]
        a[..., 2] = heights[:, None, None, None, None]
        a[..., 3:6] = sizes[None, None, None, :, None, :]
        a[..., 6] = rots[None, None, None, None, :]
        a[..., 2] += a[..., 5] / 2  # bottom -> center z
        per_class_loc.append(a.transpose(1, 2, 0, 3, 4, 5).reshape(gy, gx, -1, 7))
        num_per_loc += S * R * Z
    # interleave classes per location: [y, x, class*(S*R*Z)]
    stacked = np.concatenate(per_class_loc, axis=2)  # (gy, gx, n_per_loc, 7)
    anchor_class = np.concatenate([
        np.full((arr.shape[2],), ci, np.int32)
        for ci, arr in enumerate(per_class_loc)
    ])
    gy, gx = stacked.shape[:2]
    anchor_class = np.tile(anchor_class[None, None], (gy, gx, 1)).reshape(-1)
    return stacked.reshape(-1, 7), anchor_class, num_per_loc


def assign_targets_single_class(
    anchors, anchor_sel, gt_boxes, gt_valid, gt_class_id,
    matched_threshold: float, unmatched_threshold: float,
    box_coder, match_height: bool,
):
    """Vectorized AxisAlignedTargetAssigner.assign_targets_single
    (reference `axis_aligned_target_assigner.py:131-213`) for ONE class.

    anchors: (A, 7) full anchor set; anchor_sel: (A,) bool marks this
    class's anchors; gt_boxes: (G, 7); gt_valid: (G,) bool.
    Returns (labels (A,) int32 in {-1, 0, class_id} valid only where
    anchor_sel, reg_targets (A, code), reg_mask (A,) bool).
    """
    from ...ops import iou3d

    if match_height:
        iou = iou3d.boxes_iou3d(anchors, gt_boxes)
    else:
        iou = box_utils.boxes3d_nearest_bev_iou(anchors, gt_boxes)
    iou = jnp.where(gt_valid[None, :] & anchor_sel[:, None], iou, -1.0)

    a2g_max = iou.max(axis=1)
    a2g_arg = iou.argmax(axis=1)
    g2a_max = iou.max(axis=0)
    # empty gts (max iou == 0) never force (reference sets them to -1)
    g_force = gt_valid & (g2a_max > 0)
    force = jnp.any((iou == g2a_max[None, :]) & g_force[None, :], axis=1)

    labels = jnp.full(anchors.shape[:1], -1, jnp.int32)
    labels = jnp.where(a2g_max < unmatched_threshold, 0, labels)
    pos = (a2g_max >= matched_threshold) & anchor_sel
    force = force & anchor_sel
    labels = jnp.where(pos | force, gt_class_id, labels)

    reg_mask = pos | force
    matched_gt = gt_boxes[a2g_arg]
    reg_targets = box_coder.encode(matched_gt, anchors)
    reg_targets = jnp.where(reg_mask[:, None], reg_targets, 0.0)
    return labels, reg_targets, reg_mask


def get_direction_target(anchors, reg_targets, dir_offset: float,
                         num_dir_bins: int):
    """Direction-bin targets (reference
    `anchor_head_template.py:get_direction_target:148-163`): recover gt
    heading = anchor heading + rot residual, shift by dir_offset, bin
    over [0, 2pi). Golden-pinned against the executed reference in
    tests/test_golden_reference.py."""
    rot_gt = reg_targets[..., 6] + anchors[..., 6]
    offset_rot = common.limit_period(rot_gt - dir_offset, 0, 2 * np.pi)
    return jnp.clip(
        jnp.floor(offset_rot / (2 * np.pi / num_dir_bins)).astype(jnp.int32),
        0, num_dir_bins - 1,
    )


class AnchorHeadSingle(nn.Module):
    """1x1-conv RPN head over BEV features + target assignment + losses.

    Config mirrors the reference MODEL.DENSE_HEAD block. Anchors are
    precomputed host-side and passed in as a constant.
    """

    num_class: int
    anchors: Any                     # (A, 7) np array
    anchor_class: Any                # (A,) int32 np array, 0-based class
    num_anchors_per_location: int
    box_coder_name: str = "ResidualCoder"
    use_direction_classifier: bool = True
    dir_offset: float = 0.78539
    dir_limit_offset: float = 0.0
    num_dir_bins: int = 2
    matched_thresholds: Sequence[float] = (0.6,)
    unmatched_thresholds: Sequence[float] = (0.45,)
    match_height: bool = False
    cls_weight: float = 1.0
    loc_weight: float = 2.0
    dir_weight: float = 0.2
    code_weights: Sequence[float] = (1.0,) * 7

    @property
    def box_coder(self):
        return box_coder_utils.build_box_coder(self.box_coder_name)

    @nn.compact
    def __call__(self, spatial_features_2d, gt_boxes=None, train: bool = False):
        """spatial_features_2d: (B, H, W, C). gt_boxes: (B, G, 8) with
        class id (1-based; 0 pad) in the last column.

        Returns dict: cls_preds (B, A, num_class), box_preds (B, A, code),
        dir_preds, batch_box_preds (decoded), and (train) loss targets.
        """
        B = spatial_features_2d.shape[0]
        A = self.anchors.shape[0]
        na = self.num_anchors_per_location
        code_size = self.box_coder.code_size

        cls_out = nn.Conv(
            na * self.num_class, (1, 1),
            bias_init=nn.initializers.constant(-float(np.log((1 - 0.01) / 0.01))),
        )(spatial_features_2d)
        box_out = nn.Conv(
            na * code_size, (1, 1),
            kernel_init=nn.initializers.normal(0.001),
        )(spatial_features_2d)
        cls_preds = cls_out.reshape(B, A, self.num_class)
        box_preds = box_out.reshape(B, A, code_size)
        out = {"cls_preds": cls_preds, "box_preds": box_preds}
        if self.use_direction_classifier:
            dir_out = nn.Conv(na * self.num_dir_bins, (1, 1))(spatial_features_2d)
            out["dir_preds"] = dir_out.reshape(B, A, self.num_dir_bins)

        anchors = jnp.asarray(self.anchors)
        out["batch_box_preds"] = self._decode(anchors, box_preds, out.get("dir_preds"))

        if train and gt_boxes is not None:
            out.update(self._assign(anchors, gt_boxes))
        return out

    def _decode(self, anchors, box_preds, dir_preds):
        boxes = self.box_coder.decode(box_preds, anchors[None])
        if dir_preds is not None:
            # reference `generate_predicted_boxes:227`: snap heading into
            # the bin selected by the dir classifier
            dir_labels = jnp.argmax(dir_preds, axis=-1)
            period = 2 * np.pi / self.num_dir_bins
            dir_rot = common.limit_period(boxes[..., 6] - self.dir_offset, self.dir_limit_offset, period)
            heading = dir_rot + self.dir_offset + period * dir_labels.astype(boxes.dtype)
            boxes = jnp.concatenate([boxes[..., :6], heading[..., None], boxes[..., 7:]], axis=-1)
        return boxes

    def _assign(self, anchors, gt_boxes):
        """Per-class target assignment (class-masked over the interleaved
        anchor layout), vmapped over the batch."""
        anchor_class = jnp.asarray(self.anchor_class)

        def per_sample(gt):
            gt_box7 = gt[:, :7]
            gt_cls = gt[:, 7].astype(jnp.int32)
            gt_valid_all = gt_cls > 0
            labels = jnp.full(anchors.shape[:1], -1, jnp.int32)
            reg_targets = jnp.zeros(anchors.shape[:1] + (self.box_coder.code_size,))
            reg_mask = jnp.zeros(anchors.shape[:1], bool)
            for ci in range(self.num_class):
                sel = anchor_class == ci
                gv = gt_valid_all & (gt_cls == ci + 1)
                lab, regt, regm = assign_targets_single_class(
                    anchors, sel, gt_box7, gv, ci + 1,
                    float(self.matched_thresholds[ci]),
                    float(self.unmatched_thresholds[ci]),
                    self.box_coder, self.match_height,
                )
                labels = jnp.where(sel, lab, labels)
                reg_targets = jnp.where(sel[:, None], regt, reg_targets)
                reg_mask = jnp.where(sel, regm, reg_mask)
            return labels, reg_targets, reg_mask

        labels, reg_targets, reg_mask = jax.vmap(per_sample)(gt_boxes)
        return {
            "box_cls_labels": labels,
            "box_reg_targets": reg_targets,
            "box_reg_mask": reg_mask,
        }

    def get_loss(self, out):
        """Reference `anchor_head_template.get_cls_layer_loss` /
        `get_box_reg_layer_loss`."""
        cls_preds = out["cls_preds"]
        box_preds = out["box_preds"]
        labels = out["box_cls_labels"]          # (B, A)
        reg_targets = out["box_reg_targets"]    # (B, A, code)
        B = cls_preds.shape[0]

        cared = labels >= 0
        positives = labels > 0
        negatives = labels == 0
        pos_norm = jnp.clip(positives.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0, None)
        cls_weights = (negatives * 1.0 + positives * 1.0) / pos_norm
        reg_weights = positives / pos_norm

        cls_targets = jnp.where(cared, labels, 0)
        one_hot = jax.nn.one_hot(cls_targets, self.num_class + 1, dtype=cls_preds.dtype)[..., 1:]
        cls_loss = loss_utils.sigmoid_focal_loss(cls_preds, one_hot).sum(-1)
        cls_loss = (cls_loss * cls_weights).sum() / B * self.cls_weight

        # sin-difference heading encoding (reference `add_sin_difference`)
        pr, tr = box_preds[..., 6], reg_targets[..., 6]
        pred_sin = jnp.sin(pr) * jnp.cos(tr)
        target_sin = jnp.cos(pr) * jnp.sin(tr)
        box_p = jnp.concatenate([box_preds[..., :6], pred_sin[..., None], box_preds[..., 7:]], -1)
        box_t = jnp.concatenate([reg_targets[..., :6], target_sin[..., None], reg_targets[..., 7:]], -1)
        loc_loss = loss_utils.weighted_smooth_l1_loss(
            box_p, box_t, weights=reg_weights, code_weights=self.code_weights
        ).sum() / B * self.loc_weight

        losses = {"rpn_loss_cls": cls_loss, "rpn_loss_loc": loc_loss}
        total = cls_loss + loc_loss
        if self.use_direction_classifier and "dir_preds" in out:
            anchors = jnp.asarray(self.anchors)
            dir_targets = get_direction_target(
                anchors[None], reg_targets, self.dir_offset, self.num_dir_bins
            )
            dir_onehot = jax.nn.one_hot(dir_targets, self.num_dir_bins, dtype=cls_preds.dtype)
            dir_loss = loss_utils.weighted_cross_entropy(
                out["dir_preds"], dir_onehot, weights=reg_weights
            ).sum() / B * self.dir_weight
            losses["rpn_loss_dir"] = dir_loss
            total = total + dir_loss
        losses["rpn_loss"] = total
        return total, losses
