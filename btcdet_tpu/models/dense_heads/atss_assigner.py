"""ATSS target assigner (reference
`btcdet/models/dense_heads/target_assigner/atss_target_assigner.py`;
registered but unused by the shipped config -- kept for registry parity).

Adaptive Training Sample Selection: per gt, take the top-k anchors by
BEV center distance, compute an adaptive IoU threshold (mean + std of
their IoUs with the gt), and mark anchors above it (with centers inside
the gt) positive.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops import iou3d
from ...utils import box_coder as box_coder_utils


def atss_assign(
    anchors, gt_boxes, gt_valid, gt_classes, *, topk: int = 9,
    box_coder=None, match_height: bool = True,
):
    """anchors: (A, 7); gt_boxes: (G, 7). Returns (labels (A,), reg
    targets (A, code), reg_mask (A,))."""
    box_coder = box_coder or box_coder_utils.ResidualCoder()
    A, G = anchors.shape[0], gt_boxes.shape[0]
    if match_height:
        iou = iou3d.boxes_iou3d(anchors, gt_boxes)
    else:
        from ...utils import box_utils

        iou = box_utils.boxes3d_nearest_bev_iou(anchors, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)

    dist = jnp.linalg.norm(
        anchors[:, None, :2] - gt_boxes[None, :, :2], axis=-1
    )  # (A, G)
    dist = jnp.where(gt_valid[None, :], dist, jnp.inf)
    # top-k closest anchors per gt
    k = min(topk, A)
    _, cand_idx = jax.lax.top_k(-dist.T, k)  # (G, k)
    cand_iou = jnp.take_along_axis(iou.T, cand_idx, axis=1)  # (G, k)
    thr = cand_iou.mean(axis=1) + cand_iou.std(axis=1)  # (G,)

    # candidate anchors above the adaptive threshold, centers inside gt BEV
    from ...utils import box_utils

    centers3 = jnp.concatenate(
        [anchors[:, :2], jnp.zeros_like(anchors[:, :1])], axis=1
    )
    gt_flat = jnp.concatenate(
        [gt_boxes[:, :2], jnp.zeros_like(gt_boxes[:, :1]), gt_boxes[:, 3:5],
         jnp.full_like(gt_boxes[:, :1], 100.0), gt_boxes[:, 6:7]], axis=1
    )
    inside = box_utils.points_in_boxes_mask(centers3, gt_flat)  # (A, G)

    is_cand = jnp.zeros((G, A), bool)
    is_cand = is_cand.at[jnp.arange(G)[:, None], cand_idx].set(True)
    pos_ga = is_cand & (iou.T >= thr[:, None]) & inside.T & gt_valid[:, None]

    pos = jnp.any(pos_ga, axis=0)
    # assign each positive anchor to its max-IoU gt
    masked_iou = jnp.where(pos_ga.T, iou, -1.0)
    gt_assign = masked_iou.argmax(axis=1)
    labels = jnp.where(pos, gt_classes[gt_assign], 0)
    reg_targets = box_coder.encode(gt_boxes[gt_assign], anchors)
    reg_targets = jnp.where(pos[:, None], reg_targets, 0.0)
    return labels.astype(jnp.int32), reg_targets, pos
