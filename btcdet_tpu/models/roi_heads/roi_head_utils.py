"""ROI head plumbing (reference `btcdet/models/roi_heads/roi_head_template.py`
and `target_assigner/proposal_target_layer.py`), static-shape formulation.

- proposal_layer: per-frame rotated NMS of the RPN boxes -> fixed-size roi
  set with validity masks (reference `roi_head_template.py:45`).
- assign_targets: per-class max-IoU roi<->gt matching, fg/bg subsampling
  at fixed ROI_PER_IMAGE with hard/easy-bg mixing (reference
  `proposal_target_layer.py:8-228`), canonical-frame regression targets
  with the heading flip (reference `roi_head_template.py:102-133`).

All sampling uses a JAX rng; "sample with replacement via randint"
matches the reference's torch.randint bg sampling.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import iou3d
from ...utils import common


class Proposals(NamedTuple):
    rois: jax.Array        # (B, N, 7)
    roi_scores: jax.Array  # (B, N)
    roi_labels: jax.Array  # (B, N) int32, 1-based
    roi_valid: jax.Array   # (B, N) bool


def proposal_layer(
    batch_box_preds, batch_cls_preds, batch_valid=None, *,
    nms_pre: int, nms_post: int, nms_thresh: float,
) -> Proposals:
    """batch_box_preds: (B, A, 7); batch_cls_preds: (B, A, C).

    Small pre-sizes (eval, k <= 2048) use the rounds NMS vmapped over
    frames: its fori_loop has no per-frame cond, so vmap batches each of
    the `nms_post` rounds across B instead of running B sequential loops
    (8x fewer sequential dispatches; measured tools/microbench_nms.py).
    Large pre-sizes (train pre=9000) keep the static Python loop with
    the chunked NMS: its early-exit runs through `lax.cond`, and vmap
    would lower the cond to a select that executes every chunk (measured
    4+ s/step at the reference's train-time pre=9000).
    """
    B, A, C = batch_cls_preds.shape
    if batch_valid is None:
        batch_valid = jnp.ones((B, A), bool)

    if min(nms_pre, A) <= 2048:
        scores = batch_cls_preds.max(axis=-1)
        labels = batch_cls_preds.argmax(axis=-1).astype(jnp.int32) + 1
        idx, valid = jax.vmap(
            lambda bb, ss, vv: iou3d.nms_rotated(
                bb, ss, vv, thresh=nms_thresh, pre_max_size=nms_pre,
                post_max_size=nms_post, impl="rounds")
        )(batch_box_preds, scores, batch_valid)
        take = jax.vmap(lambda a, i: a[i])
        rois, scores, labels = (take(batch_box_preds, idx), take(scores, idx),
                                take(labels, idx))
    else:
        outs = []
        for b in range(B):
            boxes = batch_box_preds[b]
            cls_preds = batch_cls_preds[b]
            scores = cls_preds.max(axis=-1)
            labels = cls_preds.argmax(axis=-1).astype(jnp.int32) + 1
            idx, keep = iou3d.nms_rotated(
                boxes, scores, batch_valid[b],
                thresh=nms_thresh, pre_max_size=nms_pre,
                post_max_size=nms_post,
            )
            outs.append((boxes[idx], scores[idx], labels[idx], keep))
        rois, scores, labels, valid = (jnp.stack(x) for x in zip(*outs))
    rois = jnp.where(valid[..., None], rois, 0.0)
    # the reference proposal layer runs under no_grad
    # (roi_head_template.py:45): rois are constants to the rcnn stage
    rois = jax.lax.stop_gradient(rois)
    scores = jax.lax.stop_gradient(scores)
    return Proposals(rois, jnp.where(valid, scores, 0.0), labels, valid)


def max_iou_with_same_class(rois, roi_labels, gt_boxes, gt_labels, gt_valid):
    """(N, 7) rois vs (G, 7) gts; IoU only counted for same-class pairs
    (reference `get_max_iou_with_same_class:195`). Returns (max_iou (N,),
    gt_assignment (N,) int32)."""
    iou = iou3d.boxes_iou3d(rois, gt_boxes)
    same = (roi_labels[:, None] == gt_labels[None, :]) & gt_valid[None, :]
    iou = jnp.where(same, iou, -1.0)
    gt_assignment = iou.argmax(axis=1).astype(jnp.int32)
    max_iou = jnp.clip(iou.max(axis=1), 0.0, None)
    return max_iou, gt_assignment


def _pick_with_replacement(rng, cand_rank_idx, cand_count, k: int):
    """Pick k indices uniformly (with replacement) from the first
    `cand_count` entries of `cand_rank_idx`."""
    u = jax.random.uniform(rng, (k,))
    pos = jnp.floor(u * jnp.maximum(cand_count, 1).astype(u.dtype)).astype(jnp.int32)
    pos = jnp.clip(pos, 0, cand_rank_idx.shape[0] - 1)
    return cand_rank_idx[pos]


def subsample_rois(
    rng, max_overlaps, roi_valid, *,
    roi_per_image: int, fg_ratio: float,
    reg_fg_thresh: float, cls_fg_thresh: float,
    cls_bg_thresh: float, cls_bg_thresh_lo: float, hard_bg_ratio: float,
):
    """Reference `ProposalTargetLayer.subsample_rois`. Returns
    (sampled_idx (roi_per_image,) int32, fg_mask_of_sampled)."""
    N = max_overlaps.shape[0]
    fg_thresh = min(reg_fg_thresh, cls_fg_thresh)
    fg_mask = (max_overlaps >= fg_thresh) & roi_valid
    easy_mask = (max_overlaps < cls_bg_thresh_lo) & roi_valid
    hard_mask = (max_overlaps < fg_thresh) & (max_overlaps >= cls_bg_thresh_lo) & roi_valid

    r_fg, r_bg = jax.random.split(rng)
    # ranked candidate lists: valid candidates first, random order
    def ranked(mask, key):
        score = mask.astype(jnp.float32) * 2.0 + jax.random.uniform(key, (N,))
        _, idx = jax.lax.top_k(score, N)
        return idx.astype(jnp.int32), mask.sum().astype(jnp.int32)

    k1, k2, k3, k4, k5 = jax.random.split(r_fg, 5)
    fg_idx, fg_cnt = ranked(fg_mask, k1)
    hard_idx, hard_cnt = ranked(hard_mask, k2)
    easy_idx, easy_cnt = ranked(easy_mask, k3)

    fg_quota = int(round(fg_ratio * roi_per_image))
    fg_num = jnp.minimum(fg_quota, fg_cnt)
    bg_cnt = hard_cnt + easy_cnt
    # if no bg at all: all fg (sampled w/ replacement); if no fg: all bg
    fg_num = jnp.where(bg_cnt == 0, jnp.minimum(roi_per_image, jnp.maximum(fg_cnt, 1)), fg_num)
    fg_num = jnp.where(fg_cnt == 0, 0, fg_num)
    bg_num = roi_per_image - fg_num

    # fg picks: without replacement up to fg_cnt, wrap (replacement) beyond
    slot = jnp.arange(roi_per_image, dtype=jnp.int32)
    fg_pos = jnp.where(fg_cnt > 0, slot % jnp.maximum(fg_cnt, 1), 0)
    fg_pick = fg_idx[fg_pos]

    # bg picks: hard/easy split with replacement (reference randint)
    hard_quota = jnp.where(
        (hard_cnt > 0) & (easy_cnt > 0),
        jnp.minimum((bg_num * hard_bg_ratio).astype(jnp.int32), hard_cnt),
        jnp.where(hard_cnt > 0, bg_num, 0),
    )
    hard_pick = _pick_with_replacement(k4, hard_idx, hard_cnt, roi_per_image)
    easy_pick = _pick_with_replacement(k5, easy_idx, easy_cnt, roi_per_image)

    is_fg_slot = slot < fg_num
    bg_j = jnp.maximum(slot - fg_num, 0)  # bg slot index within the bg quota
    bg_pick = jnp.where(bg_j < hard_quota, hard_pick[bg_j], easy_pick[bg_j])
    sampled = jnp.where(is_fg_slot, fg_pick, bg_pick)
    return sampled, is_fg_slot


def canonical_reg_targets(rois, gt_of_rois):
    """Transform matched gts into each roi's canonical frame (reference
    `roi_head_template.assign_targets:102-133`): translate to roi center,
    rotate by -roi heading, flip heading into [-pi/2, pi/2]."""
    center = gt_of_rois[..., 0:3] - rois[..., 0:3]
    center = common.rotate_points_along_z(center[:, None, :], -rois[:, 6])[:, 0]
    heading = gt_of_rois[..., 6] - rois[..., 6]
    heading = heading % (2 * np.pi)
    opposite = (heading > np.pi * 0.5) & (heading < np.pi * 1.5)
    heading = jnp.where(opposite, (heading + np.pi) % (2 * np.pi), heading)
    heading = jnp.where(heading > np.pi, heading - 2 * np.pi, heading)
    heading = jnp.clip(heading, -np.pi / 2, np.pi / 2)
    return jnp.concatenate(
        [center, gt_of_rois[..., 3:6], heading[..., None]], axis=-1
    )


def assign_targets(
    rng, proposals: Proposals, gt_boxes, *,
    roi_per_image: int, fg_ratio: float, reg_fg_thresh: float,
    cls_fg_thresh: float, cls_bg_thresh: float, cls_bg_thresh_lo: float,
    hard_bg_ratio: float,
):
    """Batch roi sampling + targets. gt_boxes: (B, G, 8) (7 + class).

    Returns dict with rois (B, R, 7), roi_labels, reg_valid_mask,
    rcnn_cls_labels (iou-interpolated), gt_of_rois (canonical, (B, R, 7)),
    gt_of_rois_src (global frame), roi_valid.
    """
    B = proposals.rois.shape[0]
    rngs = jax.random.split(rng, B)

    def per_frame(rng_i, rois, roi_scores, roi_labels, roi_valid, gt):
        gt7, gtc = gt[:, :7], gt[:, 7].astype(jnp.int32)
        gt_valid = gtc > 0
        max_iou, gt_assign = max_iou_with_same_class(rois, roi_labels, gt7, gtc, gt_valid)
        sampled, is_fg = subsample_rois(
            rng_i, max_iou, roi_valid,
            roi_per_image=roi_per_image, fg_ratio=fg_ratio,
            reg_fg_thresh=reg_fg_thresh, cls_fg_thresh=cls_fg_thresh,
            cls_bg_thresh=cls_bg_thresh, cls_bg_thresh_lo=cls_bg_thresh_lo,
            hard_bg_ratio=hard_bg_ratio,
        )
        s_rois = rois[sampled]
        s_iou = max_iou[sampled]
        s_labels = roi_labels[sampled]
        s_gt = gt7[gt_assign[sampled]]
        s_valid = roi_valid[sampled]

        # iou-interpolated cls label (CLS_SCORE_TYPE roi_iou)
        interp = (s_iou - cls_bg_thresh) / (cls_fg_thresh - cls_bg_thresh)
        cls_label = jnp.clip(interp, 0.0, 1.0)
        cls_label = jnp.where(s_iou >= cls_fg_thresh, 1.0, cls_label)
        cls_label = jnp.where(s_iou <= cls_bg_thresh, 0.0, cls_label)
        reg_valid = (s_iou >= reg_fg_thresh) & s_valid

        gt_canon = canonical_reg_targets(s_rois, s_gt)
        return s_rois, s_labels, s_iou, cls_label, reg_valid, gt_canon, s_gt, s_valid

    out = jax.vmap(per_frame)(
        rngs, proposals.rois, proposals.roi_scores, proposals.roi_labels,
        proposals.roi_valid, gt_boxes,
    )
    keys = ["rois", "roi_labels", "roi_ious", "rcnn_cls_labels",
            "reg_valid_mask", "gt_of_rois", "gt_of_rois_src", "roi_valid"]
    return dict(zip(keys, out))
