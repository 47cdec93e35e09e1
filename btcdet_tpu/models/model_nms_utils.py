"""NMS drivers matching the reference's
`btcdet/models/model_nms_utils.py` surface (`class_agnostic_nms`,
`multi_classes_nms`) on top of the TPU rotated-NMS op."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import iou3d


def class_agnostic_nms(box_scores, box_preds, nms_config, score_thresh=None):
    """box_scores: (N,), box_preds: (N, 7). Returns (selected_idx
    (post,), selected_valid (post,)). Score threshold pre-filtering as in
    the reference (`model_nms_utils.py:6-30`)."""
    valid = jnp.ones_like(box_scores, dtype=bool)
    if score_thresh is not None:
        valid = box_scores >= score_thresh
    return iou3d.nms_rotated(
        box_preds, box_scores, valid,
        thresh=float(nms_config.NMS_THRESH),
        pre_max_size=int(nms_config.NMS_PRE_MAXSIZE),
        post_max_size=int(nms_config.NMS_POST_MAXSIZE),
    )


def multi_classes_nms(cls_scores, box_preds, nms_config, score_thresh=None):
    """Per-class NMS (reference `model_nms_utils.py:33-65`).
    cls_scores: (N, C). Returns per-class lists of (idx, valid, label)."""
    out = []
    for c in range(cls_scores.shape[1]):
        scores = cls_scores[:, c]
        idx, v = class_agnostic_nms(scores, box_preds, nms_config, score_thresh)
        out.append((idx, v, jnp.full_like(idx, c + 1)))
    return out
