"""Loss functions (reference `btcdet/utils/loss_utils.py`).

All losses are pure functions over jnp arrays returning per-element loss
tensors (the caller applies weights/normalization), matching the
reference's Weighted* module semantics:

  - sigmoid focal (SigmoidFocalClassificationLoss: gamma=2, alpha=0.25)
  - softmax focal used by the occ head (cls_alpha from config)
  - weighted smooth-L1 with per-dim code weights (beta = 1/9 default)
  - weighted cross entropy (direction bins)
  - corner loss (reference `loss_utils.get_corner_loss_lidar`)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import box_utils


def sigmoid_focal_loss(logits, targets, gamma: float = 2.0, alpha: float = 0.25):
    """Per-element sigmoid focal loss (no reduction).

    logits, targets: (..., C); targets are {0,1} one-hot floats.
    Matches reference `SigmoidFocalClassificationLoss.forward` which uses
    the numerically-stable BCE-with-logits formulation.
    """
    pred_sigmoid = jax.nn.sigmoid(logits)
    alpha_weight = targets * alpha + (1 - targets) * (1 - alpha)
    pt = targets * (1.0 - pred_sigmoid) + (1.0 - targets) * pred_sigmoid
    focal_weight = alpha_weight * jnp.power(pt, gamma)
    bce = jnp.clip(logits, 0, None) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return focal_weight * bce


def softmax_focal_loss(logits, targets_onehot, alpha: float = 0.5, gamma: float = 2.0):
    """Softmax focal loss per element over the class axis (occ head,
    reference `occ_head_template.mean_masked_loss` softmax branch)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    focal = alpha * jnp.power(1.0 - p, gamma)
    return -(targets_onehot * focal * logp).sum(axis=-1)


def smooth_l1_loss(diff, beta: float = 1.0 / 9.0):
    """Per-element smooth-L1 (huber) on a residual tensor."""
    if beta < 1e-5:
        return jnp.abs(diff)
    n = jnp.abs(diff)
    return jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)


def weighted_smooth_l1_loss(preds, targets, weights=None, beta: float = 1.0 / 9.0, code_weights=None):
    """preds/targets: (B, N, C); weights: (B, N). Returns (B, N, C)."""
    targets = jnp.where(jnp.isnan(targets), preds, targets)  # ref: ignore nan targets
    diff = preds - targets
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, dtype=diff.dtype)
    loss = smooth_l1_loss(diff, beta)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def weighted_cross_entropy(logits, targets_onehot, weights=None):
    """(B, N, C) logits vs one-hot; (B, N) weights. Returns (B, N)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -(targets_onehot * logp).sum(axis=-1)
    if weights is not None:
        loss = loss * weights
    return loss


def binary_cross_entropy_with_logits(logits, targets):
    return jnp.clip(logits, 0, None) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def get_corner_loss_lidar(pred_boxes, gt_boxes, beta: float = 1.0):
    """Corner alignment loss with heading-flip minimum (reference
    `loss_utils.get_corner_loss_lidar`). pred/gt: (N, 7) -> (N,)."""
    pred_corners = box_utils.boxes_to_corners_3d(pred_boxes)
    gt_corners = box_utils.boxes_to_corners_3d(gt_boxes)
    gt_flip = jnp.concatenate(
        [gt_boxes[:, 0:6], gt_boxes[:, 6:7] + np.pi, gt_boxes[:, 7:]], axis=-1
    )
    gt_corners_flip = box_utils.boxes_to_corners_3d(gt_flip)
    dist = jnp.linalg.norm(pred_corners - gt_corners, axis=-1)
    dist_flip = jnp.linalg.norm(pred_corners - gt_corners_flip, axis=-1)
    corner_dist = jnp.minimum(dist, dist_flip)  # (N, 8)
    return smooth_l1_loss(corner_dist, beta=beta).mean(axis=1)
