"""Rotated-BEV box overlap / IoU and rotated NMS.

TPU-native replacement of the reference's CUDA `iou3d_nms` extension
(`btcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu`, wrapped by
`iou3d_nms_utils.py`). Instead of the CUDA Sutherland-Hodgman clip loop,
the intersection polygon of two rotated rectangles is assembled from a
*fixed 24-candidate vertex buffer* (4 corners of A inside B, 4 of B
inside A, up to 16 edge-edge intersections), angle-sorted around the
centroid and measured with the shoelace formula -- fully vectorized, no
data-dependent control flow, so it runs as straight XLA on the VPU.

The same math serves: NMS, the proposal-target 3D IoU
(`proposal_target_layer.py:222`), recall records, gt-sampler collision
checks (numpy path), and the official KITTI metric (`btcdet_tpu/eval`).

Functions dispatch on input type: jnp arrays stay on device; numpy
arrays use numpy (for the CPU data pipeline / eval).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import box_utils


def _xp(a):
    return jnp if isinstance(a, jnp.ndarray) else np


def _pairwise_intersection_area(corners_a, corners_b, xp):
    """corners_a: (N, 4, 2), corners_b: (M, 4, 2) -> (N, M) area of the
    intersection polygon of each rectangle pair."""
    N, M = corners_a.shape[0], corners_b.shape[0]
    A = corners_a[:, None]  # (N, 1, 4, 2)
    B = corners_b[None, :]  # (1, M, 4, 2)

    def points_in_rect(pts, rect):
        # pts: (..., K, 2); rect: (..., 4, 2) convex CCW or CW quad
        # inside test via consistent cross-product sign over the 4 edges
        r0 = rect
        r1 = xp.roll(rect, -1, axis=-2)
        edge = r1 - r0  # (..., 4, 2)
        top = pts[..., :, None, :] - r0[..., None, :, :]  # (..., K, 4, 2)
        cross = edge[..., None, :, 0] * top[..., 1] - edge[..., None, :, 1] * top[..., 0]
        return xp.all(cross >= -1e-8, axis=-1) | xp.all(cross <= 1e-8, axis=-1)

    in_ab = points_in_rect(A, B)  # (N, M, 4) corners of A inside B
    in_ba = points_in_rect(B, A)  # (N, M, 4)

    # edge-edge intersections: A edge i (4) x B edge j (4)
    a0 = A
    a1 = xp.roll(A, -1, axis=-2)
    b0 = B
    b1 = xp.roll(B, -1, axis=-2)
    # parametric: a0 + t*(a1-a0) == b0 + u*(b1-b0)
    da = (a1 - a0)[..., :, None, :]  # (N, M, 4, 1, 2)
    db = (b1 - b0)[..., None, :, :]  # (N, M, 1, 4, 2)
    w = b0[..., None, :, :] - a0[..., :, None, :]  # (N, M, 4, 4, 2)
    denom = da[..., 0] * db[..., 1] - da[..., 1] * db[..., 0]
    t = (w[..., 0] * db[..., 1] - w[..., 1] * db[..., 0]) / xp.where(
        xp.abs(denom) < 1e-10, 1.0, denom
    )
    u = (w[..., 0] * da[..., 1] - w[..., 1] * da[..., 0]) / xp.where(
        xp.abs(denom) < 1e-10, 1.0, denom
    )
    hit = (
        (xp.abs(denom) >= 1e-10)
        & (t >= 0.0) & (t <= 1.0)
        & (u >= 0.0) & (u <= 1.0)
    )  # (N, M, 4, 4)
    pint = a0[..., :, None, :] + t[..., None] * da  # (N, M, 4, 4, 2)

    # assemble candidate vertices: 4 + 4 + 16 = 24 slots
    cand = xp.concatenate(
        [
            xp.broadcast_to(A, (N, M, 4, 2)),
            xp.broadcast_to(B, (N, M, 4, 2)),
            pint.reshape(N, M, 16, 2),
        ],
        axis=2,
    )  # (N, M, 24, 2)
    valid = xp.concatenate([in_ab, in_ba, hit.reshape(N, M, 16)], axis=2)

    cnt = valid.sum(axis=-1)  # (N, M)
    has_poly = cnt >= 3

    vf = valid[..., None].astype(cand.dtype)
    centroid = (cand * vf).sum(axis=2) / xp.maximum(cnt[..., None], 1)
    rel = cand - centroid[..., None, :]
    ang = xp.arctan2(rel[..., 1], rel[..., 0])
    ang = xp.where(valid, ang, 1e9)  # invalid -> end after sort
    order = xp.argsort(ang, axis=-1)
    sorted_pts = xp.take_along_axis(cand, order[..., None], axis=2)

    idx = xp.arange(24)
    nxt = xp.where(idx[None, None, :] + 1 < cnt[..., None], idx[None, None, :] + 1, 0)
    nxt_pts = xp.take_along_axis(sorted_pts, nxt[..., None], axis=2)
    contrib = (
        sorted_pts[..., 0] * nxt_pts[..., 1] - nxt_pts[..., 0] * sorted_pts[..., 1]
    )
    contrib = xp.where(idx[None, None, :] < cnt[..., None], contrib, 0.0)
    area = 0.5 * xp.abs(contrib.sum(axis=-1))
    return xp.where(has_poly, area, 0.0)


def boxes_overlap_bev(boxes_a, boxes_b):
    """Rotated BEV overlap area. boxes: (N, 7)/(M, 7) -> (N, M)."""
    xp = _xp(boxes_a)
    ca = box_utils.boxes_to_corners_bev(boxes_a)
    cb = box_utils.boxes_to_corners_bev(boxes_b)
    return _pairwise_intersection_area(ca, cb, xp)


def boxes_iou_bev(boxes_a, boxes_b):
    """Rotated BEV IoU (reference `boxes_iou_bev_gpu`)."""
    xp = _xp(boxes_a)
    inter = boxes_overlap_bev(boxes_a, boxes_b)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return inter / xp.clip(area_a + area_b - inter, 1e-6, None)


def boxes_iou3d(boxes_a, boxes_b):
    """3D IoU = rotated BEV overlap x z-overlap / union (reference
    `iou3d_nms_utils.boxes_iou3d_gpu`)."""
    xp = _xp(boxes_a)
    overlaps_bev = boxes_overlap_bev(boxes_a, boxes_b)
    a_top = boxes_a[:, 2] + boxes_a[:, 5] / 2
    a_bot = boxes_a[:, 2] - boxes_a[:, 5] / 2
    b_top = boxes_b[:, 2] + boxes_b[:, 5] / 2
    b_bot = boxes_b[:, 2] - boxes_b[:, 5] / 2
    overlaps_h = xp.clip(
        xp.minimum(a_top[:, None], b_top[None, :]) - xp.maximum(a_bot[:, None], b_bot[None, :]),
        0,
        None,
    )
    overlaps_3d = overlaps_bev * overlaps_h
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return overlaps_3d / xp.clip(vol_a + vol_b - overlaps_3d, 1e-6, None)


def _chunked_pairwise(fn, boxes_a, boxes_b, chunk: int = 256):
    """Row-chunked pairwise op for large N on device (bounds peak memory
    of the 24-candidate buffers)."""
    N = boxes_a.shape[0]
    pad = (-N) % chunk
    ap = jnp.concatenate([boxes_a, jnp.zeros((pad, boxes_a.shape[1]), boxes_a.dtype)])
    rows = ap.reshape(-1, chunk, boxes_a.shape[1])
    out = jax.lax.map(lambda r: fn(r, boxes_b), rows)
    return out.reshape(-1, boxes_b.shape[0])[:N]


def nms_rotated(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    *,
    thresh: float,
    pre_max_size: int,
    post_max_size: int,
):
    """Rotated-BEV NMS (reference `nms_gpu` semantics: suppress by BEV IoU
    of the 7-dof boxes, descending score order).

    boxes: (N, 7); scores/valid: (N,). Static shapes throughout.
    Returns (indices (post_max_size,) int32 into the input, valid_out
    (post_max_size,) bool).
    """
    neg_inf = jnp.finfo(scores.dtype).min
    s = jnp.where(valid, scores, neg_inf)
    k = min(pre_max_size, boxes.shape[0])
    top_scores, top_idx = jax.lax.top_k(s, k)
    top_valid = top_scores > neg_inf
    top_boxes = boxes[top_idx]

    iou = _chunked_pairwise(boxes_iou_bev, top_boxes, top_boxes, chunk=min(128, k))
    suppress_mat = (iou > thresh) & top_valid[None, :] & top_valid[:, None]

    def body(i, keep):
        keep_i = keep[i]
        row = suppress_mat[i] & (jnp.arange(k) > i)
        return jnp.where(keep_i, keep & ~row, keep)

    keep = jax.lax.fori_loop(0, k, body, top_valid)

    # select the first post_max_size kept, in score order
    keep_rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    out_idx = jnp.zeros((post_max_size,), jnp.int32)
    out_val = jnp.zeros((post_max_size,), bool)
    scat = jnp.where(keep & (keep_rank < post_max_size), keep_rank, post_max_size)
    out_idx = jnp.concatenate([out_idx, jnp.zeros((1,), jnp.int32)]).at[scat].set(
        top_idx.astype(jnp.int32)
    )[:post_max_size]
    out_val = jnp.concatenate([out_val, jnp.zeros((1,), bool)]).at[scat].set(keep)[
        :post_max_size
    ]
    return out_idx, out_val


def nms_normal(
    boxes: jax.Array, scores: jax.Array, valid: jax.Array, *,
    thresh: float, pre_max_size: int, post_max_size: int,
):
    """`nms_normal_gpu` equivalent: axis-aligned-corner IoU suppression
    of the rotated boxes is NOT what the reference does -- it uses the
    same rotated overlap but without the BEV alignment; we keep rotated
    IoU here too (the reference's normal NMS is unused by the shipped
    config)."""
    return nms_rotated(
        boxes, scores, valid,
        thresh=thresh, pre_max_size=pre_max_size, post_max_size=post_max_size,
    )


def boxes_bev_iou_cpu(boxes_a, boxes_b):
    """numpy rotated BEV IoU for the CPU pipeline (gt-sampler collision,
    reference `boxes_bev_iou_cpu`)."""
    return np.asarray(boxes_iou_bev(np.asarray(boxes_a), np.asarray(boxes_b)))
