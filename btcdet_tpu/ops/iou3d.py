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


def _ring_forward_fill(verts, valid, xp):
    """Replace invalid slots with the nearest preceding valid vertex
    (cyclically). Duplicated vertices keep the polygon geometry identical
    (zero-length edges), which lets later passes treat every slot as
    valid with plain rolls -- no gathers. log2-step doubling fills."""
    P, S, _ = verts.shape
    v = xp.concatenate([verts, verts], axis=1)      # (P, 2S, 2) ring
    m = xp.concatenate([valid, valid], axis=1)
    step = 1
    while step < 2 * S:
        v_shift = xp.roll(v, step, axis=1)
        m_shift = xp.roll(m, step, axis=1)
        v = xp.where(m[..., None], v, v_shift)
        m = m | m_shift
        step *= 2
    return v[:, S:], m[:, S:]


def _pairwise_intersection_area(corners_a, corners_b, xp):
    """corners_a: (N, 4, 2), corners_b: (M, 4, 2) -> (N, M) intersection
    area via vectorized Sutherland-Hodgman clipping.

    A's quad is clipped by B's 4 half-planes with a slot-doubling vertex
    ring (4 -> 8 -> 16 -> 32 -> 64 slots). After each pass, dropped slots
    are forward-filled with the preceding surviving vertex, so the ring
    stays fully populated (duplicates are geometrically inert) and the
    next pass needs only static `roll`s -- zero per-pair gathers, sorts,
    or scatters. Everything stays elementwise on the VPU; earlier
    formulations (24-candidate angle argsort; validity-gather SH)
    scalarized and ran 30-100x slower on TPU.
    """
    N, M = corners_a.shape[0], corners_b.shape[0]
    P = N * M
    dt = corners_a.dtype

    b = xp.broadcast_to(corners_b[None], (N, M, 4, 2)).reshape(P, 4, 2)
    b_next = xp.roll(b, -1, axis=1)
    # shoelace sign of B gives its winding; inside = -cross * winding >= 0
    winding = xp.sign(
        (b_next[..., 0] - b[..., 0]) * (b_next[..., 1] + b[..., 1])
    ).sum(axis=1, keepdims=True)
    winding = xp.where(winding == 0, 1.0, xp.sign(winding))  # (P, 1)

    verts = xp.broadcast_to(corners_a[:, None], (N, M, 4, 2)).reshape(P, 4, 2)
    alive = xp.ones((P,), dtype=bool)

    for e in range(4):
        e0 = b[:, e]
        ed = b_next[:, e] - e0
        d = (
            ed[:, None, 0] * (verts[..., 1] - e0[:, None, 1])
            - ed[:, None, 1] * (verts[..., 0] - e0[:, None, 0])
        ) * (-winding)
        nxt = xp.roll(verts, -1, axis=1)
        d_nxt = xp.roll(d, -1, axis=1)
        in_cur = d >= 0
        in_nxt = d_nxt >= 0
        denom = d - d_nxt
        t = d / xp.where(xp.abs(denom) < 1e-12, 1.0, denom)
        pint = verts + t[..., None] * (nxt - verts)

        S = verts.shape[1]
        # interleave [kept-vertex, crossing-point] into a 2S ring
        out = xp.stack([verts, pint], axis=2).reshape(P, 2 * S, 2)
        oval = xp.stack([in_cur, in_cur != in_nxt], axis=2).reshape(P, 2 * S)
        alive = alive & xp.any(oval, axis=1)
        verts, _ = _ring_forward_fill(out, oval & alive[:, None], xp)

    nxt = xp.roll(verts, -1, axis=1)
    contrib = verts[..., 0] * nxt[..., 1] - nxt[..., 0] * verts[..., 1]
    area = 0.5 * xp.abs(contrib.sum(axis=1))
    return xp.where(alive, area, 0.0).reshape(N, M)


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


def _greedy_suppress(suppress_mat, top_valid, k: int):
    """Sequential greedy suppression over a precomputed (k, k) bitmask."""
    def body(i, keep):
        keep_i = keep[i]
        row = suppress_mat[i] & (jnp.arange(k) > i)
        return jnp.where(keep_i, keep & ~row, keep)

    return jax.lax.fori_loop(0, k, body, top_valid)


def _select_first_kept(keep, top_idx, post_max_size: int):
    """First post_max_size kept entries, in score order."""
    keep_rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    scat = jnp.where(keep & (keep_rank < post_max_size), keep_rank, post_max_size)
    out_idx = jnp.zeros((post_max_size + 1,), jnp.int32).at[scat].set(
        top_idx.astype(jnp.int32)
    )[:post_max_size]
    out_val = jnp.zeros((post_max_size + 1,), bool).at[scat].set(keep)[:post_max_size]
    return out_idx, out_val


def _greedy_nms_rounds(top_boxes, top_valid, top_idx, thresh: float,
                       post_max_size: int, top_scores=None):
    """Greedy NMS over DESCENDING-score-sorted candidates with sequential
    depth `post_max_size` instead of `pre_max_size`: each round keeps the
    first still-live candidate (= highest-scoring unsuppressed box, since
    the input is score-sorted) and kills its overlap row, computed on the
    fly -- no (k, k) IoU matrix, no per-candidate loop. Exactly the
    greedy result: every kept box is by construction the best-scored box
    not suppressed by a previously kept one, and greedy never returns
    more than post_max_size survivors by definition of the caller's cap
    (reference `nms_gpu` keeps post_max via slicing the keep list)."""
    k = top_boxes.shape[0]
    iota = jnp.arange(k, dtype=jnp.int32)
    if top_scores is not None:
        neg_inf = jnp.finfo(top_scores.dtype).min

    def body(r, carry):
        alive, out_idx, out_valid = carry
        if top_scores is None:
            i = jnp.argmax(alive).astype(jnp.int32)  # first live candidate
        else:  # unsorted candidates: pick best live score directly
            i = jnp.argmax(
                jnp.where(alive, top_scores, neg_inf)).astype(jnp.int32)
        got = alive[i]
        bi = jax.lax.dynamic_slice(top_boxes, (i, 0), (1, 7))
        row = boxes_iou_bev(bi, top_boxes)[0] > thresh
        alive = alive & ~row & (iota != i)
        out_idx = out_idx.at[r].set(jnp.where(got, top_idx[i], 0))
        out_valid = out_valid.at[r].set(got)
        return alive, out_idx, out_valid

    out_idx = jnp.zeros((post_max_size,), jnp.int32)
    out_valid = jnp.zeros((post_max_size,), bool)
    # greedy can never keep more than k survivors: cap the rounds when
    # post_max_size exceeds the candidate count (final NMS: post 500 over
    # 100 rois)
    _, out_idx, out_valid = jax.lax.fori_loop(
        0, min(post_max_size, k), body, (top_valid, out_idx, out_valid))
    return out_idx, out_valid


def nms_rotated(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    *,
    thresh: float,
    pre_max_size: int,
    post_max_size: int,
    chunk_size: int = 256,
    impl: str = "auto",
    pre_select: str = "sort",
):
    """Rotated-BEV NMS (reference `nms_gpu` semantics: suppress by BEV IoU
    of the 7-dof boxes, descending score order).

    boxes: (N, 7); scores/valid: (N,). Static shapes throughout.
    Returns (indices (post_max_size,) int32 into the input, valid_out
    (post_max_size,) bool).

    impl="rounds" (default): survivor-paced greedy -- post_max_size
    sequential rounds, each keeping the best live candidate and
    suppressing its on-the-fly IoU row; O(post * k) pair IoUs and
    sequential depth post instead of k.

    impl="chunked": descending-score chunks, each first suppressed
    against the survivors found so far then greedily NMS'd internally;
    O(k * (chunk + post)) pair IoUs, sequential depth ~k. Kept for A/B
    comparison; both are exactly the greedy result.

    pre_select="radix" (rounds impl only) replaces the O(N log N)
    `lax.top_k` pre-selection with an exact radix-select of the top-k
    SET (`ops.topk.top_k_set`); the rounds loop then picks per-round
    maxima by score directly, so no sort happens at all. Same survivor
    set up to score-tie ordering (both are index-arbitrary at ties).
    """
    neg_inf = jnp.finfo(scores.dtype).min
    s = jnp.where(valid, scores, neg_inf)
    k = min(pre_max_size, boxes.shape[0])
    if impl == "auto":
        # measured (tools/microbench_nms.py, v5e): rounds wins/ties at
        # eval-scale k (sequential depth post << k) but loses ~11x at
        # train's k=9000 (per-round 1-vs-9000 IoU rows pay HBM round
        # trips 256 times); chunked amortizes those into 256-wide tiles
        impl = "rounds" if k <= 2048 else "chunked"

    if impl == "rounds" and pre_select == "radix":
        from . import topk as topk_mod

        idx, got = topk_mod._row_top_k_set(s, valid, k)
        return _greedy_nms_rounds(
            boxes[idx], got, idx, thresh, post_max_size,
            top_scores=jnp.where(got, s[idx], neg_inf))

    top_scores, top_idx = jax.lax.top_k(s, k)
    top_valid = top_scores > neg_inf
    top_boxes = boxes[top_idx]

    if impl == "rounds":
        return _greedy_nms_rounds(
            top_boxes, top_valid, top_idx.astype(jnp.int32), thresh,
            post_max_size)

    if k <= max(chunk_size, 2 * post_max_size):
        iou = _chunked_pairwise(boxes_iou_bev, top_boxes, top_boxes, chunk=min(128, k))
        suppress = (iou > thresh) & top_valid[None, :] & top_valid[:, None]
        keep = _greedy_suppress(suppress, top_valid, k)
        return _select_first_kept(keep, top_idx, post_max_size)

    # hierarchical: survivors accumulate in a fixed post_max_size buffer
    n_chunks = -(-k // chunk_size)
    pad = n_chunks * chunk_size - k
    top_boxes = jnp.concatenate([top_boxes, jnp.zeros((pad, 7), top_boxes.dtype)])
    top_valid_p = jnp.concatenate([top_valid, jnp.zeros((pad,), bool)])
    top_idx_p = jnp.concatenate([top_idx, jnp.zeros((pad,), top_idx.dtype)])

    sv_boxes = jnp.zeros((post_max_size, 7), top_boxes.dtype)
    sv_idx = jnp.zeros((post_max_size,), jnp.int32)
    sv_valid = jnp.zeros((post_max_size,), bool)
    sv_count = jnp.zeros((), jnp.int32)

    def chunk_body(carry, inputs):
        sv_boxes, sv_idx, sv_valid, sv_count = carry
        cb, cv, ci = inputs

        def run(_):
            cv2 = cv & ~jnp.any(
                (_chunked_pairwise(boxes_iou_bev, cb, sv_boxes, chunk=min(128, chunk_size)) > thresh)
                & sv_valid[None, :],
                axis=1,
            )
            iou_cc = _chunked_pairwise(boxes_iou_bev, cb, cb, chunk=min(128, chunk_size))
            suppress = (iou_cc > thresh) & cv2[None, :] & cv2[:, None]
            keep = _greedy_suppress(suppress, cv2, chunk_size)
            rank = jnp.cumsum(keep.astype(jnp.int32)) - 1 + sv_count
            scat = jnp.where(keep & (rank < post_max_size), rank, post_max_size)
            nb = jnp.concatenate(
                [sv_boxes, jnp.zeros((1, 7), sv_boxes.dtype)]
            ).at[scat].set(jnp.where(keep[:, None], cb, 0.0))[:post_max_size]
            ni = jnp.concatenate(
                [sv_idx, jnp.zeros((1,), jnp.int32)]
            ).at[scat].set(ci.astype(jnp.int32))[:post_max_size]
            nv = jnp.concatenate(
                [sv_valid, jnp.zeros((1,), bool)]
            ).at[scat].set(keep)[:post_max_size]
            return nb, ni, nv, jnp.minimum(sv_count + keep.sum(), post_max_size)

        # skip chunks once the survivor buffer is full or the chunk has no
        # live candidates (train NMS typically fills post_max in chunk 0)
        new_carry = jax.lax.cond(
            (sv_count < post_max_size) & jnp.any(cv),
            run, lambda _: (sv_boxes, sv_idx, sv_valid, sv_count), operand=None,
        )
        return new_carry, None

    chunks = (
        top_boxes.reshape(n_chunks, chunk_size, 7),
        top_valid_p.reshape(n_chunks, chunk_size),
        top_idx_p.reshape(n_chunks, chunk_size),
    )
    (sv_boxes, sv_idx, sv_valid, sv_count), _ = jax.lax.scan(
        chunk_body, (sv_boxes, sv_idx, sv_valid, sv_count), chunks
    )
    return sv_idx, sv_valid


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
