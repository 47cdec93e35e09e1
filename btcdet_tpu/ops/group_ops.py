"""Point grouping ops: ball / shell query, grouping, PointNet SA modules.

TPU-native replacement of the reference's `pointnet2_stack` CUDA ops
(`btcdet/ops/pointnet2/pointnet2_stack/`): `ball_query`, the BtcDet
`shell_query` annulus variant (`src/shell_query_gpu.cu`), grouping, and
`StackSAModuleMSG` with the BtcDet additions -- per-roi rotation and
xy/z scaling of grouped offsets (`pointnet2_utils.py:150-193`).

Design change for TPU: the reference uses a stacked-ragged layout
(N1+N2+... points with per-batch counts). Here everything is dense
padded `[B, N, ...]` with validity masks -- static shapes, and the
query/group becomes a chunked distance computation + top-k that XLA
vectorizes on the VPU. "First nsample points within radius in point
order" (the CUDA kernel's semantics) is reproduced by top-k over a
descending-index score.

Also provides `three_nn` / `three_interpolate` and
`furthest_point_sample` for the dense-batch (`pointnet2_batch`) surface.
"""

from __future__ import annotations

import functools
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _query_scores(dist2, valid_pts, r_inner2: float, r_outer2: float):
    """Score matrix for 'first K in point order within the (annulus)
    radius': in-range points get descending-by-index positive scores."""
    N = dist2.shape[-1]
    in_range = (dist2 <= r_outer2) & (dist2 >= r_inner2) & valid_pts
    order_score = jnp.arange(N, 0, -1, dtype=jnp.float32)
    return jnp.where(in_range, order_score, -1.0)


def multi_ball_query(
    xyz: jax.Array,          # (B, N, 3)
    xyz_mask: jax.Array,     # (B, N)
    new_xyz: jax.Array,      # (B, M, 3)
    new_mask: jax.Array,     # (B, M)
    radii,                   # sequence of float or (inner, outer)
    nsamples,                # sequence of int
    chunk: int = 512,
    approx: bool = False,
    shared_candidates: bool | None = None,
):
    """Shared-distance multi-scale ball/shell query: the (M, N) distance
    matrix is computed once per chunk (as one MXU matmul + norms).

    Selection strategy:
      * per-scale (shared_candidates=False): every scale runs its own
        top-k over an (S, chunk, N) score stack -- exact "first K in
        point order within radius" (the reference CUDA semantics).
      * shared candidates (default when `approx`): ONE top-k by nearness
        over the widest radius yields k_max candidates; each scale then
        picks its "first K in point order" among those candidates with a
        tiny in-register top-k. This skips materializing + reducing the
        S-times-larger score stack (the query's HBM bottleneck). A
        scale-s ball point can only be displaced when more than k_max
        nearer points exist -- in which case the ball is over-full and a
        nearest-biased subset is at least as informative as the
        reference's arbitrary scan-order subset.

    Returns per scale: (idx (B, M, k_s) int32, empty (B, M) bool).
    """
    S = len(radii)
    k_max = max(int(k) for k in nsamples)
    if shared_candidates is None:
        shared_candidates = approx
    r2 = []
    for r in radii:
        if isinstance(r, (list, tuple)):
            r2.append((float(r[0]) ** 2, float(r[1]) ** 2))
        else:
            r2.append((0.0, float(r) ** 2))
    r_out_max = max(hi for _, hi in r2)
    if shared_candidates and any(lo > 0.0 for lo, _ in r2):
        # nearest-k candidates are a sound subset only for lo=0 balls: a
        # shell (annulus) scale's true neighbors can ALL be displaced by
        # points inside its inner radius, zeroing the scale even when the
        # annulus is sparsely populated -- use exact per-scale selection
        shared_candidates = False

    B, M, _ = new_xyz.shape
    N = xyz.shape[1]
    pad = (-M) % chunk
    q = jnp.concatenate([new_xyz, jnp.zeros((B, pad, 3), new_xyz.dtype)], axis=1)
    qm = jnp.concatenate([new_mask, jnp.zeros((B, pad), bool)], axis=1)
    n_chunks = q.shape[1] // chunk
    q = q.reshape(B, n_chunks, chunk, 3).transpose(1, 0, 2, 3)
    qm = qm.reshape(B, n_chunks, chunk).transpose(1, 0, 2)

    xyz_sq = jnp.sum(xyz * xyz, axis=-1)  # (B, N)
    order_score = jnp.arange(N, 0, -1, dtype=jnp.float32)
    BIG = jnp.float32(3.0e38)

    def dist2_of(qc):
        cross = jnp.einsum("bqc,bnc->bqn", qc, xyz, preferred_element_type=jnp.float32)
        return jnp.sum(qc * qc, axis=-1)[..., None] + xyz_sq[:, None, :] - 2.0 * cross

    # --- tiered candidate width (shared path) ----------------------------
    # The candidate table is CAPACITY-padded (eval occ cap 40000 vs ~3k
    # live points). `nvalid` = last valid index + 1 bounds the prefix
    # that can contain candidates; a batch-level lax.cond picks the
    # smallest static prefix width >= nvalid, so the usual case runs ONE
    # fused distance-matmul + top-k at ~1/10 the padded width (cost
    # scales with occupancy, not cap) while keeping worst-case semantics
    # bit-identical (the skipped suffix is all-invalid). No dependence
    # on valid-first layout: the prefix is cut at the LAST valid index.
    # (A fori_loop-of-slabs variant measured 20% SLOWER end-to-end than
    # the unsliced query -- per-iteration dispatch + lost fusion; the
    # static-width cond keeps the original fused kernel shape.)
    iota_n = jnp.arange(N, dtype=jnp.int32)
    nvalid = jnp.max(jnp.where(xyz_mask, iota_n[None, :], -1)) + 1
    tiers = [t for t in (4096, 16384) if t < N]

    def shared_cands_width(qc, width):
        x = xyz[:, :width]
        m = xyz_mask[:, :width]
        xsq = xyz_sq[:, :width]
        cross = jnp.einsum(
            "bqc,bnc->bqn", qc, x, preferred_element_type=jnp.float32)
        d2 = jnp.sum(qc * qc, axis=-1)[..., None] + xsq[:, None, :] - 2.0 * cross
        in_any = (d2 <= r_out_max) & m[:, None, :]
        neg = jnp.where(in_any, -d2, -BIG)
        if approx:
            nd, cd = jax.lax.approx_max_k(neg, k_max, recall_target=0.95)
        else:
            nd, cd = jax.lax.top_k(neg, k_max)
        return nd, cd.astype(jnp.int32)

    def shared_candidates_tiered(qc):
        def tier(i):
            if i == len(tiers):
                return lambda: shared_cands_width(qc, N)
            return lambda: jax.lax.cond(
                nvalid <= tiers[i],
                lambda: shared_cands_width(qc, tiers[i]),
                tier(i + 1),
            )
        return tier(0)()

    def one_chunk_perscale(args):
        qc, qmc = args
        dist2 = dist2_of(qc)
        scores = jnp.stack([
            jnp.where(
                (dist2 <= hi) & (dist2 >= lo) & xyz_mask[:, None, :], order_score, -1.0
            )
            for lo, hi in r2
        ])  # (S, B, chunk, N)
        if approx:
            top_s, top_i = jax.lax.approx_max_k(scores, k_max, recall_target=0.95)
        else:
            top_s, top_i = jax.lax.top_k(scores, k_max)
        found = top_s > 0
        cnt0 = found[..., 0]
        first = top_i[..., 0:1]
        idx = jnp.where(found, top_i, first)
        empty = (~cnt0) | ~qmc[None]
        idx = jnp.where(empty[..., None], 0, idx)
        return idx.astype(jnp.int32), empty

    def one_chunk_shared(args):
        qc, qmc = args
        nd, cand = shared_candidates_tiered(qc)
        cand_d2 = -nd                       # (B, chunk, k_max)
        cand_ok = nd > -BIG / 2
        idxs, empties = [], []
        for (lo, hi), ks in zip(r2, nsamples):
            in_s = cand_ok & (cand_d2 <= hi) & (cand_d2 >= lo)
            # "first in point order" among candidates: max of -index
            sc = jnp.where(in_s, -cand.astype(jnp.float32), -BIG)
            ss, pos = jax.lax.top_k(sc, int(ks))  # over k_max lanes only
            found = ss > -BIG / 2
            sel = jnp.take_along_axis(cand, pos, axis=-1)
            first = sel[..., 0:1]
            sel = jnp.where(found, sel, first)
            empty = (~found[..., 0]) | ~qmc
            idxs.append(jnp.where(empty[..., None], 0, sel).astype(jnp.int32))
            empties.append(empty)
        # pad each scale's idx to k_max so the map output stacks evenly
        idx = jnp.stack([
            jnp.pad(ix, ((0, 0), (0, 0), (0, k_max - ix.shape[-1])))
            for ix in idxs
        ])
        return idx, jnp.stack(empties)

    if shared_candidates:
        idx, empty = jax.lax.map(one_chunk_shared, (q, qm))
    else:
        idx, empty = jax.lax.map(one_chunk_perscale, (q, qm))
    # (n_chunks, S, B, chunk, ...) -> per scale (B, M, k_s)
    idx = idx.transpose(1, 2, 0, 3, 4).reshape(S, B, M + pad, k_max)[:, :, :M]
    empty = empty.transpose(1, 2, 0, 3).reshape(S, B, M + pad)[:, :, :M]
    return [(idx[s, ..., : int(nsamples[s])], empty[s]) for s in range(S)]


def multi_ball_query_grouped(
    xyz: jax.Array,          # (B, N, 3)
    xyz_mask: jax.Array,     # (B, N)
    new_xyz: jax.Array,      # (B, R*G, 3) queries, R rois x G grid points
    new_mask: jax.Array,     # (B, R*G)
    radii,                   # sequence of float or (inner, outer)
    nsamples,                # sequence of int
    group_centers: jax.Array,  # (B, R, 3) roi centers
    group_size: int,           # G
    cand_k: int = 512,
):
    """Two-stage roi-grouped multi-scale ball query (approximate).

    The dense per-query path scans every point for every roi grid point
    (M x N distance + top-k work independent of where the points are).
    Roi grid points are spatially clustered, so stage 1 selects the
    `cand_k` nearest points PER ROI (one (R, N) distance + top-k — G x
    fewer rows), and stage 2 runs the exact radius / first-in-point-order
    selection among those candidates ((R*G, cand_k) — N/cand_k x narrower
    lanes). A true ball neighbor is dropped only when more than `cand_k`
    points sit nearer the roi center than it — i.e. in neighborhoods so
    dense the ball is over-full anyway — which is the same accepted
    displacement argument as the shared-candidate approx path
    (docs/PARITY_RISKS.md). Annulus (shell) scales keep exact semantics
    in stage 2 (candidates are center-nearest, not ball-nearest, so the
    inner-radius displacement caveat of shared_candidates does not
    apply at the scale level).

    Returns per scale: (idx (B, R*G, k_s) int32 into the FULL point
    table, empty (B, R*G) bool) — same contract as multi_ball_query.
    """
    B, N, _ = xyz.shape
    RG = new_xyz.shape[1]
    G = int(group_size)
    R = RG // G
    assert R * G == RG, (RG, G)
    k_max = max(int(k) for k in nsamples)
    r2 = []
    for r in radii:
        if isinstance(r, (list, tuple)):
            r2.append((float(r[0]) ** 2, float(r[1]) ** 2))
        else:
            r2.append((0.0, float(r) ** 2))
    BIG = jnp.float32(3.0e38)
    cand_k = min(int(cand_k), N)

    # --- stage 1: cand_k nearest points per roi center ------------------
    # tiered static width (same trick as multi_ball_query): the table is
    # capacity-padded; scan only the smallest static prefix covering the
    # last valid index
    iota_n = jnp.arange(N, dtype=jnp.int32)
    nvalid = jnp.max(jnp.where(xyz_mask, iota_n[None, :], -1)) + 1
    tiers = [t for t in (4096, 16384) if cand_k < t < N]

    xyz_sq = jnp.sum(xyz * xyz, axis=-1)
    c_sq = jnp.sum(group_centers * group_centers, axis=-1)

    def cands_width(width):
        x = xyz[:, :width]
        m = xyz_mask[:, :width]
        cross = jnp.einsum("brc,bnc->brn", group_centers, x,
                           preferred_element_type=jnp.float32)
        d2 = c_sq[..., None] + xyz_sq[:, None, :width] - 2.0 * cross
        neg = jnp.where(m[:, None, :], -d2, -BIG)
        _, cd = jax.lax.approx_max_k(neg, cand_k, recall_target=0.95)
        return cd.astype(jnp.int32)

    def tier(i):
        if i == len(tiers):
            return lambda: cands_width(N)
        return lambda: jax.lax.cond(
            nvalid <= tiers[i], lambda: cands_width(tiers[i]), tier(i + 1))

    cand = tier(0)()                       # (B, R, cand_k) original idx
    # gather candidate coords + validity in one FLAT gather (2-D shapes
    # and flat row ids throughout the tail: batched take_along_axis on
    # (B,R,G,k) arrays lowered to pathological TPU gathers — the flat
    # formulation measured 75 -> 45 ms/batch at eval shapes with
    # bit-identical outputs, tools/microbench_grouped.py)
    packed = jnp.concatenate(
        [xyz, xyz_mask[..., None].astype(xyz.dtype)], axis=-1)
    grow = cand + (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
    cg = packed.reshape(B * N, 4)[grow.reshape(-1)].reshape(B * R, cand_k, 4)
    cand_xyz = cg[..., :3]
    cand_ok = cg[..., 3] > 0.5

    # --- stage 2: exact selection among candidates per grid point -------
    qp = new_xyz.reshape(B * R, G, 3)
    d2 = (jnp.sum(qp * qp, -1)[..., None]
          + jnp.sum(cand_xyz * cand_xyz, -1)[:, None, :]
          - 2.0 * jnp.einsum("rgc,rkc->rgk", qp, cand_xyz,
                             preferred_element_type=jnp.float32))
    # (B*R, G, cand_k)
    if all(lo == 0.0 for lo, _ in r2) and k_max < cand_k:
        # shared nearest-k_max among candidates, then per-scale
        # first-in-order (same two-level shape as one_chunk_shared);
        # sound for plain balls only — an annulus scale's neighbors can
        # all be displaced by inner-radius points, so shells fall through
        # to direct per-scale selection over the full candidate width
        r_out_max = max(hi for _, hi in r2)
        in_any = (d2 <= r_out_max) & cand_ok[:, None, :]
        neg = jnp.where(in_any, -d2, -BIG).reshape(B * R * G, cand_k)
        nd, pos = jax.lax.top_k(neg, k_max)            # (B*R*G, k_max)
        sel_d2 = -nd
        sel_ok = nd > -BIG / 2
        crow = jnp.repeat(jnp.arange(B * R, dtype=jnp.int32) * cand_k, G)
        sel_idx = cand.reshape(-1)[(pos + crow[:, None]).reshape(-1)].reshape(
            B * R * G, k_max)
        sel_w = k_max
    else:
        sel_d2 = d2.reshape(B * R * G, cand_k)
        sel_ok = jnp.repeat(cand_ok, G, axis=0).reshape(B * R * G, cand_k)
        sel_idx = jnp.repeat(cand.reshape(B * R, cand_k), G, axis=0)
        sel_w = cand_k

    qm = new_mask.reshape(B * R * G)
    srow = jnp.arange(B * R * G, dtype=jnp.int32) * sel_w
    out = []
    for (lo, hi), ks in zip(r2, nsamples):
        in_s = sel_ok & (sel_d2 <= hi) & (sel_d2 >= lo)
        sc = jnp.where(in_s, -sel_idx.astype(jnp.float32), -BIG)
        ss, p2 = jax.lax.top_k(sc, int(ks))
        found = ss > -BIG / 2
        sel = sel_idx.reshape(-1)[(p2 + srow[:, None]).reshape(-1)].reshape(
            B * R * G, int(ks))
        first = sel[:, 0:1]
        sel = jnp.where(found, sel, first)
        empty = (~found[:, 0]) | ~qm
        sel = jnp.where(empty[:, None], 0, sel)
        out.append((sel.reshape(B, RG, int(ks)).astype(jnp.int32),
                    empty.reshape(B, RG)))
    return out


def multi_ball_query_grouped_cand(
    xyz, xyz_mask, new_xyz, new_mask, radii, nsamples,
    group_centers, group_size, cand_k: int = 512,
):
    """`multi_ball_query_grouped` variant returning CANDIDATE-relative
    positions instead of global indices, for the one-hot-matmul gather
    (`group_from_candidates`). The per-scale selection runs directly
    over the full candidate width with the same first-in-point-order
    score, so the neighbor SETS are identical to the grouped path; no
    per-row index gathers appear anywhere in the tail (the 2.7M-row
    gathers are this tail's dominant cost on TPU, ~10 ns/row).

    Returns ([(cpos (B, R*G, ks) int32 into the roi's candidate table,
    empty (B, R*G))...], cand (B, R, cand_k) global ids,
    cand_xyz (B*R, cand_k, 3) f32, cand_ok (B*R, cand_k))."""
    B, N, _ = xyz.shape
    RG = new_xyz.shape[1]
    G = int(group_size)
    R = RG // G
    r2 = []
    for r in radii:
        if isinstance(r, (list, tuple)):
            r2.append((float(r[0]) ** 2, float(r[1]) ** 2))
        else:
            r2.append((0.0, float(r) ** 2))
    BIG = jnp.float32(3.0e38)
    cand_k = min(int(cand_k), N)

    iota_n = jnp.arange(N, dtype=jnp.int32)
    nvalid = jnp.max(jnp.where(xyz_mask, iota_n[None, :], -1)) + 1
    tiers = [t for t in (4096, 16384) if cand_k < t < N]
    xyz_sq = jnp.sum(xyz * xyz, axis=-1)
    c_sq = jnp.sum(group_centers * group_centers, axis=-1)

    def cands_width(width):
        x = xyz[:, :width]
        m = xyz_mask[:, :width]
        cross = jnp.einsum("brc,bnc->brn", group_centers, x,
                           preferred_element_type=jnp.float32)
        d2 = c_sq[..., None] + xyz_sq[:, None, :width] - 2.0 * cross
        neg = jnp.where(m[:, None, :], -d2, -BIG)
        _, cd = jax.lax.approx_max_k(neg, cand_k, recall_target=0.95)
        return cd.astype(jnp.int32)

    def tier(i):
        if i == len(tiers):
            return lambda: cands_width(N)
        return lambda: jax.lax.cond(
            nvalid <= tiers[i], lambda: cands_width(tiers[i]), tier(i + 1))

    cand = tier(0)()                       # (B, R, cand_k)
    packed = jnp.concatenate(
        [xyz, xyz_mask[..., None].astype(xyz.dtype)], axis=-1)
    grow = cand + (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
    cg = packed.reshape(B * N, 4)[grow.reshape(-1)].reshape(B * R, cand_k, 4)
    cand_xyz = cg[..., :3]
    cand_ok = cg[..., 3] > 0.5

    qp = new_xyz.reshape(B * R, G, 3)
    d2 = (jnp.sum(qp * qp, -1)[..., None]
          + jnp.sum(cand_xyz * cand_xyz, -1)[:, None, :]
          - 2.0 * jnp.einsum("rgc,rkc->rgk", qp, cand_xyz,
                             preferred_element_type=jnp.float32))
    ok_b = cand_ok[:, None, :]
    order = -cand.reshape(B * R, 1, cand_k).astype(jnp.float32)
    qm = new_mask.reshape(B * R, G)
    out = []
    for (lo, hi), ks in zip(r2, nsamples):
        in_s = ok_b & (d2 <= hi) & (d2 >= lo)
        sc = jnp.where(in_s, order, -BIG)
        ss, p2 = jax.lax.top_k(sc, int(ks))       # (B*R, G, ks)
        found = ss > -BIG / 2
        cpos = jnp.where(found, p2, p2[..., 0:1])  # first-found fill
        empty = (~found[..., 0]) | ~qm
        out.append((cpos.reshape(B, RG, int(ks)).astype(jnp.int32),
                    empty.reshape(B, RG)))
    return out, cand, cand_xyz, cand_ok


def split_hi_lo(x):
    """f32 -> (bf16 hi, bf16 lo) with x ~= hi + lo to ~2^-17 relative.
    Lets exact-one-hot bf16 matmuls carry f32-precision coordinates."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def group_from_candidates(
    cand_feat, cpos, empty, new_xyz, use_xyz: bool = True,
    rotate_matrix=None, xy_scale=None, z_scale=None, n_feat: int = 0,
):
    """Grouped gather as a per-roi one-hot batched matmul (replaces the
    2.7M-row `group_from_idx` gathers of the grouped path).

    cand_feat: (BR, ck, 6+C) bf16 [hi_xyz(3), lo_xyz(3), feats(C)]
    cpos: (B, RG, ks) candidate positions; empty: (B, RG).
    Returns (B, RG, ks, 3+C) like `group_from_idx` (offsets rotated /
    scaled identically); xyz reconstructed hi+lo in f32 (~0.5 mm error
    at KITTI ranges, far below the bf16 MLP noise downstream)."""
    B, RG, ks = cpos.shape
    BR, ck, C8 = cand_feat.shape
    G = RG * B // BR
    onehot = (
        cpos.reshape(BR, G * ks, 1)
        == jnp.arange(ck, dtype=jnp.int32)[None, None, :])
    g = jax.lax.dot_general(
        onehot.astype(jnp.bfloat16), cand_feat,
        dimension_numbers=((((2,), (1,)), ((0,), (0,)))),
        preferred_element_type=jnp.float32)        # (BR, G*ks, 6+C)
    g = g.reshape(B, RG, ks, C8)
    grouped_xyz = g[..., 0:3] + g[..., 3:6]
    grouped_feats = g[..., 6:6 + n_feat] if n_feat else None
    offs = grouped_xyz - new_xyz[:, :, None, :]
    offs = jnp.where(empty[..., None, None], 0.0, offs)
    if rotate_matrix is not None:
        offs = jnp.einsum("bmnj,bmij->bmni", offs, rotate_matrix)
    if xy_scale is not None:
        offs = offs.at[..., :2].divide(xy_scale[:, :, None, None])
    if z_scale is not None:
        offs = offs.at[..., 2:3].divide(z_scale[:, :, None, None])
    if grouped_feats is not None:
        grouped_feats = jnp.where(empty[..., None, None], 0.0, grouped_feats)
        return (jnp.concatenate([offs, grouped_feats], axis=-1)
                if use_xyz else grouped_feats)
    assert use_xyz
    return offs


def ball_query_group(
    xyz: jax.Array,          # (B, N, 3)
    xyz_mask: jax.Array,     # (B, N) bool
    new_xyz: jax.Array,      # (B, M, 3)
    new_mask: jax.Array,     # (B, M) bool
    radius,                  # float or (inner, outer) for shell query
    nsample: int,
    features: jax.Array | None = None,  # (B, N, C)
    chunk: int = 512,
):
    """Returns (grouped_xyz (B, M, nsample, 3) -- raw neighbor coords,
    grouped_feats (B, M, nsample, C) or None, idx (B, M, nsample) int32,
    empty_mask (B, M) bool). Empty balls give idx 0 and must be zeroed by
    the caller (QueryAndGroup does)."""
    if isinstance(radius, (list, tuple)):
        r_in2, r_out2 = float(radius[0]) ** 2, float(radius[1]) ** 2
    else:
        r_in2, r_out2 = 0.0, float(radius) ** 2

    B, M, _ = new_xyz.shape
    N = xyz.shape[1]
    pad = (-M) % chunk
    q = jnp.concatenate([new_xyz, jnp.zeros((B, pad, 3), new_xyz.dtype)], axis=1)
    qm = jnp.concatenate([new_mask, jnp.zeros((B, pad), bool)], axis=1)
    n_chunks = q.shape[1] // chunk
    q = q.reshape(B, n_chunks, chunk, 3).transpose(1, 0, 2, 3)
    qm = qm.reshape(B, n_chunks, chunk).transpose(1, 0, 2)

    def one_chunk(args):
        qc, qmc = args  # (B, chunk, 3), (B, chunk)
        d = qc[:, :, None, :] - xyz[:, None, :, :]  # (B, chunk, N, 3)
        dist2 = jnp.sum(d * d, axis=-1)
        score = _query_scores(dist2, xyz_mask[:, None, :], r_in2, r_out2)
        top_score, top_idx = jax.lax.top_k(score, nsample)  # (B, chunk, nsample)
        found = top_score > 0
        cnt = found.sum(-1)
        empty = (cnt == 0) | ~qmc
        # CUDA semantics: slots beyond cnt repeat the first found index
        first = top_idx[..., 0:1]
        idx = jnp.where(found, top_idx, first)
        idx = jnp.where(empty[..., None], 0, idx)
        return idx.astype(jnp.int32), empty

    idx, empty = jax.lax.map(one_chunk, (q, qm))
    idx = idx.transpose(1, 0, 2, 3).reshape(B, M + pad, nsample)[:, :M]
    empty = empty.transpose(1, 0, 2).reshape(B, M + pad)[:, :M]

    # gather: (B, M, nsample, 3)
    grouped_xyz = jax.vmap(lambda pts, ix: pts[ix])(xyz, idx)
    grouped_feats = None
    if features is not None:
        grouped_feats = jax.vmap(lambda f, ix: f[ix])(features, idx)
    return grouped_xyz, grouped_feats, idx, empty


def group_from_idx(
    xyz, new_xyz, idx, empty, features=None, use_xyz: bool = True,
    rotate_matrix=None, xy_scale=None, z_scale=None, packed=None,
):
    """Gather + offset/rotate/scale grouped points given query indices
    (the post-query half of the reference `QueryAndGroup.forward`).

    `packed` optionally supplies a pre-concatenated [xyz, features]
    (B, N, 3+C) table so xyz and features ride one gather (TPU gather
    cost is per row, so separate narrow gathers double the cost)."""
    if packed is not None:
        g = jax.vmap(lambda t, ix: t[ix])(packed, idx)
        grouped_xyz = g[..., :3]
        grouped_feats = g[..., 3:] if features is not None else None
    else:
        grouped_xyz = jax.vmap(lambda pts, ix: pts[ix])(xyz, idx)
        grouped_feats = None
        if features is not None:
            grouped_feats = jax.vmap(lambda f, ix: f[ix])(features, idx)
    offs = grouped_xyz - new_xyz[:, :, None, :]
    offs = jnp.where(empty[..., None, None], 0.0, offs)
    if rotate_matrix is not None:
        offs = jnp.einsum("bmnj,bmij->bmni", offs, rotate_matrix)
    if xy_scale is not None:
        offs = offs.at[..., :2].divide(xy_scale[:, :, None, None])
    if z_scale is not None:
        offs = offs.at[..., 2:3].divide(z_scale[:, :, None, None])
    if features is not None:
        grouped_feats = jnp.where(empty[..., None, None], 0.0, grouped_feats)
        return (
            jnp.concatenate([offs, grouped_feats], axis=-1) if use_xyz else grouped_feats
        )
    assert use_xyz
    return offs


def query_and_group(
    xyz, xyz_mask, new_xyz, new_mask, radius, nsample: int,
    features=None, use_xyz: bool = True,
    rotate_matrix=None,   # (B, M, 3, 3) optional per-query rotation
    xy_scale=None,        # (B, M) optional
    z_scale=None,
    chunk: int = 512,
):
    """Reference `QueryAndGroup.forward`: offsets = neighbors - center,
    empty balls zeroed, optional rotation then xy/z scaling of offsets,
    concat [offsets, features]. Returns (B, M, nsample, 3+C)."""
    grouped_xyz, grouped_feats, idx, empty = ball_query_group(
        xyz, xyz_mask, new_xyz, new_mask, radius, nsample, features, chunk=chunk
    )
    offs = grouped_xyz - new_xyz[:, :, None, :]
    offs = jnp.where(empty[..., None, None], 0.0, offs)
    if rotate_matrix is not None:
        # reference `QueryAndGroup.rotate`: p' = p @ R^T per query
        offs = jnp.einsum("bmnj,bmij->bmni", offs, rotate_matrix)
    if xy_scale is not None:
        offs = offs.at[..., :2].divide(xy_scale[:, :, None, None])
    if z_scale is not None:
        offs = offs.at[..., 2:3].divide(z_scale[:, :, None, None])
    if features is not None:
        grouped_feats = jnp.where(empty[..., None, None], 0.0, grouped_feats)
        out = jnp.concatenate([offs, grouped_feats], axis=-1) if use_xyz else grouped_feats
    else:
        assert use_xyz
        out = offs
    return out, empty


class GroupMLP(nn.Module):
    """Shared 1x1-conv MLP + BN + ReLU over grouped points, masked so
    padded queries don't pollute BN statistics.

    `channels` follows the reference mlp_spec convention
    (`pointnet2_modules.py:32-41`): channels[0] is the INPUT dim (no
    layer is built for it); one Conv/BN/ReLU per consecutive pair."""

    channels: Sequence[int]
    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: str | None = None
    dtype: jnp.dtype | None = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x, mask, train: bool):
        # x: (B, M, nsample, C); mask: (B, M) valid-query mask
        B, M, S, _ = x.shape
        assert x.shape[-1] == self.channels[0], (
            f"GroupMLP input dim {x.shape[-1]} != mlp_spec[0] {self.channels[0]}")
        m = jnp.broadcast_to(mask[:, :, None], (B, M, S)).reshape(-1)
        h = x.reshape(B * M * S, -1)
        for c in self.channels[1:]:
            h = nn.Dense(c, use_bias=False, dtype=self.dtype)(h)
            from . import sparse as _sparse  # local import to avoid cycle
            h = _sparse.MaskedBatchNorm(
                momentum=self.momentum, epsilon=self.epsilon, axis_name=self.axis_name
            )(h, m, use_running_average=not train)
            h = nn.relu(h)
        return h.reshape(B, M, S, -1)


class PointSAModuleMSG(nn.Module):
    """Multi-scale grouping SA module (reference `StackSAModuleMSG`)."""

    radii: Sequence
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    pool_method: str = "max_pool"
    axis_name: str | None = None
    approx_query: bool = False
    # roi-grouped two-stage query (multi_ball_query_grouped): candidates
    # per roi instead of per grid point; only taken on the approx path
    group_cand_k: int = 512
    dtype: jnp.dtype | None = None  # MLP compute dtype (params stay f32)

    @nn.compact
    def __call__(
        self, xyz, xyz_mask, new_xyz, new_mask, features=None, train: bool = False,
        rotate_matrix=None, xy_scale=None, z_scale=None,
        group_centers=None, group_size=None,
    ):
        outs = []
        grouped_per_scale = []
        if (self.approx_query and group_centers is not None
                and group_size is not None):
            # candidate-relative query + one-hot-matmul gather: no
            # 2.7M-row index gathers anywhere in the tail
            scales, cand, cand_xyz, cand_ok = multi_ball_query_grouped_cand(
                xyz, xyz_mask, new_xyz, new_mask, self.radii, self.nsamples,
                group_centers, group_size, cand_k=self.group_cand_k,
            )
            B, N, _ = xyz.shape
            R, ck = cand.shape[1], cand.shape[2]
            hi, lo = split_hi_lo(cand_xyz)
            parts = [hi, lo]
            nf = 0
            if features is not None:
                grow = cand + (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
                cf = features.reshape(B * N, -1)[grow.reshape(-1)].reshape(
                    B * R, ck, -1)
                parts.append(cf.astype(jnp.bfloat16))
                nf = cf.shape[-1]
            cand_feat = jnp.concatenate(parts, axis=-1)
            for cpos, empty in scales:
                grouped_per_scale.append(group_from_candidates(
                    cand_feat, cpos, empty, new_xyz, use_xyz=self.use_xyz,
                    rotate_matrix=rotate_matrix, xy_scale=xy_scale,
                    z_scale=z_scale, n_feat=nf,
                ))
        else:
            queries = multi_ball_query(
                xyz, xyz_mask, new_xyz, new_mask, self.radii, self.nsamples,
                approx=self.approx_query,
            )
            packed = (
                jnp.concatenate([xyz, features], axis=-1)
                if features is not None else None
            )
            for idx, empty in queries:
                grouped_per_scale.append(group_from_idx(
                    xyz, new_xyz, idx, empty, features=features,
                    use_xyz=self.use_xyz, rotate_matrix=rotate_matrix,
                    xy_scale=xy_scale, z_scale=z_scale, packed=packed,
                ))
        for i, (grouped, mlp) in enumerate(zip(grouped_per_scale, self.mlps)):
            h = GroupMLP(mlp, axis_name=self.axis_name, dtype=self.dtype,
                         name=f"mlp_{i}")(grouped, new_mask, train)
            if self.pool_method == "max_pool":
                h = h.max(axis=2)
            else:
                h = h.mean(axis=2)
            outs.append(h)
        out = jnp.concatenate(outs, axis=-1)  # (B, M, sum(Cout))
        return jnp.where(new_mask[..., None], out, 0.0)


def gather_points(features, idx):
    """Row gather (reference `pointnet2_batch` gather_points /
    GatherOperation, channels-last here): features (B, N, C),
    idx (B, M) int -> (B, M, C). Differentiable (gather has a natural
    scatter-add VJP in XLA, matching the CUDA gather_points_grad)."""
    return jax.vmap(lambda f, ix: f[ix])(features, idx)


def grouping_operation(features, idx):
    """Grouped gather (reference `pointnet2_batch` grouping_operation):
    features (B, N, C), idx (B, M, S) -> (B, M, S, C)."""
    return jax.vmap(lambda f, ix: f[ix])(features, idx)


def three_nn(unknown, unknown_mask, known, known_mask):
    """3 nearest neighbors (reference `pointnet2_batch` three_nn).
    unknown: (B, N, 3), known: (B, M, 3) -> dist (B, N, 3), idx (B, N, 3)."""
    d = unknown[:, :, None, :] - known[:, None, :, :]
    dist2 = jnp.sum(d * d, axis=-1)
    dist2 = jnp.where(known_mask[:, None, :], dist2, jnp.inf)
    neg, idx = jax.lax.top_k(-dist2, 3)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx.astype(jnp.int32)


def three_interpolate(features, idx, weight):
    """features: (B, M, C); idx/weight: (B, N, 3) -> (B, N, C)."""
    gathered = jax.vmap(lambda f, ix: f[ix])(features, idx)  # (B, N, 3, C)
    return (gathered * weight[..., None]).sum(axis=2)


def furthest_point_sample(xyz, mask, npoint: int):
    """FPS (reference `pointnet2_batch` furthest_point_sampling).
    xyz: (B, N, 3), mask: (B, N) -> (B, npoint) int32 indices."""
    B, N, _ = xyz.shape

    def one(pts, m):
        dist = jnp.where(m, 1e10, -1.0)  # masked points never chosen

        def body(i, state):
            dist, last, out = state
            d = jnp.sum((pts - pts[last]) ** 2, axis=-1)
            dist = jnp.minimum(dist, jnp.where(m, d, -1.0))
            nxt = jnp.argmax(dist).astype(jnp.int32)
            out = out.at[i].set(nxt)
            return dist, nxt, out

        out0 = jnp.zeros((npoint,), jnp.int32)
        first = jnp.argmax(m).astype(jnp.int32)
        out0 = out0.at[0].set(first)
        _, _, out = jax.lax.fori_loop(1, npoint, body, (dist, first, out0))
        return out

    return jax.vmap(one)(xyz, mask)
