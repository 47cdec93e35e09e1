"""Static-shape points -> voxels (TPU-native replacement for
`spconv.utils.VoxelGenerator`, used by the reference at
`btcdet/datasets/processor/data_processor.py:64-73`).

The reference's VoxelGenerator is a C++ hash-table voxelizer with
max_points/max_voxels caps. On TPU we want the same *static output
shapes*, which the caps already give us; the hashing becomes a
sort-by-voxel-key + segment arithmetic, which is jit-able and runs on
device. A numpy twin serves the CPU input pipeline.

Semantics:
  - voxel coords returned in (z, y, x) order like spconv
  - per-voxel points kept in point order up to max_points (stable sort)
  - voxels beyond max_voxels dropped (by key order, not first-seen order;
    the reference drops by first-seen order -- irrelevant after the
    pipeline's shuffle_points step)
  - output voxel rows are sorted by linear key (b, z, y, x) -- the sparse
    conv engine relies on this invariant
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

INT32_MAX = np.int32(2**31 - 1)


class VoxelizationResult(NamedTuple):
    voxels: jax.Array      # (max_voxels, max_points, C) padded with 0
    coords: jax.Array      # (max_voxels, 3) int32 (z, y, x), padding = -1
    num_points: jax.Array  # (max_voxels,) int32
    num_voxels: jax.Array  # () int32  number of valid voxel rows
    point_voxel_id: jax.Array  # (N,) int32 voxel row per point, -1 if dropped


def compute_grid_size(point_cloud_range, voxel_size) -> tuple[int, int, int]:
    pr = np.asarray(point_cloud_range, dtype=np.float64)
    vs = np.asarray(voxel_size, dtype=np.float64)
    grid = np.round((pr[3:6] - pr[0:3]) / vs).astype(np.int64)
    return int(grid[0]), int(grid[1]), int(grid[2])  # (nx, ny, nz)


@functools.partial(
    jax.jit,
    static_argnames=("point_cloud_range", "voxel_size", "max_points", "max_voxels"),
)
def voxelize(
    points: jax.Array,
    points_valid: jax.Array,
    *,
    point_cloud_range: tuple,
    voxel_size: tuple,
    max_points: int,
    max_voxels: int,
) -> VoxelizationResult:
    """points: (N, C) with xyz in the leading 3 channels; points_valid: (N,).

    Returns static-shape voxel arrays; see VoxelizationResult.
    """
    nx, ny, nz = compute_grid_size(point_cloud_range, voxel_size)
    N = points.shape[0]
    lo = jnp.asarray(point_cloud_range[:3], dtype=points.dtype)
    vs = jnp.asarray(voxel_size, dtype=points.dtype)

    cf = (points[:, :3] - lo) / vs
    cxyz = jnp.floor(cf).astype(jnp.int32)
    in_range = (
        (cxyz[:, 0] >= 0) & (cxyz[:, 0] < nx)
        & (cxyz[:, 1] >= 0) & (cxyz[:, 1] < ny)
        & (cxyz[:, 2] >= 0) & (cxyz[:, 2] < nz)
    )
    valid = points_valid.astype(bool) & in_range

    # linear key in (z, y, x) order; invalid points get INT32_MAX
    key = (cxyz[:, 2] * ny + cxyz[:, 1]) * nx + cxyz[:, 0]
    key = jnp.where(valid, key, INT32_MAX)

    # stable sort by key keeps point order within a voxel
    order = jnp.argsort(key, stable=True)
    skey = key[order]
    spoints = points[order]

    first = jnp.concatenate([jnp.array([True]), skey[1:] != skey[:-1]])
    first = first & (skey != INT32_MAX)
    vrank = jnp.cumsum(first.astype(jnp.int32)) - 1  # voxel row per sorted point
    n_unique = jnp.where(jnp.any(first), vrank[-1] + 1, 0)

    # slot of each point inside its voxel: position - segment start
    pos = jnp.arange(N, dtype=jnp.int32)
    seg_start = jnp.where(first, pos, 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
    slot = pos - seg_start

    keep = (skey != INT32_MAX) & (slot < max_points) & (vrank < max_voxels)
    scat_v = jnp.where(keep, vrank, max_voxels)  # overflow row dropped below
    scat_s = jnp.where(keep, slot, 0)

    voxels = jnp.zeros((max_voxels + 1, max_points, points.shape[1]), dtype=points.dtype)
    voxels = voxels.at[scat_v, scat_s].set(jnp.where(keep[:, None], spoints, 0.0))
    voxels = voxels[:max_voxels]

    num_points = jnp.zeros((max_voxels + 1,), dtype=jnp.int32)
    num_points = num_points.at[scat_v].add(keep.astype(jnp.int32))
    num_points = num_points[:max_voxels]

    # coords per voxel row (z, y, x); padding rows = -1
    ukey = jnp.full((max_voxels + 1,), INT32_MAX, dtype=jnp.int32)
    ukey = ukey.at[jnp.where(first & (vrank < max_voxels), vrank, max_voxels)].set(
        jnp.where(first, skey, INT32_MAX)
    )
    ukey = ukey[:max_voxels]
    zc = ukey // (ny * nx)
    yc = (ukey - zc * (ny * nx)) // nx
    xc = ukey - zc * (ny * nx) - yc * nx
    pad = ukey == INT32_MAX
    coords = jnp.stack(
        [jnp.where(pad, -1, zc), jnp.where(pad, -1, yc), jnp.where(pad, -1, xc)], axis=-1
    ).astype(jnp.int32)

    # map back: per original point, its voxel row (or -1)
    pv_sorted = jnp.where(keep, vrank, -1)
    point_voxel_id = jnp.zeros((N,), dtype=jnp.int32).at[order].set(pv_sorted)

    return VoxelizationResult(
        voxels=voxels,
        coords=coords,
        num_points=num_points,
        num_voxels=jnp.minimum(n_unique, max_voxels).astype(jnp.int32),
        point_voxel_id=point_voxel_id,
    )


def merge_points_into_voxels(
    dvox: jax.Array, dcoords: jax.Array, dnum: jax.Array,
    opts: jax.Array, ovalid: jax.Array,
    *, grid_size: tuple, lo: jax.Array, vs: jax.Array,
    extra: int, max_points: int,
):
    """Incrementally merge loose points into an existing key-sorted voxel
    table (one frame).

    Instead of re-voxelizing the union of all voxel points + new points
    (the reference's `combine_gt_occ_voxel_point` semantics, which costs
    a sort over every point slot), this bins only the K new points (one
    K-sort), binary-searches their cells in the existing key table,
    appends hits into free slots of their voxels, and gives miss cells a
    fresh `extra`-capacity block.

    dvox: (Nd, max_points, C) existing voxels (slots beyond dnum zero);
    dcoords: (Nd, 4) (b, z, y, x), -1 pad, key-sorted; dnum: (Nd,);
    opts: (K, C) new points (xyz leading); ovalid: (K,).
    Returns (vox (Nd+extra, max_points, C), num, coords_zyx, row_valid);
    the det block and extra block are each key-sorted, but the
    concatenation is not -- downstream must re-sort (from_coords does).
    """
    nxd, nyd, nzd = grid_size
    Nd, Pd_m, C6 = dvox.shape
    dz, dy, dx = dcoords[:, 1], dcoords[:, 2], dcoords[:, 3]
    dvalid = dcoords[:, 0] >= 0
    dkey = jnp.where(
        dvalid, (dz * nyd + dy) * nxd + dx, INT32_MAX
    ).astype(jnp.int32)

    c = jnp.floor((opts[:, :3] - lo) / vs).astype(jnp.int32)
    # reference `trans_voxel_grid` (add_occ_template.py:78-88) CLAMPS
    # out-of-range occ points into edge voxels rather than dropping them
    # (the occ cylinder range's cartesian footprint exceeds the det box,
    # so edge points are routine); golden-pinned by test_golden_full
    c = jnp.clip(c, 0, jnp.asarray([nxd - 1, nyd - 1, nzd - 1], jnp.int32))
    ok = ovalid
    okey = jnp.where(
        ok, (c[:, 2] * nyd + c[:, 1]) * nxd + c[:, 0], INT32_MAX
    ).astype(jnp.int32)
    order = jnp.argsort(okey, stable=True)
    sk = okey[order]
    sp = opts[order]
    Kp = sk.shape[0]
    first = jnp.concatenate([jnp.array([True]), sk[1:] != sk[:-1]])
    live = sk != INT32_MAX
    first = first & live
    pos = jnp.arange(Kp, dtype=jnp.int32)
    seg_start = jax.lax.associative_scan(jnp.maximum, jnp.where(first, pos, 0))
    slot = pos - seg_start

    ridx = jnp.clip(
        jnp.searchsorted(dkey, sk, method="sort").astype(jnp.int32), 0, Nd - 1
    )
    hit = (dkey[ridx] == sk) & live

    # hits: append into existing voxels at slot dnum + within-cell rank
    dest_slot = dnum[ridx] + slot
    keep_h = hit & (dest_slot < Pd_m)
    rr = jnp.where(keep_h, ridx, Nd)
    ss = jnp.where(keep_h, dest_slot, 0)
    dvox_p = jnp.concatenate([dvox, jnp.zeros((1, Pd_m, C6), dvox.dtype)], axis=0)
    dvox_p = dvox_p.at[rr, ss].set(jnp.where(keep_h[:, None], sp, 0.0))
    merged_vox = dvox_p[:Nd]
    merged_num = jnp.concatenate([dnum, jnp.zeros((1,), dnum.dtype)])
    merged_num = merged_num.at[rr].add(keep_h.astype(dnum.dtype))[:Nd]

    # misses: fresh voxel rows in the extra block
    miss_head = first & ~hit
    nrank = jnp.cumsum(miss_head.astype(jnp.int32)) - 1
    keep_m = ~hit & live & (nrank >= 0) & (nrank < extra) & (slot < Pd_m)
    er = jnp.where(keep_m, nrank, extra)
    es = jnp.where(keep_m, slot, 0)
    evox = jnp.zeros((extra + 1, Pd_m, C6), dvox.dtype)
    evox = evox.at[er, es].set(jnp.where(keep_m[:, None], sp, 0.0))[:extra]
    enum = jnp.zeros((extra + 1,), dnum.dtype).at[er].add(
        keep_m.astype(dnum.dtype))[:extra]
    ekey = jnp.full((extra + 1,), INT32_MAX)
    ekey = ekey.at[jnp.where(miss_head & (nrank < extra), nrank, extra)].min(
        jnp.where(miss_head, sk, INT32_MAX))[:extra]
    epad = ekey == INT32_MAX
    ez = ekey // (nyd * nxd)
    ey = (ekey - ez * (nyd * nxd)) // nxd
    ex = ekey - ez * (nyd * nxd) - ey * nxd
    ecoords = jnp.stack([
        jnp.where(epad, -1, ez), jnp.where(epad, -1, ey),
        jnp.where(epad, -1, ex),
    ], axis=-1).astype(jnp.int32)

    vox = jnp.concatenate([merged_vox, evox], axis=0)
    num = jnp.concatenate([merged_num, enum], axis=0)
    coords_zyx = jnp.concatenate([dcoords[:, 1:4], ecoords], axis=0)
    row_valid = jnp.concatenate([dvalid, ~epad], axis=0)
    return vox, num, coords_zyx, row_valid


def merge_points_into_voxels_v2(
    dvox: jax.Array, dcoords: jax.Array, dnum: jax.Array,
    opts: jax.Array, ovalid: jax.Array,
    *, grid_size: tuple, lo: jax.Array, vs: jax.Array,
    extra: int, max_points: int,
):
    """Single-sort variant of `merge_points_into_voxels` (identical
    contract and bitwise-identical outputs -- tests/test_voxelizer.py).

    v1 pays TWO sorts per frame: argsort(K) to group the new points by
    cell, plus searchsorted(method='sort') which internally sorts the
    Nd+K concatenation. Here ONE stable argsort of the concatenated
    [det keys | occ keys] array does both jobs: on equal keys the det
    row sorts first (stable, det indices precede occ), so hit detection,
    the hit row id, within-cell occ ranks and miss-cell ranks all fall
    out of cheap segmented scans over the sorted array. Select with
    OCC_PNT_UPDATE.MERGE_IMPL: v2 after benchmarking.
    """
    nxd, nyd, nzd = grid_size
    Nd, Pd_m, C6 = dvox.shape
    dz, dy, dx = dcoords[:, 1], dcoords[:, 2], dcoords[:, 3]
    dvalid = dcoords[:, 0] >= 0
    dkey = jnp.where(
        dvalid, (dz * nyd + dy) * nxd + dx, INT32_MAX
    ).astype(jnp.int32)

    c = jnp.floor((opts[:, :3] - lo) / vs).astype(jnp.int32)
    # reference `trans_voxel_grid` (add_occ_template.py:78-88) CLAMPS
    # out-of-range occ points into edge voxels rather than dropping them
    # (the occ cylinder range's cartesian footprint exceeds the det box,
    # so edge points are routine); golden-pinned by test_golden_full
    c = jnp.clip(c, 0, jnp.asarray([nxd - 1, nyd - 1, nzd - 1], jnp.int32))
    ok = ovalid
    okey = jnp.where(
        ok, (c[:, 2] * nyd + c[:, 1]) * nxd + c[:, 0], INT32_MAX
    ).astype(jnp.int32)

    K = okey.shape[0]
    M = Nd + K
    allk = jnp.concatenate([dkey, okey])
    order = jnp.argsort(allk, stable=True)
    sk = allk[order]
    is_det = order < Nd
    pos = jnp.arange(M, dtype=jnp.int32)

    first = jnp.concatenate([jnp.array([True]), sk[1:] != sk[:-1]])
    seg_start = jax.lax.associative_scan(jnp.maximum, jnp.where(first, pos, 0))
    last_det = jax.lax.associative_scan(jnp.maximum, jnp.where(is_det, pos, -1))
    has_det = last_det >= seg_start           # this key exists in the det table
    live = (sk != INT32_MAX) & ~is_det        # real occ points

    # within-cell occ rank: in-segment rank minus det elements seen
    cdet = jnp.cumsum(is_det.astype(jnp.int32))
    cdet_base = cdet[seg_start] - is_det[seg_start].astype(jnp.int32)
    slot = (pos - seg_start) - (cdet - cdet_base)

    det_row_at = jnp.where(is_det, order, 0).astype(jnp.int32)
    ridx = det_row_at[jnp.clip(last_det, 0, M - 1)]
    hit = has_det & live
    sp = opts[jnp.clip(order - Nd, 0, K - 1)]  # payload at occ positions

    # hits: append into existing voxels at slot dnum + within-cell rank
    dest_slot = dnum[jnp.clip(ridx, 0, Nd - 1)] + slot
    keep_h = hit & (dest_slot < Pd_m)
    rr = jnp.where(keep_h, ridx, Nd)
    ss = jnp.where(keep_h, dest_slot, 0)
    dvox_p = jnp.concatenate([dvox, jnp.zeros((1, Pd_m, C6), dvox.dtype)], axis=0)
    dvox_p = dvox_p.at[rr, ss].set(jnp.where(keep_h[:, None], sp, 0.0))
    merged_vox = dvox_p[:Nd]
    merged_num = jnp.concatenate([dnum, jnp.zeros((1,), dnum.dtype)])
    merged_num = merged_num.at[rr].add(keep_h.astype(dnum.dtype))[:Nd]

    # misses: fresh voxel rows in the extra block, in key order
    miss_head = live & ~hit & (slot == 0)
    nrank = jnp.cumsum(miss_head.astype(jnp.int32)) - 1
    keep_m = ~hit & live & (nrank >= 0) & (nrank < extra) & (slot < Pd_m)
    er = jnp.where(keep_m, nrank, extra)
    es = jnp.where(keep_m, slot, 0)
    evox = jnp.zeros((extra + 1, Pd_m, C6), dvox.dtype)
    evox = evox.at[er, es].set(jnp.where(keep_m[:, None], sp, 0.0))[:extra]
    enum = jnp.zeros((extra + 1,), dnum.dtype).at[er].add(
        keep_m.astype(dnum.dtype))[:extra]
    ekey = jnp.full((extra + 1,), INT32_MAX)
    ekey = ekey.at[jnp.where(miss_head & (nrank < extra), nrank, extra)].min(
        jnp.where(miss_head, sk, INT32_MAX))[:extra]
    epad = ekey == INT32_MAX
    ez = ekey // (nyd * nxd)
    ey = (ekey - ez * (nyd * nxd)) // nxd
    ex = ekey - ez * (nyd * nxd) - ey * nxd
    ecoords = jnp.stack([
        jnp.where(epad, -1, ez), jnp.where(epad, -1, ey),
        jnp.where(epad, -1, ex),
    ], axis=-1).astype(jnp.int32)

    vox = jnp.concatenate([merged_vox, evox], axis=0)
    num = jnp.concatenate([merged_num, enum], axis=0)
    coords_zyx = jnp.concatenate([dcoords[:, 1:4], ecoords], axis=0)
    row_valid = jnp.concatenate([dvalid, ~epad], axis=0)
    return vox, num, coords_zyx, row_valid


def merge_points_into_voxel_features(
    dvox: jax.Array, dcoords: jax.Array, dnum: jax.Array,
    opts: jax.Array, ovalid: jax.Array,
    *, grid_size: tuple, lo: jax.Array, vs: jax.Array,
    extra: int, max_points: int, num_raw_features: int,
):
    """Fused merge + OccVFE: same point-selection semantics as
    `merge_points_into_voxels_v2` followed by `vfe.OccVFE`, but the
    merged (Nd+extra, max_points, C6) point table is never materialized
    -- per-voxel sums/counts/maxes are accumulated directly with
    scatter ops. This removes the merge path's HBM bottleneck (padding
    det point slots Pd -> max_points and scattering whole point rows,
    ~3 MB/frame x several passes) since the only downstream consumer of
    the merged table is the reduction itself
    (`models/detectors/btcnet.py:274`, reference `occ_vfe.py`).

    dvox: (Nd, Pd, Cd) existing det voxels (slots beyond dnum zero,
    trailing C6-Cd channels implicitly zero => every det point is a
    "raw" point under OccVFE's last-channel < 0.05 test); dcoords:
    (Nd, 4) (b, z, y, x) key-sorted, -1 pad; dnum: (Nd,); opts: (K, C6)
    new points (xyz leading, occ-code tail); ovalid: (K,).

    Returns (features (Nd+extra, num_raw_features + ncode),
    occ_code (Nd+extra, ncode), num, coords_zyx, row_valid). Voxel
    membership, slot capping and coords are bitwise those of v2; the
    features match OccVFE on the materialized table up to f32
    reassociation of the per-voxel sums.
    """
    nxd, nyd, nzd = grid_size
    Nd, Pd, Cd = dvox.shape
    nrf = num_raw_features
    C6 = opts.shape[-1]
    ncode = C6 - nrf
    assert Cd <= nrf + ncode and ncode >= 1
    Pd_m = max_points
    dz, dy, dx = dcoords[:, 1], dcoords[:, 2], dcoords[:, 3]
    dvalid = dcoords[:, 0] >= 0
    dkey = jnp.where(
        dvalid, (dz * nyd + dy) * nxd + dx, INT32_MAX
    ).astype(jnp.int32)

    c = jnp.floor((opts[:, :3] - lo) / vs).astype(jnp.int32)
    # reference `trans_voxel_grid` (add_occ_template.py:78-88) CLAMPS
    # out-of-range occ points into edge voxels rather than dropping them
    # (the occ cylinder range's cartesian footprint exceeds the det box,
    # so edge points are routine); golden-pinned by test_golden_full
    c = jnp.clip(c, 0, jnp.asarray([nxd - 1, nyd - 1, nzd - 1], jnp.int32))
    ok = ovalid
    okey = jnp.where(
        ok, (c[:, 2] * nyd + c[:, 1]) * nxd + c[:, 0], INT32_MAX
    ).astype(jnp.int32)

    K = okey.shape[0]

    # ---- gather-formulated reduction over the occ-only sorted array --
    # TPU scatters serialize on index collisions (many occ points share a
    # voxel), so instead of scatter-adds into output rows: sort only the
    # K new points by key, detect hits by binary search into the ALREADY
    # key-sorted det table, reduce with ONE fused segmented scan (sums
    # reset at each new key; per-voxel f32 error stays at segment scale,
    # unlike global cumsum differences whose ulp is set by the ~1e6
    # prefix magnitude), and gather each output row's value at its
    # segment END. All searchsorted calls use method='sort' (one bitonic
    # pass; the default per-query binary-search gather chains are ~3x
    # slower on TPU).
    order = jnp.argsort(okey, stable=True)
    sk = okey[order]
    sp = opts[order]
    pos = jnp.arange(K, dtype=jnp.int32)

    first = jnp.concatenate([jnp.array([True]), sk[1:] != sk[:-1]])
    seg_start = jax.lax.associative_scan(jnp.maximum, jnp.where(first, pos, 0))
    slot = pos - seg_start  # within-cell rank, in point order
    live = sk != INT32_MAX

    il = jnp.clip(
        jnp.searchsorted(dkey, sk, method="sort"), 0, Nd - 1).astype(jnp.int32)
    hit = (dkey[il] == sk) & live
    ridx = il

    dest_slot = dnum[ridx] + slot
    keep_h = hit & (dest_slot < Pd_m)
    miss_head = live & ~hit & first
    nrank = jnp.cumsum(miss_head.astype(jnp.int32)) - 1
    keep_m = ~hit & live & (nrank >= 0) & (nrank < extra) & (slot < Pd_m)
    kept = keep_h | keep_m

    # OccVFE class split by the point's own last channel (occ_vfe.py)
    is_occ_pt = sp[:, -1] >= 0.05
    w_raw = (kept & ~is_occ_pt).astype(sp.dtype)
    w_occ = (kept & is_occ_pt).astype(sp.dtype)
    head = sp[:, :nrf]
    tail = sp[:, nrf:]
    NEG = jnp.asarray(-3.0e38, sp.dtype)

    # fused scan channels: [sum: head*w_raw | head*w_occ | w_raw | w_occ]
    # + [max: tail]; counts ride as f32 (exact up to 2^24 >> K)
    nsum = 2 * nrf + 2
    scan_in = jnp.concatenate([
        head * w_raw[:, None], head * w_occ[:, None],
        w_raw[:, None], w_occ[:, None],
        jnp.where(kept[:, None], tail, NEG),
    ], axis=1)

    def seg_op(a, b):
        av, af = a
        bv, bf = b
        keep_b = bf[:, None]
        s = bv[:, :nsum] + jnp.where(keep_b, 0.0, av[:, :nsum])
        m = jnp.where(keep_b, bv[:, nsum:],
                      jnp.maximum(av[:, nsum:], bv[:, nsum:]))
        return jnp.concatenate([s, m], axis=1), af | bf

    g, _ = jax.lax.associative_scan(seg_op, (scan_in, first), axis=0)

    # per-position segment end: (next segment head) - 1, reverse min-scan
    nxt = jax.lax.associative_scan(
        jnp.minimum, jnp.where(first, pos, K), reverse=True)
    seg_end_at = jnp.concatenate(
        [nxt[1:], jnp.array([K], nxt.dtype)]) - 1  # (K,)

    # miss-cell keys: nrank is nondecreasing along the sorted array, so
    # the i-th miss segment head sits at searchsorted(cumsum(miss), i+1)
    cms = jnp.cumsum(miss_head.astype(jnp.int32))
    head_pos = jnp.clip(
        jnp.searchsorted(cms, jnp.arange(1, extra + 1, dtype=jnp.int32),
                         method="sort"), 0, K - 1).astype(jnp.int32)
    ekey = jnp.where(jnp.arange(extra) < cms[-1], sk[head_pos], INT32_MAX)
    epad = ekey == INT32_MAX

    # det row r's occ segment (if any) starts where its key inserts
    dl = jnp.clip(
        jnp.searchsorted(sk, dkey, method="sort"), 0, K - 1).astype(jnp.int32)
    dhas = (sk[dl] == dkey) & dvalid

    rend = seg_end_at[jnp.concatenate([dl, head_pos])]
    rzero = jnp.concatenate([~dhas, epad])  # rows with no occ contributions
    rvals = g[jnp.clip(rend, 0, K - 1)]
    sum_raw = jnp.where(rzero[:, None], 0.0, rvals[:, :nrf])
    sum_occ = jnp.where(rzero[:, None], 0.0, rvals[:, nrf:2 * nrf])
    cnt_raw = jnp.where(rzero, 0, rvals[:, 2 * nrf].astype(jnp.int32))
    cnt_occ = jnp.where(rzero, 0, rvals[:, 2 * nrf + 1].astype(jnp.int32))
    tail_max = jnp.where(rzero[:, None], NEG, rvals[:, nsum:])

    # det-side contribution: all det points are raw, tails are zero
    dmask = (jnp.arange(Pd, dtype=jnp.int32)[None, :] < dnum[:, None]) & dvalid[:, None]
    det_sum = jnp.where(dmask[..., None], dvox[..., :nrf], 0.0).sum(axis=1)
    det_cnt = jnp.where(dvalid, dnum, 0).astype(jnp.int32)
    det_pad = jnp.zeros((extra, nrf), det_sum.dtype)
    sum_raw = sum_raw + jnp.concatenate([det_sum, det_pad])
    raw_n = cnt_raw + jnp.concatenate([det_cnt, jnp.zeros((extra,), jnp.int32)])
    # voxels with >=1 det point see that point's zero tail in the max
    has_det_pt = jnp.concatenate([det_cnt > 0, jnp.zeros((extra,), bool)])
    tail_max = jnp.where(has_det_pt[:, None], jnp.maximum(tail_max, 0.0), tail_max)
    occ_code = jnp.where(tail_max <= NEG / 2, 0.0, tail_max)

    f = sum_raw.dtype
    f_raw = sum_raw / jnp.clip(raw_n[:, None].astype(f), 1.0, None)
    f_occ = sum_occ / jnp.clip(cnt_occ[:, None].astype(f), 1.0, None)
    occ_only = (cnt_occ > 0) & (raw_n < 1)
    feat_head = f_raw + occ_only[:, None].astype(f) * f_occ
    features = jnp.concatenate([feat_head, occ_code], axis=-1)

    num = raw_n + cnt_occ
    ez = ekey // (nyd * nxd)
    ey = (ekey - ez * (nyd * nxd)) // nxd
    ex = ekey - ez * (nyd * nxd) - ey * nxd
    ecoords = jnp.stack([
        jnp.where(epad, -1, ez), jnp.where(epad, -1, ey),
        jnp.where(epad, -1, ex),
    ], axis=-1).astype(jnp.int32)

    coords_zyx = jnp.concatenate([dcoords[:, 1:4], ecoords], axis=0)
    row_valid = jnp.concatenate([dvalid, ~epad], axis=0)
    return features, occ_code, num, coords_zyx, row_valid


_NATIVE_LIB = None
_NATIVE_TRIED = False


def _native_voxelizer():
    """Compile-on-demand C++ voxelizer (ctypes), the TPU-native
    equivalent of the reference's spconv.utils.VoxelGenerator C++ op
    (`data_processor.py:64-73`). Falls back to numpy when g++ is
    unavailable."""
    global _NATIVE_LIB, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE_LIB
    _NATIVE_TRIED = True
    try:
        import ctypes
        import subprocess
        from pathlib import Path

        src = (Path(__file__).resolve().parent.parent / "datasets" / "native"
               / "voxelizer_core.cpp")
        so = src.with_suffix(".so")
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", str(src), "-o", str(so)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(so))
        lib.voxelize.restype = ctypes.c_int
        lib.voxelize.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        _NATIVE_LIB = lib
    except Exception:
        _NATIVE_LIB = None
    return _NATIVE_LIB


def voxelize_np(points, point_cloud_range, voxel_size, max_points, max_voxels):
    """CPU input-pipeline voxelizer. Same drop semantics as the jit
    version (key-sorted voxel selection, point-order within voxels).
    Runs the C++ core when available (~10x the numpy path on KITTI-size
    clouds); the numpy body below is the verified fallback twin.

    Returns (voxels, coords_zyx, num_points) with static shapes.
    """
    points = np.asarray(points)
    nx, ny, nz = compute_grid_size(point_cloud_range, voxel_size)
    lib = _native_voxelizer()
    if (lib is not None and points.dtype == np.float32 and points.ndim == 2
            and points.shape[0] < (1 << 24)      # packed-sort index bits
            and nx * ny * nz < (1 << 39)):
        import ctypes

        pts = np.ascontiguousarray(points)
        pcr = np.asarray(point_cloud_range, np.float32)
        vs = np.asarray(voxel_size, np.float32)
        C = pts.shape[1]
        voxels = np.empty((max_voxels, max_points, C), np.float32)
        coords = np.empty((max_voxels, 3), np.int32)
        num = np.zeros((max_voxels,), np.int32)
        fp = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(ctypes.c_int)
        lib.voxelize(
            pts.ctypes.data_as(fp), pts.shape[0], C,
            pcr.ctypes.data_as(fp), vs.ctypes.data_as(fp),
            max_points, max_voxels,
            voxels.ctypes.data_as(fp), coords.ctypes.data_as(ip),
            num.ctypes.data_as(ip),
        )
        return voxels, coords, num
    nx, ny, nz = compute_grid_size(point_cloud_range, voxel_size)
    lo = np.asarray(point_cloud_range[:3], dtype=points.dtype)
    vs = np.asarray(voxel_size, dtype=points.dtype)
    cxyz = np.floor((points[:, :3] - lo) / vs).astype(np.int64)
    in_range = (
        (cxyz[:, 0] >= 0) & (cxyz[:, 0] < nx)
        & (cxyz[:, 1] >= 0) & (cxyz[:, 1] < ny)
        & (cxyz[:, 2] >= 0) & (cxyz[:, 2] < nz)
    )
    pts = points[in_range]
    cxyz = cxyz[in_range]
    key = (cxyz[:, 2] * ny + cxyz[:, 1]) * nx + cxyz[:, 0]
    order = np.argsort(key, kind="stable")
    skey, spts = key[order], pts[order]
    ukeys, inv, counts = np.unique(skey, return_inverse=True, return_counts=True)
    n_vox = min(len(ukeys), max_voxels)

    voxels = np.zeros((max_voxels, max_points, points.shape[1]), dtype=points.dtype)
    coords = np.full((max_voxels, 3), -1, dtype=np.int32)
    num_points = np.zeros((max_voxels,), dtype=np.int32)

    seg_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot = np.arange(len(skey)) - seg_start[inv]
    keep = (inv < max_voxels) & (slot < max_points)
    voxels[inv[keep], slot[keep]] = spts[keep]
    np.add.at(num_points, inv[keep], 1)
    uk = ukeys[:n_vox]
    coords[:n_vox, 0] = uk // (ny * nx)
    coords[:n_vox, 1] = (uk % (ny * nx)) // nx
    coords[:n_vox, 2] = uk % nx
    return voxels, coords, num_points
