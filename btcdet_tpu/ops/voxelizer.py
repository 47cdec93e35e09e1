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


def voxelize_np(points, point_cloud_range, voxel_size, max_points, max_voxels):
    """numpy twin for the CPU input pipeline. Same drop semantics as the
    jit version (key-sorted voxel selection, point-order within voxels).

    Returns (voxels, coords_zyx, num_points) with static shapes.
    """
    points = np.asarray(points)
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
