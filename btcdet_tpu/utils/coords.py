"""Cartesian <-> cylinder/sphere coordinate transforms.

Semantics match the reference (`btcdet/utils/coords_utils.py:196-292`):

  cylinder coords = (xydist, azimuth_deg, z)
  sphere coords   = (dist, azimuth_deg, elevation_deg)
  azimuth_deg     = atan2(-y, x) * 180 / pi      (degrees, +x axis = 0,
                                                  clockwise-positive)
  elevation_deg   = atan2(z, xydist) * 180 / pi

All functions have a jnp implementation (works on device inside jit) and
operate on trailing-dim-3(+) point arrays; numpy arrays also work since
only ufuncs are used.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _xp(arr):
    return jnp if isinstance(arr, jnp.ndarray) else np


def absxyz_to_cylinder(points):
    """(..., 3+C) cartesian -> (..., 3+C) cylinder (xydist, azi_deg, z)."""
    xp = _xp(points)
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    xydist = xp.sqrt(x * x + y * y)
    azi = xp.arctan2(-y, x) * (180.0 / np.pi)
    out = xp.stack([xydist, azi, z], axis=-1)
    if points.shape[-1] > 3:
        out = xp.concatenate([out, points[..., 3:]], axis=-1)
    return out


def absxyz_to_sphere(points):
    """(..., 3+C) cartesian -> (..., 3+C) sphere (dist, azi_deg, elev_deg)."""
    xp = _xp(points)
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    xydist = xp.sqrt(x * x + y * y)
    dist = xp.sqrt(x * x + y * y + z * z)
    azi = xp.arctan2(-y, x) * (180.0 / np.pi)
    elev = xp.arctan2(z, xydist) * (180.0 / np.pi)
    out = xp.stack([dist, azi, elev], axis=-1)
    if points.shape[-1] > 3:
        out = xp.concatenate([out, points[..., 3:]], axis=-1)
    return out


def cylinder_to_absxyz(cyl_x, cyl_y, cyl_z, axis=-1):
    """cylinder (xydist, azi_deg, z) -> cartesian xyz
    (reference `cylinder_uvd2absxyz`)."""
    xp = _xp(cyl_x)
    rad = cyl_y * (np.pi / 180.0)
    x = cyl_x * xp.cos(rad)
    y = -cyl_x * xp.sin(rad)
    return xp.stack([x, y, cyl_z], axis=axis)


def sphere_to_absxyz(sph_x, sph_y, sph_z, axis=-1):
    """sphere (dist, azi_deg, elev_deg) -> cartesian xyz."""
    xp = _xp(sph_x)
    azi = sph_y * (np.pi / 180.0)
    elev = sph_z * (np.pi / 180.0)
    xydist = sph_x * xp.cos(elev)
    x = xydist * xp.cos(azi)
    y = -xydist * xp.sin(azi)
    z = sph_x * xp.sin(elev)
    return xp.stack([x, y, z], axis=axis)


def cartesian_to_occ(points, coord_type: str):
    if coord_type == "sphere":
        return absxyz_to_sphere(points)
    if coord_type == "cylinder":
        return absxyz_to_cylinder(points)
    if coord_type == "cartesian":
        return points
    raise ValueError(coord_type)


def occ_uvd_to_absxyz(u, v, d, coord_type: str, axis=-1):
    """Per-voxel occ-grid coordinates back to cartesian
    (reference `uvd2absxyz`)."""
    xp = _xp(u)
    if coord_type == "sphere":
        return sphere_to_absxyz(u, v, d, axis=axis)
    if coord_type == "cylinder":
        return cylinder_to_absxyz(u, v, d, axis=axis)
    if coord_type == "cartesian":
        return xp.stack([u, v, d], axis=axis)
    raise ValueError(coord_type)


def grid_size_from_range(point_range, voxel_size):
    """Number of voxels per axis (x, y, z order), floor like the reference
    VoxelGenerator: grid = round((range_hi - range_lo) / voxel)."""
    pr = np.asarray(point_range, dtype=np.float64)
    vs = np.asarray(voxel_size, dtype=np.float64)
    return np.round((pr[3:6] - pr[0:3]) / vs).astype(np.int64)
