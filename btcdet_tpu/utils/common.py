"""Small math helpers shared across the framework (JAX + numpy twins).

Covers the reference's `btcdet/utils/common_utils.py` math surface:
limit_period, rotate_points_along_z, voxel centers, bilinear/trilinear
interpolation. Distributed helpers live in `btcdet_tpu/parallel`.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np



def activation_dtype(default=jnp.bfloat16):
    """Model activation dtype for the bf16 compute paths (BEV scatter,
    conv pyramid, ConvHead). `BTCDET_F32=1` forces f32 everywhere -- the
    switch behind the f32-vs-bf16 parity study (docs/PARITY_RISKS.md)."""
    import os

    if os.environ.get("BTCDET_F32"):
        return jnp.float32
    return default


def limit_period(val, offset: float = 0.5, period: float = np.pi):
    """Wrap `val` into [-offset*period, (1-offset)*period)."""
    xp = jnp if isinstance(val, jnp.ndarray) else np
    return val - xp.floor(val / period + offset) * period


def limit_period_np(val, offset: float = 0.5, period: float = np.pi):
    return val - np.floor(val / period + offset) * period


def rotation_matrix_z(angle):
    """[..., 3, 3] rotation about +z for [..., ] angles (radians)."""
    xp = jnp if isinstance(angle, jnp.ndarray) else np
    c, s = xp.cos(angle), xp.sin(angle)
    one, zero = xp.ones_like(c), xp.zeros_like(c)
    rot = xp.stack([
        c, s, zero,
        -s, c, zero,
        zero, zero, one,
    ], axis=-1)
    return rot.reshape(angle.shape + (3, 3))


def rotate_points_along_z(points, angle):
    """Rotate points about the z axis.

    points: (B, N, 3 + C); angle: (B,) radians. Matches the reference
    convention (`common_utils.rotate_points_along_z`): p' = p @ R with
    R = [[c, s, 0], [-s, c, 0], [0, 0, 1]].
    """
    xp = jnp if isinstance(points, jnp.ndarray) else np
    rot = rotation_matrix_z(angle)  # (B, 3, 3)
    xyz = xp.matmul(points[..., :3], rot)
    if points.shape[-1] > 3:
        return xp.concatenate([xyz, points[..., 3:]], axis=-1)
    return xyz


def rotate_points_along_z_np(points, angle):
    return rotate_points_along_z(np.asarray(points), np.asarray(angle))


def get_voxel_centers(voxel_coords, downsample_times, voxel_size, point_cloud_range):
    """voxel_coords: (..., 3) [z, y, x] int -> (..., 3) xyz centers."""
    xp = jnp if isinstance(voxel_coords, jnp.ndarray) else np
    coords_xyz = voxel_coords[..., ::-1].astype(xp.float32)  # z,y,x -> x,y,z
    vsz = xp.asarray(voxel_size, dtype=xp.float32) * xp.asarray(downsample_times, dtype=xp.float32)
    origin = xp.asarray(point_cloud_range[:3], dtype=xp.float32)
    return (coords_xyz + 0.5) * vsz + origin


def bilinear_interpolate(im, x, y):
    """im: (H, W, C); x, y: (N,) float pixel coords. Zero outside border
    clamp, matching `common_utils.bilinear_interpolate_torch`."""
    H, W = im.shape[0], im.shape[1]
    x0 = jnp.floor(x).astype(jnp.int32)
    x1 = x0 + 1
    y0 = jnp.floor(y).astype(jnp.int32)
    y1 = y0 + 1

    x0c = jnp.clip(x0, 0, W - 1)
    x1c = jnp.clip(x1, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    y1c = jnp.clip(y1, 0, H - 1)

    Ia = im[y0c, x0c]
    Ib = im[y1c, x0c]
    Ic = im[y0c, x1c]
    Id = im[y1c, x1c]

    wa = ((x1 - x) * (y1 - y))[:, None]
    wb = ((x1 - x) * (y - y0))[:, None]
    wc = ((x - x0) * (y1 - y))[:, None]
    wd = ((x - x0) * (y - y0))[:, None]
    return Ia * wa + Ib * wb + Ic * wc + Id * wd


def trilinear_interpolate_dense(vol, zyx):
    """vol: (D, H, W, C); zyx: (N, 3) float voxel coords (z, y, x).

    Zero contribution from out-of-bounds corners (the reference's
    `reverse_sparse_trilinear_interpolate_torch` gathers from a dense-ified
    sparse tensor where empties are zero; clamping would leak edge values,
    so out-of-range corners are masked to zero here).
    """
    D, H, W = vol.shape[0], vol.shape[1], vol.shape[2]
    z, y, x = zyx[:, 0], zyx[:, 1], zyx[:, 2]
    z0 = jnp.floor(z).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)

    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                zi, yi, xi = z0 + dz, y0 + dy, x0 + dx
                inb = (
                    (zi >= 0) & (zi < D) & (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
                )
                w = (
                    jnp.abs(1.0 - jnp.abs(z - z0 - dz))
                    * jnp.abs(1.0 - jnp.abs(y - y0 - dy))
                    * jnp.abs(1.0 - jnp.abs(x - x0 - dx))
                )
                w = jnp.where(inb, w, 0.0)
                v = vol[jnp.clip(zi, 0, D - 1), jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
                out = out + v * w[:, None]
    return out


def create_logger(log_file=None, rank: int = 0, log_level=logging.INFO):
    logger = logging.getLogger("btcdet_tpu")
    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    formatter = logging.Formatter("%(asctime)s  %(levelname)5s  %(message)s")
    if not logger.handlers:
        console = logging.StreamHandler()
        console.setLevel(log_level if rank == 0 else logging.ERROR)
        console.setFormatter(formatter)
        logger.addHandler(console)
    if log_file is not None and rank == 0:
        fh = logging.FileHandler(log_file)
        fh.setLevel(log_level)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    logger.propagate = False
    return logger
