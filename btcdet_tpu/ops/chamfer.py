"""Chamfer distance (reference `btcdet/ops/chamfer_distance/` CUDA
extension, used by the offline best-match pipeline).

Padded pairwise-min formulation: works on (B, N, 3) batches with
validity masks, jnp or numpy. The cross-distance term is a matmul so the
heavy part lands on the MXU when jitted.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _xp(a):
    return jnp if isinstance(a, jnp.ndarray) else np


def chamfer_distance(xyz1, xyz2, mask1=None, mask2=None):
    """xyz1: (B, N, 3), xyz2: (B, M, 3) -> (dist1 (B, N), dist2 (B, M)):
    squared distance from each point to the nearest point of the other
    cloud (the reference kernel's convention). Masked points give inf."""
    xp = _xp(xyz1)
    if mask1 is None:
        mask1 = xp.ones(xyz1.shape[:2], dtype=bool)
    if mask2 is None:
        mask2 = xp.ones(xyz2.shape[:2], dtype=bool)
    sq1 = xp.sum(xyz1 * xyz1, axis=-1)
    sq2 = xp.sum(xyz2 * xyz2, axis=-1)
    cross = xp.einsum("bnc,bmc->bnm", xyz1, xyz2)
    d = sq1[:, :, None] + sq2[:, None, :] - 2 * cross  # (B, N, M)
    d = xp.maximum(d, 0.0)
    big = xp.asarray(np.inf, dtype=xyz1.dtype)
    d1 = xp.where(mask2[:, None, :], d, big).min(axis=2)
    d2 = xp.where(mask1[:, :, None], d, big).min(axis=1)
    d1 = xp.where(mask1, d1, big)
    d2 = xp.where(mask2, d2, big)
    return d1, d2
