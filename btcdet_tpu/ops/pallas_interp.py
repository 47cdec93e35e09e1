"""Fused trilinear grid sampling on TPU (Pallas): per-roi windowed
one-hot-matmul interpolation.

Replaces the XLA 8-corner gather in the ConvHead x_combine pool
(reference `conv_head.py` `interpolate_from_3d_features:509`): gathers
of ~2M scattered rows run at ~6-12 ns/row (transaction-bound, ~13 ms
per frame), while each roi's samples live in a small xy footprint of
the dense volume. This kernel:

  * retiles the volume into 8x8 xy supercells with all z planes in the
    lane dim: volp (B, H/8, W/8, 64, D*C) bf16 -- one XLA transpose.
  * per roi, DMAs a (SC x SC supercell) window into VMEM via
    scalar-prefetched block indices (consecutive tiles of the same roi
    reuse the resident block -- Mosaic skips the re-fetch).
  * per tile of T samples, builds a bilinearly-weighted one-hot
    (T, SC*SC*64) from broadcast compares of corner cell codes (4
    accumulated compare-multiplies, VPU) and applies it as ONE MXU
    matmul against the window -> (T, D*C).
  * z-interpolates with a lane-iota weight mask + static lane-slice
    reduction -- no relayouts anywhere.

Out-of-window corners contribute zero, which subsumes the out-of-volume
zero semantics of `common.trilinear_interpolate_dense` when windows are
clipped inside the (zero-padded) volume; samples farther than the
window radius from their roi center lose those contributions --
`window_miss_count` measures this exactly (0 for in-spec rois).

Numerics: bilinear weights and features in bf16 (f32 accumulate), ~3
decimal digits -- inside the tolerance of the bf16 conv stack consuming
the result.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# window tiling: SC x SC supercells of SUP x SUP cells. The one-hot
# matmul's K dim is SC^2*SUP^2 rows, so smaller supercells cut FLOPs
# directly; the binding constraint is coverage — window start granularity
# is SUP cells, so the guaranteed reach from a roi center is
# (SC*SUP - SUP)/2 cells, and flagship rois need ~9.4 (roi grid spread
# ~3.8 + local sample grid ~5.6). 6x4 = 24-cell windows reach 10 cells
# with 576 rows (was 8x8/SC=4: 32-cell window, 12-cell reach, 1024 rows
# — 1.8x the matmul work for margin the rois never use).
SUP = 4          # supercell edge (cells)
SC = 6           # supercells per window axis -> 24x24 cell window


def _round_up(n, m):
    return -(-n // m) * m


def pick_tile(S: int, D: int = 11) -> int | None:
    """Largest sample-tile size (multiple of 8) dividing S that fits the
    VMEM budget, or None when S has no usable divisor. Larger tiles
    amortize per-grid-step overhead: at flagship shapes 288 -> 1296
    measured 53 -> 43 ms (B=8); the bound keeps the kernel's live
    f32 intermediates (onehot, al, out) + the bf16 window under ~12 MB."""
    budget = 14 << 20
    win = SC * SC * SUP * SUP * D * LANES * 2
    per_t = (D * LANES + SC * SC * SUP * SUP + LANES + 8) * 4
    cap = max((budget - win) // per_t, 8)
    for t in range(min(S, cap), 7, -1):
        if t % 8 == 0 and S % t == 0:
            return t
    return None


def prep_volume(dense: jax.Array):
    """(B, D, H, W, C) -> (B, H8, W8, 64, D*C) bf16 supercell layout.
    C is padded to LANES; H, W zero-padded to multiples of SUP."""
    B, D, H, W, C = dense.shape
    assert C <= LANES
    Hp, Wp = _round_up(H, SUP), _round_up(W, SUP)
    d = jnp.pad(dense.astype(jnp.bfloat16),
                ((0, 0), (0, 0), (0, Hp - H), (0, Wp - W), (0, LANES - C)))
    d = d.transpose(0, 2, 3, 1, 4)                  # (B, Hp, Wp, D, C)
    d = d.reshape(B, Hp // SUP, SUP, Wp // SUP, SUP, D * LANES)
    d = d.transpose(0, 1, 3, 2, 4, 5).reshape(
        B, Hp // SUP, Wp // SUP, SUP * SUP, D * LANES)
    return d


def _make_kernel(T: int, D: int):
    DC = D * LANES
    NROWS = SC * SC * SUP * SUP

    def kern(sb_ref, sy_ref, sx_ref, first_ref, *refs):
        sup_refs = refs[:SC * SC]
        cds_ref = refs[SC * SC]
        out_ref = refs[SC * SC + 1]
        win_scr = refs[SC * SC + 2]
        # cds (1, T, 8): yl, xl, z, valid  (block-local float voxel coords)
        yl = cds_ref[0, :, 0]
        xl = cds_ref[0, :, 1]
        z = cds_ref[0, :, 2]
        valid = cds_ref[0, :, 3] > 0.5

        t = pl.program_id(0)

        # The window concat is ~1.6 MB of VMEM copies; consecutive tiles
        # of one roi share the window, so build it in persistent scratch
        # only on the roi's first tile (Mosaic already skips the ref
        # re-DMA for unchanged block indices).
        @pl.when(first_ref[t] != 0)
        def _build_window():
            for k, r in enumerate(sup_refs):
                win_scr[k * SUP * SUP:(k + 1) * SUP * SUP, :] = r[0, 0, 0]

        # Bilinear weights as a separable hat product over the window's
        # static cell coordinates: relu(1-|yl-ry|)*relu(1-|xl-rx|) equals
        # the 4-corner (1-w)/w selection exactly (for ry=floor(yl):
        # 1-|yl-ry| = 1-wy1; ry=floor+1: 1-|..| = wy1; 0 beyond) at ~half
        # the VPU passes of the old per-corner compare-accumulate.
        code_rows = jax.lax.broadcasted_iota(jnp.int32, (1, NROWS), 1)
        sup_i = code_rows // (SUP * SUP)
        intra = code_rows % (SUP * SUP)
        ry = ((sup_i // SC) * SUP + intra // SUP).astype(jnp.float32)
        rx = ((sup_i % SC) * SUP + intra % SUP).astype(jnp.float32)
        wy = jnp.maximum(1.0 - jnp.abs(yl[:, None] - ry), 0.0)
        wx = jnp.maximum(1.0 - jnp.abs(xl[:, None] - rx), 0.0)
        onehot = jnp.where(valid[:, None], wy * wx, 0.0)

        al = jax.lax.dot_general(
            onehot.astype(jnp.bfloat16), win_scr[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (T, D*128)

        # z interpolation, same hat identity per depth slice (out-of-range
        # z decays to zero weight exactly like the old masked iz/iz+1
        # selection); per-slice (T, 128) FMAs beat materializing a full
        # (T, D*128) weight grid
        acc = jnp.zeros((T, LANES), jnp.float32)
        for d in range(D):
            wd = jnp.maximum(1.0 - jnp.abs(z - float(d)), 0.0)
            acc = acc + al[:, d * LANES:(d + 1) * LANES] * wd[:, None]
        out_ref[:] = acc

    return kern


@functools.partial(jax.jit, static_argnames=("T", "D", "interpret"))
def _interp_call(volp, cds, sb, sy, sx, first, *, T, D, interpret=False):
    Bv, H8, W8, _, DC = volp.shape
    tiles = cds.shape[0]

    # one BlockSpec per window supercell: the supercell dims have block
    # size 1, so the scalar-prefetched starts are element-granular
    # (BlockSpec index maps are in units of the block shape)
    def sup_spec(i, j):
        idx = lambda t, sb, sy, sx, first, i=i, j=j: (
            sb[t], sy[t] + i, sx[t] + j, 0, 0)
        return pl.BlockSpec((1, 1, 1, SUP * SUP, DC), idx,
                            memory_space=pltpu.VMEM)

    in_specs = [sup_spec(i, j) for i in range(SC) for j in range(SC)]
    in_specs.append(pl.BlockSpec(
        (1, T, 8), lambda t, sb, sy, sx, first: (t, 0, 0),
        memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (T, LANES), lambda t, sb, sy, sx, first: (t, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((SC * SC * SUP * SUP, DC), jnp.bfloat16)],
    )
    kern = _make_kernel(T, D)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((tiles * T, LANES), jnp.float32),
        grid_spec=grid_spec, interpret=interpret,
    )(sb, sy, sx, first, *([volp] * (SC * SC)), cds)


def roi_window_starts(centers_yx_vox, b_idx, H8: int, W8: int):
    """Per-roi window supercell starts, clipped inside the padded volume.
    centers_yx_vox: (R, 2) float voxel coords (y, x)."""
    sy = jnp.round(centers_yx_vox[:, 0] / SUP).astype(jnp.int32) - SC // 2
    sx = jnp.round(centers_yx_vox[:, 1] / SUP).astype(jnp.int32) - SC // 2
    sy = jnp.clip(sy, 0, max(H8 - SC, 0))
    sx = jnp.clip(sx, 0, max(W8 - SC, 0))
    return b_idx.astype(jnp.int32), sy, sx


def trilinear_pool(dense, zyx, roi_centers_yx, roi_b, valid, *,
                   tile: int = 288, interpret: bool = False):
    """Trilinear-sample `dense` (B, D, H, W, C) at per-roi sample points.

    zyx: (R, S, 3) float voxel coords (z, y, x) per roi (S must be
    divisible by `tile`); roi_centers_yx (R, 2) float voxel coords of
    the roi centers; roi_b (R,) batch index; valid (R, S) sample
    validity. Returns (R, S, C) f32.
    """
    B, D, H, W, C = dense.shape
    R, S, _ = zyx.shape
    assert S % tile == 0, (S, tile)
    tpr = S // tile
    volp = prep_volume(dense)
    H8, W8 = volp.shape[1], volp.shape[2]

    sb, sy, sx = roi_window_starts(roi_centers_yx, roi_b, H8, W8)

    yl = zyx[..., 1] - (sy[:, None] * SUP).astype(jnp.float32)
    xl = zyx[..., 2] - (sx[:, None] * SUP).astype(jnp.float32)
    cds = jnp.stack([
        yl, xl, zyx[..., 0], valid.astype(jnp.float32),
    ], axis=-1)
    cds = jnp.pad(cds, ((0, 0), (0, 0), (0, 4)))      # (R, S, 8)
    cds = cds.reshape(R * tpr, tile, 8)

    sb_t = jnp.repeat(sb, tpr)
    sy_t = jnp.repeat(sy, tpr)
    sx_t = jnp.repeat(sx, tpr)
    # first tile of each window: the kernel rebuilds its scratch window
    # copy only there (consecutive tiles of one roi share the window)
    changed = (
        (sb_t[1:] != sb_t[:-1]) | (sy_t[1:] != sy_t[:-1])
        | (sx_t[1:] != sx_t[:-1]))
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), changed.astype(jnp.int32)])

    out = _interp_call(volp, cds, sb_t, sy_t, sx_t, first, T=tile, D=D,
                       interpret=interpret)
    return out.reshape(R, S, LANES)[..., :C]


def _xla_reference_pool(dense, zyx, roi_b, valid):
    """Pure-XLA twin of trilinear_pool (bf16-matched): drives the
    custom-vjp backward. Flat-row gathers with batch folded into the
    linear index -- no (R, D, H, W, C) per-roi volume copies, so its vjp
    transposes to one scatter-add over the flat table."""
    B, D, H, W, C = dense.shape
    flat = dense.astype(jnp.bfloat16).astype(jnp.float32).reshape(-1, C)
    z, y, x = zyx[..., 0], zyx[..., 1], zyx[..., 2]
    z0 = jnp.floor(z).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    base = roi_b.astype(jnp.int32)[:, None] * (D * H * W)
    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                zi, yi, xi = z0 + dz, y0 + dy, x0 + dx
                inb = (
                    (zi >= 0) & (zi < D) & (yi >= 0) & (yi < H)
                    & (xi >= 0) & (xi < W) & valid
                )
                w = (
                    jnp.abs(1.0 - jnp.abs(z - z0 - dz))
                    * jnp.abs(1.0 - jnp.abs(y - y0 - dy))
                    * jnp.abs(1.0 - jnp.abs(x - x0 - dx))
                )
                w = jnp.where(inb, w, 0.0)
                lin = base + (jnp.clip(zi, 0, D - 1) * H
                              + jnp.clip(yi, 0, H - 1)) * W \
                    + jnp.clip(xi, 0, W - 1)
                out = out + flat[lin] * w[..., None]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def trilinear_pool_ad(dense, zyx, roi_centers_yx, roi_b, valid, tile=288):
    """Differentiable fused pool: Pallas forward, XLA-gather backward
    (zyx/rois are stop-gradient upstream -- the reference's proposal
    layer is no_grad)."""
    return trilinear_pool(dense, zyx, roi_centers_yx, roi_b, valid, tile=tile)


def _tp_fwd(dense, zyx, roi_centers_yx, roi_b, valid, tile):
    out = trilinear_pool_ad(dense, zyx, roi_centers_yx, roi_b, valid, tile)
    return out, (dense, zyx, roi_b, valid)


def _tp_bwd(tile, res, g):
    dense, zyx, roi_b, valid = res
    _, vjp = jax.vjp(lambda d: _xla_reference_pool(d, zyx, roi_b, valid), dense)
    (dd,) = vjp(g)
    return dd, None, None, None, None


trilinear_pool_ad.defvjp(_tp_fwd, _tp_bwd)


def window_miss_count(zyx, roi_centers_yx, roi_b, valid, H8: int, W8: int):
    """Exact number of (sample, corner) contributions dropped by the
    window clipping (diagnostic; 0 when rois fit the SC*SUP window)."""
    sb, sy, sx = roi_window_starts(roi_centers_yx, roi_b, H8, W8)
    yl = zyx[..., 1] - (sy[:, None] * SUP).astype(jnp.float32)
    xl = zyx[..., 2] - (sx[:, None] * SUP).astype(jnp.float32)
    misses = 0
    for dy in (0, 1):
        for dx in (0, 1):
            cy = jnp.floor(yl).astype(jnp.int32) + dy
            cx = jnp.floor(xl).astype(jnp.int32) + dx
            # a corner matters if it is inside the padded volume
            gy = cy + sy[:, None] * SUP
            gx = cx + sx[:, None] * SUP
            in_vol = (gy >= 0) & (gy < H8 * SUP) & (gx >= 0) & (gx < W8 * SUP)
            in_win = (cy >= 0) & (cy < SC * SUP) & (cx >= 0) & (cx < SC * SUP)
            misses = misses + (valid & in_vol & ~in_win).sum()
    return misses
