"""Fused sparse-conv Pallas TPU kernel: windowed sorted-match
gather-GEMM.

Replaces the XLA rulebook engine's two gather-bound passes (dense-table
rulebook build ~4ms + 27 row-gathers ~4ms per conv on v5e) with ONE
kernel that exploits the sort order of the voxel tables:

  * Both the input and output voxel tables are sorted by linear key
    (b, y, z, x).  For every kernel tap, the query key of an output row
    is an arithmetic function of its coords, and is *monotone* in the
    output rank -- so the inputs contributing to a tile of T consecutive
    output rows live in a small contiguous *window* of the input table.
  * An XLA pre-pass computes per-tap query keys (vectorized integer
    math, no gathers) and per-(dz-group, tile) window start blocks (a
    searchsorted of G*TILES tile-boundary keys -- microseconds).
  * The kernel's BlockSpec index maps read those starts from the
    scalar-prefetch buffer, so Mosaic's pipeline streams the windows
    HBM->VMEM (sequential DMA at full bandwidth -- no random gathers).
  * In VMEM, query keys are matched against a lane-major key table
    (broadcast compare, no relayouts) producing a one-hot matrix whose
    matmul with the window performs gather + tap-weight GEMM on the MXU.

Numerics: features are cast to bfloat16 for the kernel (one-hot x bf16
value with f32 accumulate is an exact selection of the bf16 value);
accumulation is f32.

Window coverage: a tap group's matches for one tile must fit in the
dual windows (NBLOCKS * WIN input rows total).  Tap groups fix (dz, dy)
so one tile's matches form at most two contiguous runs of input rows,
and the table keys are Y-MAJOR (b, y, z, x -- see ops/sparse.py): a
group's shift then stays inside a near-constant-density neighborhood
(dy: the adjacent lateral slab, dz: the adjacent height line within
the slab), bounding the measured per-window requirement at ~1.1x the
tile size across every backbone level.  Under z-major keys the dz
groups of a sparse plane query a dense plane and the span scales with
the z-density RATIO (measured 5.5x tile at L3) -- uncoverable by any
fixed window; that is why the sort order is part of this kernel's
contract.  `span_overflow` computes the exact number of dropped
matches for a given sizing (tests + tools/audit_caps.py); sizes are
per-call parameters with conservative defaults.

Reference parity: this implements the same rule semantics as
`btcdet_tpu/ops/sparse.py` (`subm_rulebook` + `apply_rulebook_matmul`
etc.), which in turn mirror spconv v1.2.1 (reference
`btcdet/models/backbones_3d/spconv_backbone.py`).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT32_MAX = np.int32(2**31 - 1)
LANES = 128
TAP_PAD = 16  # lane width of the per-tap query-key blocks


def _triple(v):
    if isinstance(v, (int, np.integer)):
        return (int(v), int(v), int(v))
    return tuple(int(x) for x in v)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


# --------------------------------------------------------------- pre-pass


def prep_table(features: jax.Array, keys: jax.Array, win: int, nblocks: int):
    """Pad + pack (N, C) features and sorted (N,) keys for the kernel.

    The table keeps its natural channel width (padded only to a multiple
    of 16): window DMAs read contiguous HBM, so traffic scales with the
    real C -- padding to 128 lanes would cost 8x on the C=16 level-1
    convs. Lane padding to 128 happens only in VMEM tiling (free).

    Returns (table (NP, CP) bf16, keys_blk (NP//win, win//128, 128)
    int32, keys_padded (NP,), NP).
    """
    N, C = features.shape
    assert C <= LANES, f"C={C} exceeds the 128-lane table"
    CP = _round_up(C, 16)
    NP = _round_up(max(N, (nblocks + 1) * win), win)
    tab = jnp.pad(features.astype(jnp.bfloat16),
                  ((0, NP - N), (0, CP - C)))
    kp = jnp.pad(keys, (0, NP - N), constant_values=INT32_MAX)
    kb = win // LANES
    keys_blk = kp.reshape(NP // win, kb, LANES)
    return tab, keys_blk, kp, NP


def tap_perm(kernel_size) -> tuple:
    """Static permutation mapping the kernel's dy-major tap enumeration
    (dy, dz, dx) -- the order `qkeys_subm`/`qkeys_conv` emit and the
    fused kernels consume -- onto the canonical (dz, dy, dx) flat order
    weights are stored in (spconv convention; see ops/sparse.py
    rulebooks).  Apply as `weights[np.asarray(perm)]` going in; scatter dW
    back with `np.argsort(perm)`."""
    kz, ky, kx = _triple(kernel_size)
    return tuple(
        (dzi * ky + dyi) * kx + dxi
        for dyi in range(ky) for dzi in range(kz) for dxi in range(kx)
    )


def qkeys_subm(coords, valid, spatial_shape, batch_size, kernel_size, tile: int):
    """Per-tap query keys for a submanifold conv: neighbor at
    coords + (off - k//2). Returns (qk (G, MP, 16) int32, G, TPG).

    Groups fix dy only (G = ky, TPG = kz * kx): under Y-MAJOR keys the
    dual-anchored window of a (group, tile) covers the contiguous rank
    interval [min match, max match], and that interval is set by the
    min/max query KEY -- dominated by the dy shift (one full lateral
    slab per unit).  Letting dz vary inside the group moves keys by at
    most +-nx within the already-covered slabs, so the measured span
    grows only a few rows vs the earlier (dz, dy) grouping (audited:
    zero overflow at the same NB) while the grid shrinks from kz*ky to
    ky steps per tile -- 3x fewer window DMAs and pre-pass searches for
    a 3x3x3 kernel.  The dz-only grouping (dy varying inside a group)
    remains incorrect under y-major keys: matches split across ky
    slab-separated clusters and the dual anchor drops the middle one.
    Weights must be permuted with `tap_perm` to match the (dy, dz, dx)
    tap order."""
    kz, ky, kx = _triple(kernel_size)
    nz, ny, nx = spatial_shape
    G, TPG = ky, kz * kx
    assert TPG <= TAP_PAD
    M = coords.shape[0]
    MP = _round_up(M, tile)

    b = coords[:, 0]
    z, y, x = coords[:, 1], coords[:, 2], coords[:, 3]
    groups = []
    for dyi in range(ky):
        dy = dyi - ky // 2
        taps = []
        for dzi in range(kz):
            dz = dzi - kz // 2
            for dxi in range(kx):
                dx = dxi - kx // 2
                z2, y2, x2 = z + dz, y + dy, x + dx
                ok = (
                    valid & (z2 >= 0) & (z2 < nz) & (y2 >= 0) & (y2 < ny)
                    & (x2 >= 0) & (x2 < nx)
                )
                key = ((b * ny + y2) * nz + z2) * nx + x2  # y-major (ops/sparse.py)
                taps.append(jnp.where(ok, key.astype(jnp.int32), -1))
        groups.append(jnp.stack(taps, axis=-1))  # (M, TPG)
    qk = jnp.stack(groups, axis=0)  # (G, M, TPG)
    qk = jnp.pad(qk, ((0, 0), (0, MP - M), (0, TAP_PAD - TPG)),
                 constant_values=-1)
    return qk, G, TPG


def qkeys_conv(out_coords, out_valid, in_spatial_shape, in_batch_size,
               kernel_size, stride, padding, tile: int, transpose: bool = False):
    """Per-tap query keys for a strided conv (in = out*s - p + off) or a
    transpose/inverse conv (in = (out + p - off) / s, divisibility-checked).
    """
    kz, ky, kx = _triple(kernel_size)
    s, p = _triple(stride), _triple(padding)
    nz, ny, nx = in_spatial_shape
    G, TPG = ky, kz * kx  # dy groups, (dy, dz, dx) tap order: see qkeys_subm
    assert TPG <= TAP_PAD
    M = out_coords.shape[0]
    MP = _round_up(M, tile)

    b = out_coords[:, 0]
    oz, oy, ox = out_coords[:, 1], out_coords[:, 2], out_coords[:, 3]
    groups = []
    for dy in range(ky):
        taps = []
        for dz in range(kz):
            for dx in range(kx):
                if transpose:
                    numz, numy, numx = oz + p[0] - dz, oy + p[1] - dy, ox + p[2] - dx
                    divok = (
                        (numz % s[0] == 0) & (numy % s[1] == 0) & (numx % s[2] == 0)
                        & (numz >= 0) & (numy >= 0) & (numx >= 0)
                    )
                    z2, y2, x2 = numz // s[0], numy // s[1], numx // s[2]
                else:
                    z2 = oz * s[0] - p[0] + dz
                    y2 = oy * s[1] - p[1] + dy
                    x2 = ox * s[2] - p[2] + dx
                    divok = True
                ok = (
                    out_valid & divok & (z2 >= 0) & (z2 < nz) & (y2 >= 0) & (y2 < ny)
                    & (x2 >= 0) & (x2 < nx)
                )
                key = ((b * ny + y2) * nz + z2) * nx + x2  # y-major (ops/sparse.py)
                taps.append(jnp.where(ok, key.astype(jnp.int32), -1))
        groups.append(jnp.stack(taps, axis=-1))
    qk = jnp.stack(groups, axis=0)
    qk = jnp.pad(qk, ((0, 0), (0, MP - M), (0, TAP_PAD - TPG)),
                 constant_values=-1)
    return qk, G, TPG


def window_starts(in_keys_padded: jax.Array, qk: jax.Array, win: int, tile: int,
                  nba: int, nbb: int):
    """Dual-anchored window block indices per (group, tile).

    Window A (nba blocks) is anchored at the group's minimum match rank;
    window B (nbb blocks) ends at the maximum match rank. B is clamped to
    start at/after A's end, so the two never overlap (no double-counted
    matches) and merge into one contiguous window when the tile's span is
    small. The dual anchor makes tiles whose output rows straddle a large
    key discontinuity (e.g. a z-plane boundary with asymmetric density)
    exact as long as the matches form at most two clusters.

    Returns (2 * G * tiles,) int32: A starts then B starts, group-major.
    """
    G, MP, TP = qk.shape
    NP = in_keys_padded.shape[0]
    nblk = NP // win
    tiles = MP // tile
    qv = jnp.where(qk < 0, INT32_MAX, qk)
    flat = qv.reshape(G, tiles, tile * TP)
    qmin = flat.min(axis=-1).reshape(-1)
    qmax = jnp.where(flat == INT32_MAX, -1, flat).max(axis=-1).reshape(-1)
    both = jnp.concatenate([qmin, qmax])
    idx = jnp.searchsorted(in_keys_padded, both, method="sort").astype(jnp.int32)
    lo, hi = idx[: G * tiles], idx[G * tiles:]
    blk_a = jnp.clip(lo // win, 0, nblk - nba - nbb)
    # hi is the first rank with key > qmax - 1 positions... use right edge:
    blk_b = (hi + win) // win - nbb  # ceil((hi+1)/win) - nbb covers rank hi
    blk_b = jnp.clip(jnp.maximum(blk_b, blk_a + nba), 0, nblk - nbb)
    return jnp.concatenate([blk_a, blk_b])


def span_overflow(in_keys_padded, qk, starts_blk, win: int, nba: int, nbb: int,
                  tile: int):
    """Exact count of matches outside the dual windows (test diagnostic;
    does the full searchsorted the kernel avoids)."""
    G, MP, TP = qk.shape
    tiles = MP // tile
    gt = G * tiles
    rank = jnp.searchsorted(
        in_keys_padded, jnp.clip(qk, 0, None).reshape(-1), method="sort"
    ).astype(jnp.int32).reshape(G, MP, TP)
    rank_c = jnp.clip(rank, 0, in_keys_padded.shape[0] - 1)
    hit = (in_keys_padded[rank_c.reshape(-1)].reshape(rank.shape)
           == qk) & (qk >= 0)
    blk_a = starts_blk[:gt].reshape(G, tiles, 1, 1)
    blk_b = starts_blk[gt:].reshape(G, tiles, 1, 1)
    r = rank.reshape(G, tiles, tile, TP)
    in_a = (r >= blk_a * win) & (r < (blk_a + nba) * win)
    in_b = (r >= blk_b * win) & (r < (blk_b + nbb) * win)
    covered = in_a | in_b
    return (hit.reshape(G, tiles, tile, TP) & ~covered).sum()


# ----------------------------------------------------------------- kernel
#
# Grid layout note: a one-step-per-tile variant (all G tap groups per
# step, tap-stacked (TPG*T, NB*WIN) one-hot matmul) measured SLOWER than
# this (tiles, G) grid on v5e (3.25 vs 2.16 ms on the 20k-voxel L1 subm
# conv) -- the smaller per-step blocks pipeline DMA better than the big
# fused step. Keep the (tiles, G) grid.


def _build_onehot(q, key_blocks, kb: int, nblocks: int):
    """(T,) query keys vs NBLOCKS key blocks (1, 8, 128) -> one-hot
    (T, nblocks * win) bf16, with no relayouts."""
    pieces = []
    for nb in range(nblocks):
        for r in range(kb):
            pieces.append(q[:, None] == key_blocks[nb][0, r][None, :])
    return jnp.concatenate(pieces, axis=1).astype(jnp.bfloat16)


def _make_kernel(mode: str, G: int, TPG: int, T: int, WIN: int, NB: int,
                 C: int, CO: int, tiles: int):
    kb = WIN // LANES
    NEG = -3.0e38

    def kern(s_ref, *refs):
        tabs = refs[:NB]
        keybs = refs[NB:2 * NB]
        qk_ref = refs[2 * NB]
        if mode == "conv":
            w_ref = refs[2 * NB + 1]
            out_ref = refs[2 * NB + 2]
            acc = refs[2 * NB + 3]
        else:
            out_ref = refs[2 * NB + 1]
            acc = refs[2 * NB + 2]
        g = pl.program_id(1)
        t = pl.program_id(0)
        # rows are key-sorted with invalid (padding) rows at the end, so a
        # tile entirely past the live row count has qk = -1 everywhere:
        # its output is exactly zero. Skip the matmuls for those tiles --
        # the capacity headroom (sized for worst-case occupancy) then
        # costs DMA only, not MXU/VPU work.
        live = t * T < s_ref[2 * G * tiles]

        @pl.when(g == 0)
        def _():
            acc[:] = jnp.full((T, CO), NEG if mode == "max" else 0.0, jnp.float32)

        @pl.when(live)
        def _():
            win = jnp.concatenate([tb[:, :C] for tb in tabs], axis=0)  # (NB*WIN, C)
            for j in range(TPG):
                q = qk_ref[0, :, j]
                onehot = _build_onehot(q, keybs, kb, NB)
                al = jax.lax.dot_general(
                    onehot, win, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (T, C)
                if mode == "conv":
                    acc[:] = acc[:] + jax.lax.dot_general(
                        al.astype(jnp.bfloat16), w_ref[0, j],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                elif mode == "sum":
                    acc[:] = acc[:] + al
                elif mode == "max":
                    found = jnp.sum(onehot.astype(jnp.float32), axis=1, keepdims=True) > 0
                    acc[:] = jnp.maximum(acc[:], jnp.where(found, al, NEG))

        @pl.when(g == G - 1)
        def _():
            if mode == "max":
                out_ref[:] = jnp.where(acc[:] <= NEG / 2, 0.0, acc[:])
            else:
                out_ref[:] = acc[:]

    return kern


def _make_kernel_dw(G: int, TPG: int, T: int, WIN: int, NB: int,
                    CP: int, CO: int, tiles: int):
    """Weight-gradient kernel: accumulates dW[g, j] = AL_j^T @ g_out over
    all tiles of one tap group (grid is (G, tiles), tiles innermost, so
    the per-group output block stays resident while its tiles stream)."""
    kb = WIN // LANES

    def kern(s_ref, *refs):
        tabs = refs[:NB]
        keybs = refs[NB:2 * NB]
        qk_ref = refs[2 * NB]
        g_ref = refs[2 * NB + 1]
        out_ref = refs[2 * NB + 2]
        acc = refs[2 * NB + 3]
        t = pl.program_id(1)
        # see _make_kernel: tiles past the live row count have qk = -1,
        # contributing zero to dW -- skip their matmuls
        live = t * T < s_ref[2 * G * tiles]

        @pl.when(t == 0)
        def _():
            acc[:] = jnp.zeros((TPG, CP, CO), jnp.float32)

        @pl.when(live)
        def _():
            win = jnp.concatenate([tb[:, :CP] for tb in tabs], axis=0)
            gt = g_ref[...].astype(jnp.bfloat16)         # (T, CO)
            for j in range(TPG):
                q = qk_ref[0, :, j]
                onehot = _build_onehot(q, keybs, kb, NB)
                al = jax.lax.dot_general(
                    onehot, win, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (T, CP)
                # contract over T (transposed matmul on the MXU)
                dwj = jax.lax.dot_general(
                    al.astype(jnp.bfloat16), gt,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (CP, CO)
                acc[j] = acc[j] + dwj

        @pl.when(t == tiles - 1)
        def _():
            out_ref[0] = acc[:]

    return kern


@functools.partial(
    jax.jit,
    static_argnames=("G", "TPG", "T", "WIN", "NB", "CO", "interpret"),
)
def _fused_call_dw(table, keys_blk, qk, starts_blk, nnz, g_out, *, G, TPG,
                   T, WIN, NB, CO, interpret=False):
    """dW for one conv: returns (G, TPG, CP, CO) f32."""
    MP = qk.shape[1]
    tiles = MP // T
    CP = table.shape[1]
    kb = WIN // LANES
    NBA = NB // 2
    gt_off = G * tiles

    def tab_spec(nb):
        if nb < NBA:
            idx = lambda g, t, s, nb=nb: (s[g * tiles + t] + nb, 0)
        else:
            idx = lambda g, t, s, nb=nb: (s[gt_off + g * tiles + t] + nb - NBA, 0)
        return pl.BlockSpec((WIN, CP), idx, memory_space=pltpu.VMEM)

    def key_spec(nb):
        if nb < NBA:
            idx = lambda g, t, s, nb=nb: (s[g * tiles + t] + nb, 0, 0)
        else:
            idx = lambda g, t, s, nb=nb: (s[gt_off + g * tiles + t] + nb - NBA, 0, 0)
        return pl.BlockSpec((1, kb, LANES), idx, memory_space=pltpu.VMEM)

    in_specs = [tab_spec(nb) for nb in range(NB)]
    in_specs += [key_spec(nb) for nb in range(NB)]
    in_specs.append(pl.BlockSpec((1, T, TAP_PAD), lambda g, t, s: (g, t, 0),
                                 memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((T, CO), lambda g, t, s: (t, 0),
                                 memory_space=pltpu.VMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G, tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TPG, CP, CO), lambda g, t, s: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TPG, CP, CO), jnp.float32)],
    )
    kern = _make_kernel_dw(G, TPG, T, WIN, NB, CP, CO, tiles)
    s = jnp.concatenate([starts_blk, nnz.astype(jnp.int32)[None]])
    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((G, TPG, CP, CO), jnp.float32),
        grid_spec=grid_spec, interpret=interpret,
    )(s, *([table] * NB + [keys_blk] * NB + [qk, g_out]))


def subm_conv_bwd(features, keys, qk, weights, g_out, *, G, TPG, T, WIN, NB,
                  M, nnz=None, perm=None, interpret=False):
    """Backward of a submanifold fused conv.

    df: a subm conv's transpose is itself a subm conv over the SAME
    query-key structure -- tap (dy,dz,dx) of the transpose equals tap
    (-dy,-dz,-dx) forward (full flat reversal of any lexicographic
    enumeration over symmetric per-dim ranges) -- so df = fused conv of
    g_out with tap-reversed, transposed weights, reusing the forward qk
    verbatim.  dW[k] = AL_k^T @ g_out via the dw kernel; dW comes back
    in qk tap order and is scattered to canonical order when perm is
    given.  No rulebooks anywhere.
    """
    if perm is not None:
        weights = weights[np.asarray(perm)]
    K, Cin, CO = weights.shape
    w_rev = jnp.transpose(weights[::-1], (0, 2, 1))          # (K, CO, Cin)
    df = _conv_fwd(g_out, keys, qk, w_rev, G=G, TPG=TPG, T=T, WIN=WIN,
                   NB=NB, M=M, nnz=nnz, interpret=interpret)
    # dw windows gather FEATURES; g streams per tile
    ftab, fkeys_blk, fkp, _ = prep_table(features, keys, WIN, NB)
    fstarts = window_starts(fkp, qk, WIN, T, NB // 2, NB - NB // 2)
    MP = qk.shape[1]
    gp = jnp.pad(g_out.astype(jnp.float32), ((0, MP - g_out.shape[0]), (0, 0)))
    dw_nnz = _qk_nnz(qk) if nnz is None else nnz
    dw = _fused_call_dw(ftab, fkeys_blk, qk, fstarts, dw_nnz, gp, G=G, TPG=TPG,
                        T=T, WIN=WIN, NB=NB, CO=CO, interpret=interpret)
    dw = dw.reshape(K, -1, CO)[:, :Cin, :]
    if perm is not None:
        dw = dw[np.argsort(np.asarray(perm))]
    return df, dw


def strided_conv_bwd(features, in_keys, qk, weights, g_out, out_keys,
                     in_coords, in_valid, out_spatial_shape, batch_size,
                     kernel_size, stride, padding, *, G, TPG, T, WIN, NB,
                     out_nnz=None, perm=None, interpret=False):
    """Backward of a strided fused conv.

    df[i] = sum_k g[(i + p - off_k) / s] @ W_k^T -- the transpose-conv
    query structure (`qkeys_conv(transpose=True)`) over the OUT-sorted g
    table with per-tap transposed (NOT tap-reversed) weights, tap order
    matching qk ((dy, dz, dx); perm reorders canonical weights).
    dW[k] = AL_k^T @ g over the forward query keys. No rulebooks.
    """
    if perm is not None:
        weights = weights[np.asarray(perm)]
    K, Cin, CO = weights.shape
    qk_t, Gt, TPGt = qkeys_conv(
        in_coords, in_valid, out_spatial_shape, batch_size,
        kernel_size, stride, padding, T, transpose=True)
    w_t = jnp.transpose(weights, (0, 2, 1))                  # (K, CO, Cin)
    df = _conv_fwd(g_out, out_keys, qk_t, w_t, G=Gt, TPG=TPGt, T=T,
                   WIN=WIN, NB=NB, M=features.shape[0],
                   nnz=jnp.sum(in_valid), interpret=interpret)
    ftab, fkeys_blk, fkp, _ = prep_table(features, in_keys, WIN, NB)
    fstarts = window_starts(fkp, qk, WIN, T, NB // 2, NB - NB // 2)
    MP = qk.shape[1]
    gp = jnp.pad(g_out.astype(jnp.float32), ((0, MP - g_out.shape[0]), (0, 0)))
    dw_nnz = _qk_nnz(qk) if out_nnz is None else out_nnz
    dw = _fused_call_dw(ftab, fkeys_blk, qk, fstarts, dw_nnz, gp, G=G, TPG=TPG,
                        T=T, WIN=WIN, NB=NB, CO=CO, interpret=interpret)
    dw = dw.reshape(K, -1, CO)[:, :Cin, :]
    if perm is not None:
        dw = dw[np.argsort(np.asarray(perm))]
    return df, dw


@functools.partial(
    jax.jit,
    static_argnames=("mode", "G", "TPG", "T", "WIN", "NB", "CO", "interpret"),
)
def _fused_call(table, keys_blk, qk, starts_blk, nnz, weights, *, mode, G, TPG,
                T, WIN, NB, CO, interpret=False):
    MP = qk.shape[1]
    tiles = MP // T
    CP = table.shape[1]
    kb = WIN // LANES

    # dual-anchor: blocks [0, NBA) index off the A starts (first half of
    # the prefetch array), blocks [NBA, NB) off the B starts (second half)
    NBA = NB // 2
    gt_off = G * tiles

    def tab_spec(nb):
        if nb < NBA:
            idx = lambda t, g, s, nb=nb: (s[g * tiles + t] + nb, 0)
        else:
            idx = lambda t, g, s, nb=nb: (s[gt_off + g * tiles + t] + nb - NBA, 0)
        return pl.BlockSpec((WIN, CP), idx, memory_space=pltpu.VMEM)

    def key_spec(nb):
        if nb < NBA:
            idx = lambda t, g, s, nb=nb: (s[g * tiles + t] + nb, 0, 0)
        else:
            idx = lambda t, g, s, nb=nb: (s[gt_off + g * tiles + t] + nb - NBA, 0, 0)
        return pl.BlockSpec((1, kb, LANES), idx, memory_space=pltpu.VMEM)

    in_specs = [tab_spec(nb) for nb in range(NB)]
    in_specs += [key_spec(nb) for nb in range(NB)]
    in_specs.append(pl.BlockSpec((1, T, TAP_PAD), lambda t, g, s: (g, t, 0),
                                 memory_space=pltpu.VMEM))
    args = [table] * NB + [keys_blk] * NB + [qk]
    if mode == "conv":
        in_specs.append(pl.BlockSpec(
            (1, TPG, weights.shape[2], CO), lambda t, g, s: (g, 0, 0, 0),
            memory_space=pltpu.VMEM))
        args.append(weights)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles, G),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T, CO), lambda t, g, s: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T, CO), jnp.float32)],
    )
    kern = _make_kernel(mode, G, TPG, T, WIN, NB,
                        weights.shape[2] if mode == "conv" else CO, CO, tiles)
    s = jnp.concatenate([starts_blk, nnz.astype(jnp.int32)[None]])
    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((MP, CO), jnp.float32),
        grid_spec=grid_spec, interpret=interpret,
    )(s, *args)


# ------------------------------------------------------------ public ops


DEBUG_OVERFLOW = os.environ.get("BTCDET_PALLAS_DEBUG", "0") == "1"

# Optional machine-readable overflow audit (tools/audit_caps.py): when a
# sink is registered, every fused-conv rulebook build reports its exact
# dropped-match count through a host callback (VERDICT r1 next #4).
_OVERFLOW_SINK = None


def set_overflow_sink(fn):
    """fn(overflow_count: np.int32, n: int, win: int, nblocks: int) or None."""
    global _OVERFLOW_SINK
    _OVERFLOW_SINK = fn


def audit_overflow(in_keys, qk, win: int, nblocks: int, tile: int,
                   tag: str | None = None):
    """Report this conv's exact window-overflow count to the registered
    sink WITHOUT running the Pallas kernel -- the window spans depend
    only on (keys, qk), so the audit is backend-independent (used by
    tools/audit_caps.py on CPU, where the XLA engine runs instead)."""
    if _OVERFLOW_SINK is None:
        return
    nba = nblocks // 2
    nbb = nblocks - nba
    N = in_keys.shape[0]
    NP = _round_up(max(N, (nblocks + 1) * win), win)
    kp = jnp.pad(in_keys, (0, NP - N), constant_values=INT32_MAX)
    starts = window_starts(kp, qk, win, tile, nba, nbb)
    ov = span_overflow(kp, qk, starts, win, nba, nbb, tile)
    # widest (group, tile) match-rank span in input rows. NOTE: this is
    # an UPPER BOUND on the NBLOCKS*WIN needed -- the kernel's windows
    # are dual-anchored (two disjoint runs), so a span with a key gap in
    # the middle can be covered by less than span_max rows. The
    # zero-overflow assertion (ov) is exact; span_max only guides sizing.
    G, MP, TP = qk.shape
    tiles = MP // tile
    qv = jnp.where(qk < 0, INT32_MAX, qk)
    flat = qv.reshape(G, tiles, tile * TP)
    qmin = flat.min(axis=-1).reshape(-1)
    qmax = jnp.where(flat == INT32_MAX, -1, flat).max(axis=-1).reshape(-1)
    lo = jnp.searchsorted(kp, qmin, method="sort")
    hi = jnp.searchsorted(kp, qmax, side="right", method="sort")
    span = jnp.where(qmax >= 0, hi - lo, 0)
    jax.debug.callback(
        functools.partial(_OVERFLOW_SINK, tag=tag), ov, n=N, win=win,
        nblocks=nblocks, span_max=span.max(), tile=tile, ordered=False)


def _qk_nnz(qk):
    """Live output-row count from the query keys: padding rows have every
    tap == -1, and live rows precede padding rows (key-sorted tables), so
    counting rows with any in-range tap equals the table's nnz."""
    return jnp.sum(jnp.any(qk >= 0, axis=(0, 2))).astype(jnp.int32)


def _prep_common(in_features, in_keys, qk, win, nblocks, tile):
    nba = nblocks // 2
    nbb = nblocks - nba
    table, keys_blk, kp, NP = prep_table(in_features, in_keys, win, nblocks)
    starts = window_starts(kp, qk, win, tile, nba, nbb)
    if DEBUG_OVERFLOW or _OVERFLOW_SINK is not None:
        ov = span_overflow(kp, qk, starts, win, nba, nbb, tile)
        if _OVERFLOW_SINK is not None:
            jax.debug.callback(
                functools.partial(_OVERFLOW_SINK, tag=None), ov,
                n=in_keys.shape[0], win=win, nblocks=nblocks, ordered=False)
        else:
            jax.debug.print(
                "pallas_conv window overflow (N={n} win={w}x{nb}): {o}",
                n=in_keys.shape[0], w=win, nb=nblocks, o=ov)
    return table, keys_blk, starts


def _conv_fwd(in_features, in_keys, qk, weights, *, G, TPG, T, WIN, NB, M,
              nnz=None, perm=None, interpret=False):
    """weights (K, Cin, Cout) with K = G * TPG; rows must follow the qk
    tap enumeration ((dy, dz, dx)-major) -- pass perm=tap_perm(kernel)
    to reorder canonical (dz, dy, dx)-major weights, or None if already
    ordered.  nnz: live output-row count for tile skipping; defaults to
    the full padded capacity (no skipping)."""
    if perm is not None:
        weights = weights[np.asarray(perm)]
    K, Cin, CO = weights.shape
    table, keys_blk, starts = _prep_common(in_features, in_keys, qk, WIN, NB, T)
    w = weights.reshape(G, TPG, Cin, CO).astype(jnp.bfloat16)
    if nnz is None:
        nnz = _qk_nnz(qk)
    out = _fused_call(table, keys_blk, qk, starts, nnz, w, mode="conv", G=G,
                      TPG=TPG, T=T, WIN=WIN, NB=NB, CO=CO, interpret=interpret)
    return out[:M]


def cached_qk_subm(coords, valid, spatial_shape, batch_size, kernel_size, T,
                   cache=None, cache_key=None):
    """qkeys_subm with rulebook-cache sharing; the ONE place that owns the
    subm qk cache-key format (sparse.py delegates here)."""
    ck = ("pallas_subm_qk", cache_key, _triple(kernel_size))
    if cache is not None and cache_key and ck in cache:
        return cache[ck]
    out = qkeys_subm(coords, valid, spatial_shape, batch_size, kernel_size, T)
    if cache is not None and cache_key:
        cache[ck] = out
    return out


def cached_qk_conv(out_coords, out_valid, in_spatial_shape, batch_size,
                   kernel_size, stride, padding, T, transpose=False,
                   cache=None, cache_key=None):
    """qkeys_conv with rulebook-cache sharing (owns the cache-key format)."""
    ck = ("pallas_conv_qk", cache_key, _triple(kernel_size), transpose)
    if cache is not None and cache_key and ck in cache:
        return cache[ck]
    out = qkeys_conv(out_coords, out_valid, in_spatial_shape, batch_size,
                     kernel_size, stride, padding, T, transpose=transpose)
    if cache is not None and cache_key:
        cache[ck] = out
    return out


def fused_subm_conv(st_features, st_coords, st_keys, st_valid, spatial_shape,
                    batch_size, weights, kernel_size, *, T=256, WIN=128, NB=4,
                    cache=None, cache_key=None, interpret=False):
    """Submanifold conv forward on the fused kernel. Returns (M, CO) f32.

    NOTE: matches outside the dual-anchored NB*WIN window are silently
    dropped. The default NB=4 is sized for the audited flagship-config
    occupancies (in-model callers pass NB explicitly via _PALLAS_SUBM_CFG);
    external callers with denser inputs must audit with
    `set_overflow_sink` / `tools/audit_caps.py` (span_overflow == 0) or
    raise NB.
    """
    qk, G, TPG = cached_qk_subm(st_coords, st_valid, spatial_shape, batch_size,
                                kernel_size, T, cache, cache_key)
    return _conv_fwd(st_features, st_keys, qk, weights, G=G, TPG=TPG, T=T,
                     WIN=WIN, NB=NB, M=st_features.shape[0],
                     nnz=jnp.sum(st_valid), perm=tap_perm(kernel_size),
                     interpret=interpret)


def fused_conv(in_features, in_keys, out_coords, out_valid, in_spatial_shape,
               batch_size, weights, kernel_size, stride, padding, *,
               transpose=False, T=128, WIN=128, NB=4, cache=None,
               cache_key=None, interpret=False):
    """Strided (or transpose/inverse) conv forward on the fused kernel."""
    qk, G, TPG = cached_qk_conv(out_coords, out_valid, in_spatial_shape,
                                batch_size, kernel_size, stride, padding, T,
                                transpose=transpose, cache=cache,
                                cache_key=cache_key)
    return _conv_fwd(in_features, in_keys, qk, weights, G=G, TPG=TPG, T=T,
                     WIN=WIN, NB=NB, M=out_coords.shape[0],
                     nnz=jnp.sum(out_valid), perm=tap_perm(kernel_size),
                     interpret=interpret)


def fused_pool(in_features, in_keys, qk, G, TPG, *, mode="max", T=128,
               WIN=128, NB=6, M=None, nnz=None, interpret=False):
    """Max-pool / neighbor-sum over the fused kernel. CO == Cin."""
    C = in_features.shape[1]
    table, keys_blk, starts = _prep_common(in_features, in_keys, qk, WIN, NB, T)
    dummy_w = jnp.zeros((1,), jnp.float32)
    if nnz is None:
        nnz = _qk_nnz(qk)
    out = _fused_call(table, keys_blk, qk, starts, nnz, dummy_w, mode=mode, G=G,
                      TPG=TPG, T=T, WIN=WIN, NB=NB, CO=C, interpret=interpret)
    return out[: (M if M is not None else in_features.shape[0])]
