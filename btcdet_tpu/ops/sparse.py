"""TPU-native sparse 3D convolution engine.

Replaces the reference's external spconv v1.2.1 dependency (used by both
backbones, the occ head and the ROI head; see reference
`btcdet/models/backbones_3d/spconv_backbone.py` and SURVEY.md §2.7) with a
gather-GEMM formulation that is jit-able and static-shape:

  * Active voxels live in capacity-padded tables sorted by a linear
    (batch, y, z, x) key; padding rows carry key INT32_MAX. The sort
    order is Y-MAJOR (not z-major): LiDAR occupancy varies smoothly
    across lateral y but harshly across height z, so y-major keys keep
    every kernel-tap shift (dy: one slab over, dz: one line within the
    slab) inside a near-constant-density neighborhood -- measured
    worst-case windowed-match spans drop from ~5.5x tile size (z-major,
    L3) to ~1.1x (all levels), which is what lets the fused Pallas
    kernel's fixed windows (pallas_conv.py) cover every match exactly.
  * A *rulebook* for a conv layer is, for every kernel offset k and every
    output voxel, the index of the (unique) contributing input voxel --
    computed with `jnp.searchsorted` over the sorted key table. This
    "gather per output" layout needs no scatter in the forward pass:
        out = sum_k gather(features, in_idx[k]) @ W[k]
    which XLA maps onto K MXU matmuls.
  * Strided convs generate output coordinates by candidate expansion +
    sort + unique, capped at a static capacity.
  * `indice_key` sharing semantics follow spconv: layers with the same key
    reuse the cached rulebook/coords, and SparseInverseConv3d restores the
    coordinate set recorded under its key (reference usage
    `spconv_backbone.py:11-31`).

Covered op set (matching the reference's usage): SubMConv3d,
SparseConv3d (strided), SparseConvTranspose3d, SparseInverseConv3d,
SparseMaxPool3d, masked BatchNorm over active voxels, and `.dense()`.

Conventions: coords are (b, z, y, x) int32; features are channels-last
(N, C); dense() returns (B, nz, ny, nx, C) channels-last (TPU layout; the
reference's NCDHW is a torch idiom).
"""

from __future__ import annotations

import functools
import itertools
import os
from typing import Any, Sequence

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from . import pallas_conv

INT32_MAX = np.int32(2**31 - 1)

# ---------------------------------------------------------------------
# Engine selection: the fused Pallas kernel (pallas_conv.py) replaces the
# rulebook build + 27-row-gather apply on TPU; the XLA engine remains the
# reference implementation and the CPU / backward path.
# BTCDET_PALLAS=0 disables; =1 forces (interpret mode off-TPU is slow --
# only tests do that explicitly).
# ---------------------------------------------------------------------
_PALLAS_MODE = os.environ.get("BTCDET_PALLAS", "auto")


def set_pallas_mode(mode: str):
    global _PALLAS_MODE
    _PALLAS_MODE = mode


def use_pallas(kind: str = "subm") -> bool:
    """kind in {subm, conv, pool, fix}; mode may be 0/1/auto or a comma
    list of enabled kinds (bisect/debug)."""
    if _PALLAS_MODE == "0":
        return False
    if _PALLAS_MODE == "1":
        return True
    if _PALLAS_MODE == "auto":
        return jax.default_backend() == "tpu"
    return kind in _PALLAS_MODE.split(",")


def _triple(v) -> tuple[int, int, int]:
    if isinstance(v, (int, np.integer)):
        return (int(v), int(v), int(v))
    assert len(v) == 3
    return tuple(int(x) for x in v)


@flax.struct.dataclass
class SparseTensor:
    """Capacity-padded sparse voxel tensor.

    features: (N, C) float; coords: (N, 4) int32 (b, z, y, x) with -1 pad;
    keys: (N,) int32 sorted ascending, padding = INT32_MAX; nnz: () int32.
    spatial_shape (nz, ny, nx) and batch_size are static.
    """

    features: jax.Array
    coords: jax.Array
    keys: jax.Array
    nnz: jax.Array
    spatial_shape: tuple[int, int, int] = flax.struct.field(pytree_node=False)
    batch_size: int = flax.struct.field(pytree_node=False)

    @property
    def capacity(self) -> int:
        return self.features.shape[0]

    @property
    def valid(self) -> jax.Array:
        return self.keys != INT32_MAX

    def dense(self, layout: str = "zyx") -> jax.Array:
        """-> (B, nz, ny, nx, C) channels-last dense tensor (layout
        "zyx", default), or the scatter-native (B, ny, nz, nx, C)
        ("yzx") which skips the transpose for consumers that fold z
        into channels anyway (HeightCompression)."""
        nz, ny, nx = self.spatial_shape
        C = self.features.shape[-1]
        out = jnp.zeros((self.batch_size * nz * ny * nx, C), dtype=self.features.dtype)
        idx = jnp.where(self.valid, self.keys, self.batch_size * nz * ny * nx)
        out = jnp.concatenate([out, jnp.zeros((1, C), out.dtype)], axis=0)
        out = out.at[idx].set(jnp.where(self.valid[:, None], self.features, 0.0))
        native = out[:-1].reshape(self.batch_size, ny, nz, nx, C)
        if layout == "yzx":
            return native
        return native.transpose(0, 2, 1, 3, 4)

    def replace_features(self, features: jax.Array) -> "SparseTensor":
        return self.replace(features=features)


def linear_key(coords: jax.Array, spatial_shape, batch_size: int) -> jax.Array:
    """(N, 4) (b,z,y,x) -> int32 Y-MAJOR linear key (b, y, z, x); rows
    with b < 0 -> INT32_MAX. See the module docstring for why y-major."""
    nz, ny, nx = spatial_shape
    total = batch_size * nz * ny * nx
    assert total < 2**31 - 1, (
        f"grid {spatial_shape} x batch {batch_size} overflows int32 keys"
    )
    key = ((coords[:, 0] * ny + coords[:, 2]) * nz + coords[:, 1]) * nx + coords[:, 3]
    return jnp.where(coords[:, 0] >= 0, key.astype(jnp.int32), INT32_MAX)


def key_to_coords(keys: jax.Array, spatial_shape) -> jax.Array:
    nz, ny, nx = spatial_shape
    invalid = keys == INT32_MAX
    b = keys // (ny * nz * nx)
    r = keys - b * (ny * nz * nx)
    y = r // (nz * nx)
    r = r - y * (nz * nx)
    z = r // nx
    x = r - z * nx
    coords = jnp.stack([b, z, y, x], axis=-1).astype(jnp.int32)
    return jnp.where(invalid[:, None], -1, coords)


def from_coords(
    features: jax.Array,
    coords: jax.Array,
    spatial_shape,
    batch_size: int,
    *,
    assume_sorted: bool = False,
    aux: jax.Array | None = None,
):
    """Build a SparseTensor from (features, coords); sorts rows by key.

    coords rows with b < 0 are padding.

    `aux`: optional per-row side table (e.g. the occ-code channels the
    det backbone concatenates level-wise) that must stay ROW-ALIGNED
    with the tensor — it is permuted by the same sort and returned as a
    second value. Passing side data through separately and zipping it
    with `st.replace(features=aux)` afterwards is WRONG whenever padding
    rows sit between valid blocks (the merged det+occ table always has
    per-frame [det valid | det pad | extra valid | extra pad] layout, so
    the sort is never the identity).

    Return type is polymorphic on `aux`: SparseTensor without it,
    `(SparseTensor, permuted_aux)` with it — a call site adding `aux`
    must also update its unpacking. With `assume_sorted=True` the aux
    table is returned UNPERMUTED (the caller asserts rows are already in
    key order, so identity is correct).
    """
    spatial_shape = tuple(int(s) for s in spatial_shape)
    keys = linear_key(coords, spatial_shape, batch_size)
    if not assume_sorted:
        order = jnp.argsort(keys)
        keys = keys[order]
        coords = coords[order]
        features = features[order]
        if aux is not None:
            aux = aux[order]
    nnz = jnp.sum(keys != INT32_MAX).astype(jnp.int32)
    st = SparseTensor(
        features=features,
        coords=coords,
        keys=keys,
        nnz=nnz,
        spatial_shape=spatial_shape,
        batch_size=int(batch_size),
    )
    return (st, aux) if aux is not None else st


def prefix(st: SparseTensor, width: int) -> SparseTensor:
    """Static-prefix slice of a key-sorted tensor: rows are valid-first
    (INT32_MAX padding keys sort last), so any `width >= st.nnz` yields a
    tensor with bitwise-identical live content at a smaller capacity —
    every rulebook/qk/BN/elementwise downstream then scales with `width`
    instead of the capacity. The caller must guard `width >= nnz`
    (tiered `lax.cond`, see btcnet's det-backbone call)."""
    return SparseTensor(
        features=st.features[:width],
        coords=st.coords[:width],
        keys=st.keys[:width],
        nnz=st.nnz,
        spatial_shape=st.spatial_shape,
        batch_size=st.batch_size,
    )


def pad_capacity(st: SparseTensor, capacity: int) -> SparseTensor:
    """Extend a tensor with padding rows (zero features, -1 coords,
    INT32_MAX keys) up to `capacity` — the inverse of `prefix`, used to
    equalize branch output shapes in tiered `lax.cond` chains. No-op
    when the tensor is already at `capacity`."""
    n = st.keys.shape[0]
    if n == capacity:
        return st
    assert n < capacity, (n, capacity)
    pad = capacity - n
    return SparseTensor(
        features=jnp.pad(st.features, ((0, pad), (0, 0))),
        coords=jnp.pad(st.coords, ((0, pad), (0, 0)), constant_values=-1),
        keys=jnp.pad(st.keys, (0, pad), constant_values=INT32_MAX),
        nnz=st.nnz,
        spatial_shape=st.spatial_shape,
        batch_size=st.batch_size,
    )


def lookup(table_keys: jax.Array, queries: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Binary search queries in a sorted key table.

    Returns (idx, found). idx is clipped into range; `found` is False for
    INT32_MAX queries (padding always misses).
    """
    # method='sort' co-sorts queries with the table instead of per-query
    # binary search: ~6x faster on TPU for the ~1M-query rulebook builds
    idx = jnp.searchsorted(table_keys, queries, method="sort").astype(jnp.int32)
    idx = jnp.clip(idx, 0, table_keys.shape[0] - 1)
    found = (table_keys[idx] == queries) & (queries != INT32_MAX)
    return idx, found


# grids up to this many cells x batch use a dense scatter/gather lookup
# table instead of sorted search: one O(N) scatter + O(Q) gather beats
# sorting ~1M rulebook queries. 96M cells covers the full KITTI det grid
# at batch 1 (~370MB transient int32 table); larger products (training
# batches on the level-1 grid) fall back to sorted search automatically.
DENSE_LOOKUP_MAX_CELLS = 96_000_000


def lookup_in(
    st: "SparseTensor", queries: jax.Array, cache: dict | None = None
) -> tuple[jax.Array, jax.Array]:
    """Lookup linear-key queries in a SparseTensor's voxel table, picking
    a dense table or sorted search by grid size.

    All tensors at one backbone level share the same coordinate set, so
    when a rulebook `cache` is passed the dense table is built once per
    level (keyed by the level's spatial shape) and reused by every
    subm/strided rulebook that queries that level."""
    nz, ny, nx = st.spatial_shape
    total = st.batch_size * nz * ny * nx
    if total > DENSE_LOOKUP_MAX_CELLS:
        return lookup(st.keys, queries)
    # key includes the coordinate-set identity (the keys array object):
    # two same-shape tensors with different active sites sharing one
    # cache dict must NOT resolve against each other's table
    tkey = ("dtable", id(st.keys), st.spatial_shape, st.batch_size)
    if cache is not None and tkey in cache:
        table = cache[tkey]
    else:
        scat = jnp.where(st.valid, st.keys, total)
        # padding rows all target the sentinel slot; write -1 there so the
        # winner never marks garbage queries as found
        table = jnp.full((total + 1,), -1, jnp.int32).at[scat].set(
            jnp.where(st.valid, jnp.arange(st.capacity, dtype=jnp.int32), -1)
        )
        if cache is not None:
            cache[tkey] = table
    q = jnp.clip(queries, 0, total)  # INT32_MAX padding -> sentinel row
    idx = table[q]
    found = idx >= 0
    return jnp.maximum(idx, 0), found


def _kernel_offsets(kernel_size) -> np.ndarray:
    """All (dz, dy, dx) offsets in [0, k) per axis, row-major order."""
    kz, ky, kx = _triple(kernel_size)
    return np.array(list(itertools.product(range(kz), range(ky), range(kx))), dtype=np.int32)


def _conv_out_shape(spatial_shape, kernel_size, stride, padding) -> tuple[int, int, int]:
    k, s, p = _triple(kernel_size), _triple(stride), _triple(padding)
    return tuple(
        (int(spatial_shape[i]) + 2 * p[i] - k[i]) // s[i] + 1 for i in range(3)
    )


def _transpose_out_shape(spatial_shape, kernel_size, stride, padding) -> tuple[int, int, int]:
    k, s, p = _triple(kernel_size), _triple(stride), _triple(padding)
    return tuple(
        (int(spatial_shape[i]) - 1) * s[i] - 2 * p[i] + k[i] for i in range(3)
    )


def subm_rulebook(st: SparseTensor, kernel_size, cache: dict | None = None) -> tuple[jax.Array, jax.Array]:
    """Submanifold rulebook: (in_idx, valid), both (K, N).

    Output sites == input sites; for each offset the neighbor at
    coords + (off - k//2) is looked up.
    """
    offsets = _kernel_offsets(kernel_size)
    k = _triple(kernel_size)
    center = np.array([k[0] // 2, k[1] // 2, k[2] // 2], dtype=np.int32)
    rel = jnp.asarray(offsets - center[None, :])  # (K, 3)

    nz, ny, nx = st.spatial_shape
    nbr = st.coords[None, :, 1:4] + rel[:, None, :]  # (K, N, 3)
    inb = (
        (nbr[..., 0] >= 0) & (nbr[..., 0] < nz)
        & (nbr[..., 1] >= 0) & (nbr[..., 1] < ny)
        & (nbr[..., 2] >= 0) & (nbr[..., 2] < nx)
        & st.valid[None, :]
    )
    b = jnp.broadcast_to(st.coords[None, :, 0], nbr.shape[:2])
    qcoords = jnp.concatenate([b[..., None], nbr], axis=-1).reshape(-1, 4)
    qcoords = jnp.where(inb.reshape(-1)[:, None], qcoords, -1)
    qkeys = linear_key(qcoords, st.spatial_shape, st.batch_size)
    idx, found = lookup_in(st, qkeys, cache)
    K = offsets.shape[0]
    return idx.reshape(K, -1), found.reshape(K, -1)


# ---------------------------------------------------------------------
# Grouped (x-consecutive) rulebooks.
#
# For a 3x3x3 kernel the three x-taps of one (dz, dy) pair query keys
# q, q+1, q+2 -- consecutive integers. In the key-sorted voxel table the
# present members of such a run occupy *consecutive rows*, so:
#   * rulebook build needs one lookup per (dz, dy) group (9 instead of 27
#     queries per output site), and
#   * rule application fetches one contiguous kx-row slice per group
#     (lax.gather slice_sizes=(kx, C)): 3x fewer gather transactions,
#     which is what TPU gathers are bound by (~9ns per transaction).
# Used by SubMConv3d and strided SparseConv3d when the kernel's x extent
# is 3 (every trunk conv in both backbones).
# ---------------------------------------------------------------------

# Measured on v5e: lax.gather with multi-row slice_sizes lowers to a
# ~70x-slower path than plain row gathers, and row-gather cost is not
# reduced by fetching fewer/wider rows (tools/microbench_gather.py), so
# the grouped fast path is DISABLED by default; the machinery and its
# correctness tests are kept as the record of the investigated design.
GROUPED_X_GATHER = False


def _grouped_lookup(in_st: SparseTensor, qkey0: jax.Array, kx: int):
    """Find the table rows holding keys qkey0+j (j < kx).

    qkey0: (G, M) int32 linear key of each group's first x-tap (computed
    arithmetically; may be out of range -- caller masks with in-bounds).
    Returns (starts (G, M) int32, pos (G, kx, M) int32, found (G, kx, M)
    bool): present taps live at feature rows starts + pos[j].
    """
    G, M = qkey0.shape
    nz, ny, nx = in_st.spatial_shape
    total = in_st.batch_size * nz * ny * nx

    if total <= DENSE_LOOKUP_MAX_CELLS:
        # table covers cells [-kx, total + kx) (shifted by kx) so slices
        # that straddle the grid ends stay in bounds; the extra dead slot
        # at the end absorbs padding rows.
        tsize = total + 2 * kx + 1
        scat = jnp.where(in_st.valid, in_st.keys + kx, tsize - 1)
        table = jnp.full((tsize,), -1, jnp.int32).at[scat].set(
            jnp.arange(in_st.capacity, dtype=jnp.int32)
        )
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,),
        )
        # clip keeps garbage queries (overflowed padding keys) in range;
        # their hits are discarded by the callers' in-bounds masks.
        start_q = jnp.clip(qkey0 + kx, 0, tsize - kx)
        rows = jax.lax.gather(
            table, start_q.reshape(G * M, 1), dimension_numbers=dn,
            slice_sizes=(kx,), mode="clip",
        ).reshape(G, M, kx)  # rows[g, m, j] = feature row of key qkey0+j, or -1
        rows = rows.transpose(0, 2, 1)  # (G, kx, M)
        found = rows >= 0
        big = jnp.int32(2**30)
        starts = jnp.min(jnp.where(found, rows, big), axis=1)  # (G, M)
        starts = jnp.where(starts == big, 0, starts)
        pos = jnp.clip(rows - starts[:, None, :], 0, kx - 1)
        return starts, pos, found

    # sorted-search path: one searchsorted per group; present members of
    # the integer run occupy consecutive rows starting at the insertion
    # point of the first tap.
    r0 = jnp.searchsorted(
        in_st.keys, qkey0.reshape(-1), method="sort"
    ).astype(jnp.int32)
    r0 = jnp.clip(r0, 0, in_st.capacity - 1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,),
    )
    # pad the key table so a slice starting at the last row stays aligned
    keys_pad = jnp.concatenate(
        [in_st.keys, jnp.full((kx,), INT32_MAX, in_st.keys.dtype)]
    )
    kslice = jax.lax.gather(
        keys_pad, r0[:, None], dimension_numbers=dn, slice_sizes=(kx,),
        mode="clip",
    ).reshape(G, M, kx)
    q0 = qkey0
    founds = []
    poss = []
    run = jnp.zeros((G, M), jnp.int32)  # taps found so far = slice position
    for j in range(kx):
        kj = jnp.take_along_axis(kslice, run[..., None], axis=2)[..., 0]
        fj = kj == (q0 + j)
        founds.append(fj)
        poss.append(run)
        run = run + fj.astype(jnp.int32)
    starts = r0.reshape(G, M)
    pos = jnp.stack(poss, axis=1)
    found = jnp.stack(founds, axis=1)
    return starts, pos, found


def subm_rulebook_grouped(st: SparseTensor, kernel_size):
    """Grouped submanifold rulebook. Requires kx == 3 (or any kx; taps
    along x are consecutive by construction). Returns
    (starts (G, N), pos (K, N), found (K, N)) with groups ordered like
    `_kernel_offsets` rows (z-major, then y, then x)."""
    kz, ky, kx = _triple(kernel_size)
    nz, ny, nx = st.spatial_shape
    K = kz * ky * kx
    G = kz * ky
    N = st.capacity
    cz, cy, cx = kz // 2, ky // 2, kx // 2

    zyx = st.coords[:, 1:4]
    dzy = np.array(
        [(dz - cz, dy - cy) for dz in range(kz) for dy in range(ky)], np.int32
    )  # (G, 2)
    # arithmetic key of each group's first x-tap (y-major keys)
    delta = (dzy[:, 1].astype(np.int64) * nz + dzy[:, 0]) * nx - cx
    qkey0 = st.keys[None, :] + jnp.asarray(delta, jnp.int32)[:, None]  # (G, N)

    starts, pos, found = _grouped_lookup(st, qkey0, kx)

    # in-bounds masks per tap
    z = zyx[:, 0][None, :] + jnp.asarray(dzy[:, 0])[:, None]
    y = zyx[:, 1][None, :] + jnp.asarray(dzy[:, 1])[:, None]
    inb_zy = (z >= 0) & (z < nz) & (y >= 0) & (y < ny) & st.valid[None, :]
    xs = zyx[:, 2][None, None, :] + (
        jnp.arange(kx, dtype=jnp.int32) - cx
    )[None, :, None]  # (1, kx, N)
    inb = inb_zy[:, None, :] & (xs >= 0) & (xs < nx)
    found = found & inb
    return starts, pos.reshape(K, N), found.reshape(K, N)


def conv_rulebook_grouped(
    in_st: SparseTensor, out_coords: jax.Array, out_valid: jax.Array,
    kernel_size, stride, padding,
):
    """Grouped gather rulebook for a strided conv (in = out*s - p + off);
    the kx x-taps hit consecutive input keys for any stride."""
    k, s, p = _triple(kernel_size), _triple(stride), _triple(padding)
    kz, ky, kx = k
    nz, ny, nx = in_st.spatial_shape
    K = kz * ky * kx
    G = kz * ky
    M = out_coords.shape[0]

    in_z0 = out_coords[:, 1] * s[0] - p[0]
    in_y0 = out_coords[:, 2] * s[1] - p[1]
    in_x0 = out_coords[:, 3] * s[2] - p[2]
    dzy = np.array([(dz, dy) for dz in range(kz) for dy in range(ky)], np.int32)
    z = in_z0[None, :] + jnp.asarray(dzy[:, 0])[:, None]  # (G, M)
    y = in_y0[None, :] + jnp.asarray(dzy[:, 1])[:, None]
    b = out_coords[:, 0][None, :]
    # arithmetic linear key of the first x-tap (y-major; may be out of range)
    qkey0 = (((b * ny + y) * nz + z) * nx + in_x0[None, :]).astype(jnp.int32)

    starts, pos, found = _grouped_lookup(in_st, qkey0, kx)

    inb_zy = (z >= 0) & (z < nz) & (y >= 0) & (y < ny) & out_valid[None, :]
    xs = in_x0[None, None, :] + jnp.arange(kx, dtype=jnp.int32)[None, :, None]
    inb = inb_zy[:, None, :] & (xs >= 0) & (xs < nx)
    found = found & inb
    return starts, pos.reshape(K, M), found.reshape(K, M)


def apply_rulebook_matmul_grouped(
    features: jax.Array, starts: jax.Array, pos: jax.Array, found: jax.Array,
    weights: jax.Array,
) -> jax.Array:
    """Grouped-slice version of `apply_rulebook_matmul`.

    features (N, Cin); starts (G, M); pos/found (K, M) with K = G*kx;
    weights (K, Cin, Cout). Fetches one contiguous kx-row slice per
    (group, output) and routes slice rows to kernel taps via `pos`.
    """
    G, M = starts.shape
    K = weights.shape[0]
    kx = K // G
    C = features.shape[1]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3), collapsed_slice_dims=(), start_index_map=(0,),
    )
    # pad so a slice starting at the last feature row stays aligned
    feats_pad = jnp.concatenate(
        [features, jnp.zeros((kx, C), features.dtype)], axis=0
    )
    starts_c = jnp.clip(starts, 0, features.shape[0])
    S = jax.lax.gather(
        feats_pad, starts_c[..., None], dimension_numbers=dn,
        slice_sizes=(kx, C), mode="clip",
    )  # (G, M, kx, C)
    pos_g = pos.reshape(G, kx, M)
    found_g = found.reshape(G, kx, M)
    # route slice row pos[j] to tap j: one-hot over the kx slice rows
    onehot = (
        (pos_g[:, :, :, None] == jnp.arange(kx, dtype=pos.dtype))
        & found_g[:, :, :, None]
    ).astype(features.dtype)  # (G, kx_tap, M, kx_row)
    contrib = jnp.einsum("gjmr,gmrc->gjmc", onehot, S)  # (G, kx, M, C)
    return jax.lax.dot_general(
        contrib.reshape(K, M, C),
        weights,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).sum(axis=0)


def _unique_capped(
    cand_keys: jax.Array, capacity: int, total_cells: int | None = None,
    cells_per_batch: int | None = None, batch_size: int = 1,
) -> tuple[jax.Array, jax.Array]:
    """Sorted-unique with static capacity.

    cand_keys: (M,) int32 (INT32_MAX = invalid). Returns (keys, nnz):
    keys (capacity,) sorted ascending with INT32_MAX padding.

    When `batch_size > 1` (and `cells_per_batch` is given), the capacity
    is allocated PER FRAME (capacity // batch_size slots each) instead of
    globally. Keys are batch-major, so a global cap would let frame 0's
    overflow consume frame 1's budget — at B=2 on real KITTI frames this
    silently starved slot 1 of conv output sites (x_conv3 split 21461 /
    10539 against a 2x16000 cap) and zeroed its detections. Per-frame
    allocation matches the reference, where spconv output sites are
    unbounded and every *_capacity in this engine is per-frame scaled by B.

    A scatter-min first-occurrence dense-table path exists below but
    measured SLOWER than the sort on v5e (TPU scatter-min with collisions
    serializes), so it is disabled; kept for reference/benchmarks.
    """
    use_dense_dedup = False
    if use_dense_dedup and total_cells is not None and total_cells <= DENSE_LOOKUP_MAX_CELLS:
        M = cand_keys.shape[0]
        ok = cand_keys != INT32_MAX
        scat = jnp.where(ok, cand_keys, total_cells)
        table = jnp.full((total_cells + 1,), jnp.iinfo(jnp.int32).max, jnp.int32)
        table = table.at[scat].min(jnp.arange(M, dtype=jnp.int32))
        winner = ok & (table[scat] == jnp.arange(M, dtype=jnp.int32))
        rank = jnp.cumsum(winner.astype(jnp.int32)) - 1
        out = jnp.full((capacity + 1,), INT32_MAX, jnp.int32)
        out = out.at[jnp.where(winner & (rank < capacity), rank, capacity)].min(
            jnp.where(winner, cand_keys, INT32_MAX)
        )[:capacity]
        out = jnp.sort(out)  # capacity-sized sort, not M-sized
        nnz = jnp.minimum(winner.sum(), capacity)
        return out, nnz.astype(jnp.int32)

    skey = jnp.sort(cand_keys)
    first = jnp.concatenate([jnp.array([True]), skey[1:] != skey[:-1]])
    first = first & (skey != INT32_MAX)
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    if batch_size > 1 and cells_per_batch is not None:
        per_cap = capacity // batch_size
        bidx = jnp.clip(skey // cells_per_batch, 0, batch_size - 1)
        # start rank of each frame's uniques: keys are sorted batch-major,
        # so frame boundaries are searchsorted positions (a TPU scatter-add
        # into batch_size bins serializes on its ~8N collisions)
        bounds = jnp.arange(batch_size, dtype=jnp.int32) * jnp.int32(
            cells_per_batch
        )
        pos = jnp.searchsorted(skey, bounds, side="left")
        csum = rank + 1  # unique count among skey[:i+1]
        start = jnp.where(pos > 0, csum[jnp.maximum(pos - 1, 0)], 0)
        keep = first & ((rank - start[bidx]) < per_cap)
        out_rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
        out = jnp.full((capacity + 1,), INT32_MAX, dtype=jnp.int32)
        scat = jnp.where(keep, out_rank, capacity)
        out = out.at[scat].min(jnp.where(keep, skey, INT32_MAX))[:capacity]
        nnz = keep.sum().astype(jnp.int32)
        return out, nnz
    out = jnp.full((capacity + 1,), INT32_MAX, dtype=jnp.int32)
    scat = jnp.where(first & (rank < capacity), rank, capacity)
    out = out.at[scat].min(jnp.where(first, skey, INT32_MAX))
    out = out[:capacity]
    nnz = jnp.minimum(jnp.where(jnp.any(first), rank[-1] + 1, 0), capacity)
    return out, nnz.astype(jnp.int32)


def conv_output_sites(
    st: SparseTensor, kernel_size, stride, padding, out_capacity: int
):
    """Output coordinate set of a strided sparse conv: every out site whose
    receptive field touches >= 1 active input. Returns (keys, coords, nnz,
    out_shape).

    Candidates are enumerated as the per-axis contiguous range
    o in [ceil((in+p-k+1)/s), floor((in+p)/s)] -- ceil(k/s) values per
    axis (2 for the k=3/s=2 backbone convs), so the dedup sorts
    prod(ceil(k/s)) * N = 8N candidates instead of the naive 27N.
    """
    k, s, p = _triple(kernel_size), _triple(stride), _triple(padding)
    out_shape = _conv_out_shape(st.spatial_shape, kernel_size, stride, padding)
    n_cand = [int(-(-k[i] // s[i])) for i in range(3)]  # ceil(k/s) per axis

    zyx = st.coords[:, 1:4]
    lo = []
    hi = []
    for i in range(3):
        a = zyx[:, i] + p[i] - k[i] + 1
        lo.append(-((-a) // s[i]))                     # ceil(a / s)
        hi.append((zyx[:, i] + p[i]) // s[i])          # floor((in+p)/s)
    per_axis = []
    for i in range(3):
        r = lo[i][None, :] + jnp.arange(n_cand[i], dtype=jnp.int32)[:, None]  # (ci, N)
        oki = (r <= hi[i][None, :]) & (r >= 0) & (r < out_shape[i])
        per_axis.append((r, oki))

    cz, cy, cx = n_cand
    rz, okz = per_axis[0]
    ry, oky = per_axis[1]
    rx, okx = per_axis[2]
    # combine: (cz, cy, cx, N)
    out_z = jnp.broadcast_to(rz[:, None, None, :], (cz, cy, cx, rz.shape[1]))
    out_y = jnp.broadcast_to(ry[None, :, None, :], (cz, cy, cx, ry.shape[1]))
    out_x = jnp.broadcast_to(rx[None, None, :, :], (cz, cy, cx, rx.shape[1]))
    ok = (
        okz[:, None, None, :] & oky[None, :, None, :] & okx[None, None, :, :]
        & st.valid[None, None, None, :]
    )
    b = jnp.broadcast_to(st.coords[None, None, None, :, 0], ok.shape)
    cand = jnp.stack([b, out_z, out_y, out_x], axis=-1).reshape(-1, 4)
    cand = jnp.where(ok.reshape(-1)[:, None], cand, -1)
    cand_keys = linear_key(cand, out_shape, st.batch_size)
    cells = out_shape[0] * out_shape[1] * out_shape[2]
    total = st.batch_size * cells
    keys, nnz = _unique_capped(
        cand_keys, out_capacity, total_cells=total,
        cells_per_batch=cells, batch_size=st.batch_size,
    )
    coords = key_to_coords(keys, out_shape)
    return keys, coords, nnz, out_shape


def conv_rulebook(
    in_st: SparseTensor, out_coords: jax.Array, out_valid: jax.Array,
    kernel_size, stride, padding, cache: dict | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Gather rulebook for a regular (strided) conv: for each out site and
    offset, index of the contributing input (in = out*s - p + off)."""
    k, s, p = _triple(kernel_size), _triple(stride), _triple(padding)
    offsets = jnp.asarray(_kernel_offsets(kernel_size))
    nz, ny, nx = in_st.spatial_shape
    in_zyx = (
        out_coords[None, :, 1:4] * jnp.asarray(s, jnp.int32)[None, None, :]
        - jnp.asarray(p, jnp.int32)[None, None, :]
        + offsets[:, None, :]
    )  # (K, M, 3)
    inb = (
        (in_zyx[..., 0] >= 0) & (in_zyx[..., 0] < nz)
        & (in_zyx[..., 1] >= 0) & (in_zyx[..., 1] < ny)
        & (in_zyx[..., 2] >= 0) & (in_zyx[..., 2] < nx)
        & out_valid[None, :]
    )
    b = jnp.broadcast_to(out_coords[None, :, 0], inb.shape)
    q = jnp.concatenate([b[..., None], in_zyx], axis=-1).reshape(-1, 4)
    q = jnp.where(inb.reshape(-1)[:, None], q, -1)
    qkeys = linear_key(q, in_st.spatial_shape, in_st.batch_size)
    idx, found = lookup_in(in_st, qkeys, cache)
    K = offsets.shape[0]
    return idx.reshape(K, -1), found.reshape(K, -1)


def transpose_output_sites(st: SparseTensor, kernel_size, stride, padding, out_capacity: int):
    """Output sites of SparseConvTranspose3d: out = in*s - p + off."""
    k, s, p = _triple(kernel_size), _triple(stride), _triple(padding)
    out_shape = _transpose_out_shape(st.spatial_shape, kernel_size, stride, padding)
    offsets = jnp.asarray(_kernel_offsets(kernel_size))
    out_zyx = (
        st.coords[None, :, 1:4] * jnp.asarray(s, jnp.int32)[None, None, :]
        - jnp.asarray(p, jnp.int32)[None, None, :]
        + offsets[:, None, :]
    )
    inb = jnp.all(
        (out_zyx >= 0) & (out_zyx < jnp.asarray(out_shape, jnp.int32)[None, None, :]),
        axis=-1,
    ) & st.valid[None, :]
    b = jnp.broadcast_to(st.coords[None, :, 0], inb.shape)
    cand = jnp.concatenate([b[..., None], out_zyx], axis=-1).reshape(-1, 4)
    cand = jnp.where(inb.reshape(-1)[:, None], cand, -1)
    cand_keys = linear_key(cand, out_shape, st.batch_size)
    cells = out_shape[0] * out_shape[1] * out_shape[2]
    total = st.batch_size * cells
    keys, nnz = _unique_capped(
        cand_keys, out_capacity, total_cells=total,
        cells_per_batch=cells, batch_size=st.batch_size,
    )
    coords = key_to_coords(keys, out_shape)
    return keys, coords, nnz, out_shape


def transpose_rulebook(
    in_st: SparseTensor, out_coords: jax.Array, out_valid: jax.Array,
    kernel_size, stride, padding,
) -> tuple[jax.Array, jax.Array]:
    """Gather rulebook for transpose conv: in = (out + p - off) / s."""
    k, s, p = _triple(kernel_size), _triple(stride), _triple(padding)
    offsets = jnp.asarray(_kernel_offsets(kernel_size))
    nz, ny, nx = in_st.spatial_shape
    num = (
        out_coords[None, :, 1:4]
        + jnp.asarray(p, jnp.int32)[None, None, :]
        - offsets[:, None, :]
    )
    div = jnp.asarray(s, jnp.int32)[None, None, :]
    ok = (num >= 0) & (num % div == 0)
    in_zyx = num // div
    ok = jnp.all(
        ok & (in_zyx < jnp.asarray((nz, ny, nx), jnp.int32)[None, None, :]), axis=-1
    ) & out_valid[None, :]
    b = jnp.broadcast_to(out_coords[None, :, 0], ok.shape)
    q = jnp.concatenate([b[..., None], in_zyx], axis=-1).reshape(-1, 4)
    q = jnp.where(ok.reshape(-1)[:, None], q, -1)
    qkeys = linear_key(q, in_st.spatial_shape, in_st.batch_size)
    idx, found = lookup_in(in_st, qkeys)
    K = offsets.shape[0]
    return idx.reshape(K, -1), found.reshape(K, -1)


def apply_rulebook_matmul(
    features: jax.Array, in_idx: jax.Array, found: jax.Array, weights: jax.Array
) -> jax.Array:
    """out[n] = sum_k features[in_idx[k, n]] * found[k, n] @ weights[k].

    features: (N, Cin); in_idx/found: (K, M); weights: (K, Cin, Cout).
    The K gathered matmuls are what lands on the MXU.
    """
    gathered = features[in_idx]  # (K, M, Cin)
    gathered = jnp.where(found[..., None], gathered, 0.0)
    return jax.lax.dot_general(
        gathered,
        weights,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).sum(axis=0)


def apply_rulebook_max(
    features: jax.Array, in_idx: jax.Array, found: jax.Array
) -> jax.Array:
    """Max-pool over rulebook neighbors; empty sites yield 0."""
    gathered = features[in_idx]  # (K, M, C)
    neg = jnp.finfo(features.dtype).min
    gathered = jnp.where(found[..., None], gathered, neg)
    out = jnp.max(gathered, axis=0)
    any_found = jnp.any(found, axis=0)
    return jnp.where(any_found[:, None], out, 0.0)


def apply_rulebook_sum_grouped(
    features: jax.Array, starts: jax.Array, pos: jax.Array, found: jax.Array
) -> jax.Array:
    """Grouped-slice neighbor sum (constant-weight conv)."""
    G, M = starts.shape
    K = found.shape[0]
    kx = K // G
    C = features.shape[1]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3), collapsed_slice_dims=(), start_index_map=(0,),
    )
    feats_pad = jnp.concatenate(
        [features, jnp.zeros((kx, C), features.dtype)], axis=0
    )
    starts_c = jnp.clip(starts, 0, features.shape[0])
    S = jax.lax.gather(
        feats_pad, starts_c[..., None], dimension_numbers=dn,
        slice_sizes=(kx, C), mode="clip",
    )  # (G, M, kx, C)
    pos_g = pos.reshape(G, kx, M)
    found_g = found.reshape(G, kx, M)
    row_used = jnp.zeros((G, M, kx), features.dtype)
    for j in range(kx):
        row_used = row_used + (
            (pos_g[:, j, :, None] == jnp.arange(kx)) & found_g[:, j, :, None]
        ).astype(features.dtype)
    return jnp.einsum("gmr,gmrc->mc", row_used, S)


def apply_rulebook_max_grouped(
    features: jax.Array, starts: jax.Array, pos: jax.Array, found: jax.Array
) -> jax.Array:
    """Grouped-slice max-pool (see apply_rulebook_matmul_grouped). Since
    max is permutation-invariant, slice rows need no tap routing -- any
    slice row whose tap is found participates."""
    G, M = starts.shape
    K = found.shape[0]
    kx = K // G
    C = features.shape[1]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3), collapsed_slice_dims=(), start_index_map=(0,),
    )
    feats_pad = jnp.concatenate(
        [features, jnp.zeros((kx, C), features.dtype)], axis=0
    )
    starts_c = jnp.clip(starts, 0, features.shape[0])
    S = jax.lax.gather(
        feats_pad, starts_c[..., None], dimension_numbers=dn,
        slice_sizes=(kx, C), mode="clip",
    )  # (G, M, kx, C)
    pos_g = pos.reshape(G, kx, M)
    found_g = found.reshape(G, kx, M)
    # slice row r participates iff some found tap maps to it
    row_used = jnp.zeros((G, M, kx), bool)
    for j in range(kx):
        row_used = row_used | (
            (pos_g[:, j, :, None] == jnp.arange(kx)) & found_g[:, j, :, None]
        )
    neg = jnp.finfo(features.dtype).min
    S = jnp.where(row_used[..., None], S, neg)
    out = jnp.max(S, axis=2)  # (G, M, C)
    out = jnp.max(out, axis=0)  # (M, C)
    any_found = jnp.any(found, axis=0)
    return jnp.where(any_found[:, None], out, 0.0)


# ------------------------------------------------- fused Pallas bridge
#
# Forward runs the windowed sorted-match kernel (pallas_conv.py);
# backward differentiates the equivalent XLA rulebook expression (the
# rulebook args are unused by the primal, so XLA dead-code-eliminates
# their construction in inference programs).

# (T, WIN, NBLOCKS) sizing, from the measured per-(group, tile) dual-
# window requirement W* on flagship-occupancy frames under Y-MAJOR keys
# (dy tap groups -- see pallas_conv.qkeys_subm; dual anchor covers a
# contiguous [min,max] match-rank interval of up to ~NB*WIN - 2*WIN
# rounding rows).  Kernel FLOPs scale with NB*WIN per T output rows, so
# larger tiles amortize the block rounding -- but only where the span
# stays bounded:
#   subm    T=256 NB=6: audited span_max 363 ((dz,dy) groups; dy groups
#           add at most a few z-lines) <= coverage, ZERO dropped;
#           window-rows/tile ratio 3 (vs 4 at T=128/NB=4).
#   strided T=256 NB=6: FAILS -- stride-2 queries spread 256 outputs over
#           ~2x input rows; audited span_max 943 > 768 coverage, 15.4k
#           dropped matches (/tmp audit 2026-08-19).  Strided stays
#           T=128 (W*max ~116, 2.2x headroom).
# (z-major needed W* ~709 at L3 -- unboundable; see module docstring.)
# tools/audit_caps.py asserts zero overflow at these sizes.
_PALLAS_SUBM_CFG = (256, 128, 6)
_PALLAS_STRIDED_CFG = (128, 128, 6)


def _pallas_supported(kernel_size, cout) -> bool:
    kz, ky, kx = _triple(kernel_size)
    return kz * kx <= pallas_conv.TAP_PAD and cout <= 128


def _chunked_pallas_conv(features, keys, qk, weights, G, TPG, T, WIN, NB, M,
                         perm=None):
    """Channel-chunked fused conv: tables hold <= 128 lanes, so wide
    inputs (e.g. down_combine's 3-way concat) are split and summed.
    perm: static canonical->qk tap reorder (pallas_conv.tap_perm)."""
    Cin = features.shape[1]
    out = None
    for c0 in range(0, Cin, 128):
        c1 = min(c0 + 128, Cin)
        o = pallas_conv._conv_fwd(
            features[:, c0:c1], keys, qk, weights[:, c0:c1, :],
            G=G, TPG=TPG, T=T, WIN=WIN, NB=NB, M=M, perm=perm)
        out = o if out is None else out + o
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pallas_subm_ad(cfg, features, weights, qk, in_keys):
    """Fully-Pallas submanifold conv: forward AND backward run the
    windowed sorted-match kernels -- no XLA rulebook is built at all
    (the transpose of a subm conv is a subm conv with tap-reversed,
    transposed weights over the same query keys; dW accumulates
    AL^T @ g in the dw kernel). Weights are canonical (dz, dy, dx)
    order; cfg carries the static tap perm into qk order."""
    G, TPG, T, WIN, NB, M, perm = cfg
    return _chunked_pallas_conv(features, in_keys, qk, weights, G, TPG, T,
                                WIN, NB, M, perm)


def _pallas_subm_ad_fwd(cfg, features, weights, qk, in_keys):
    out = _pallas_subm_ad(cfg, features, weights, qk, in_keys)
    return out, (features, weights, qk, in_keys)


def _pallas_subm_ad_bwd(cfg, res, g):
    G, TPG, T, WIN, NB, M, perm = cfg
    features, weights, qk, in_keys = res
    Cin = features.shape[1]
    dfs, dws = [], []
    for c0 in range(0, Cin, 128):
        c1 = min(c0 + 128, Cin)
        df_c, dw_c = pallas_conv.subm_conv_bwd(
            features[:, c0:c1], in_keys, qk, weights[:, c0:c1, :], g,
            G=G, TPG=TPG, T=T, WIN=WIN, NB=NB, M=M, perm=perm)
        dfs.append(df_c)
        dws.append(dw_c)
    df = jnp.concatenate(dfs, axis=1) if len(dfs) > 1 else dfs[0]
    dw = jnp.concatenate(dws, axis=1) if len(dws) > 1 else dws[0]
    return df, dw, None, None


_pallas_subm_ad.defvjp(_pallas_subm_ad_fwd, _pallas_subm_ad_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pallas_strided_ad(cfg, features, weights, qk, in_keys, out_keys, in_coords):
    """Fully-Pallas strided conv: backward runs the transpose-query conv
    + dw kernels (see pallas_conv.strided_conv_bwd) -- no XLA rulebook.
    cfg = (G, TPG, T, WIN, NB, M, out_shape, batch, kernel, stride, pad,
    perm) with perm the static canonical->qk tap reorder.
    """
    G, TPG, T, WIN, NB, M = cfg[:6]
    return _chunked_pallas_conv(features, in_keys, qk, weights, G, TPG, T,
                                WIN, NB, M, cfg[11])


def _pallas_strided_ad_fwd(cfg, features, weights, qk, in_keys, out_keys, in_coords):
    out = _pallas_strided_ad(cfg, features, weights, qk, in_keys, out_keys, in_coords)
    return out, (features, weights, qk, in_keys, out_keys, in_coords)


def _pallas_strided_ad_bwd(cfg, res, g):
    G, TPG, T, WIN, NB, M, out_shape, batch, k, s, p, perm = cfg
    features, weights, qk, in_keys, out_keys, in_coords = res
    in_valid = in_keys != INT32_MAX
    Cin = features.shape[1]
    dfs, dws = [], []
    for c0 in range(0, Cin, 128):
        c1 = min(c0 + 128, Cin)
        df_c, dw_c = pallas_conv.strided_conv_bwd(
            features[:, c0:c1], in_keys, qk, weights[:, c0:c1, :], g,
            out_keys, in_coords, in_valid, out_shape, batch, k, s, p,
            G=G, TPG=TPG, T=T, WIN=WIN, NB=NB, perm=perm)
        dfs.append(df_c)
        dws.append(dw_c)
    df = jnp.concatenate(dfs, axis=1) if len(dfs) > 1 else dfs[0]
    dw = jnp.concatenate(dws, axis=1) if len(dws) > 1 else dws[0]
    return df, dw, None, None, None, None


_pallas_strided_ad.defvjp(_pallas_strided_ad_fwd, _pallas_strided_ad_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pallas_conv_ad(cfg, features, weights, qk, in_keys, rb_idx, rb_found):
    """Pallas forward, XLA-rulebook backward; weights canonical order
    (the rulebook bwd differentiates the canonical expression, so only
    the primal permutes)."""
    G, TPG, T, WIN, NB, M, perm = cfg
    return _chunked_pallas_conv(features, in_keys, qk, weights, G, TPG, T,
                                WIN, NB, M, perm)


def _pallas_conv_ad_fwd(cfg, features, weights, qk, in_keys, rb_idx, rb_found):
    out = _pallas_conv_ad(cfg, features, weights, qk, in_keys, rb_idx, rb_found)
    return out, (features, weights, rb_idx, rb_found)


def _pallas_conv_ad_bwd(cfg, res, g):
    features, weights, rb_idx, rb_found = res
    _, vjp = jax.vjp(
        lambda f, w: apply_rulebook_matmul(f, rb_idx, rb_found, w),
        features, weights,
    )
    df, dw = vjp(g)
    return df, dw, None, None, None, None


_pallas_conv_ad.defvjp(_pallas_conv_ad_fwd, _pallas_conv_ad_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pallas_pool_ad(cfg, features, qk, in_keys, rb_idx, rb_found):
    G, TPG, T, WIN, NB, M, mode = cfg
    return pallas_conv.fused_pool(
        features, in_keys, qk, G, TPG, mode=mode, T=T, WIN=WIN, NB=NB, M=M)


def _pallas_pool_ad_fwd(cfg, features, qk, in_keys, rb_idx, rb_found):
    out = _pallas_pool_ad(cfg, features, qk, in_keys, rb_idx, rb_found)
    return out, (features, rb_idx, rb_found)


def _pallas_pool_ad_bwd(cfg, res, g):
    mode = cfg[-1]
    features, rb_idx, rb_found = res
    if mode == "max":
        ref = lambda f: apply_rulebook_max(f, rb_idx, rb_found)
    else:
        ref = lambda f: jnp.where(
            rb_found[..., None], f[rb_idx], 0.0).sum(axis=0)
    _, vjp = jax.vjp(ref, features)
    (df,) = vjp(g)
    return df, None, None, None, None


_pallas_pool_ad.defvjp(_pallas_pool_ad_fwd, _pallas_pool_ad_bwd)


def _pallas_subm_qk(st: SparseTensor, kernel_size, cache, key, T):
    return pallas_conv.cached_qk_subm(
        st.coords, st.valid, st.spatial_shape, st.batch_size, kernel_size, T,
        cache, key)


def _pallas_conv_qk(in_st: SparseTensor, out_coords, out_valid, kernel_size,
                    stride, padding, cache, key, T, transpose=False):
    return pallas_conv.cached_qk_conv(
        out_coords, out_valid, in_st.spatial_shape, in_st.batch_size,
        kernel_size, stride, padding, T, transpose=transpose, cache=cache,
        cache_key=key)


# --------------------------------------------------------------- modules


def _use_grouped(kernel_size) -> bool:
    return GROUPED_X_GATHER and _triple(kernel_size)[2] == 3


def _get_sites(cache, key, st, kernel_size, stride, padding, cap):
    """Output-site set of a strided conv, cached under ("sites", key)
    with the pre-conv coords recorded for SparseInverseConv3d."""
    ck = ("sites", key)
    if cache is not None and key and ck in cache:
        return cache[ck]
    sites = conv_output_sites(st, kernel_size, stride, padding, cap)
    if cache is not None and key:
        cache[ck] = sites
        cache[("pre", key)] = (st.keys, st.coords, st.nnz, st.spatial_shape)
    return sites


def _get_conv_rulebook(cache, key, st, out_coords, out_valid,
                       kernel_size, stride, padding, grouped):
    ck = ("rb_g" if grouped else "rb", key)
    if cache is not None and key and ck in cache:
        return cache[ck]
    if grouped:
        rb = conv_rulebook_grouped(
            st, out_coords, out_valid, kernel_size, stride, padding)
    else:
        rb = conv_rulebook(
            st, out_coords, out_valid, kernel_size, stride, padding, cache)
    if cache is not None and key:
        cache[ck] = rb
    return rb


class SubMConv3d(nn.Module):
    """Submanifold sparse conv (spconv.SubMConv3d equivalent)."""

    out_channels: int
    kernel_size: Any = 3
    indice_key: str | None = None
    use_bias: bool = False

    @nn.compact
    def __call__(self, st: SparseTensor, cache: dict | None = None) -> SparseTensor:
        K = int(np.prod(_triple(self.kernel_size)))
        cin = st.features.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (K, cin, self.out_channels),
        )
        if use_pallas("subm") and _pallas_supported(self.kernel_size, self.out_channels):
            T, WIN, NB = _PALLAS_SUBM_CFG
            qk, G, TPG = _pallas_subm_qk(st, self.kernel_size, cache, self.indice_key, T)
            out = _pallas_subm_ad(
                (G, TPG, T, WIN, NB, st.capacity,
                 pallas_conv.tap_perm(self.kernel_size)),
                st.features, w, qk, st.keys)
        elif (pallas_conv._OVERFLOW_SINK is not None
              and _pallas_supported(self.kernel_size, self.out_channels)):
            # capacity audit on a non-TPU backend: report the overflow the
            # fused kernel WOULD see, then run the XLA engine as usual
            T, WIN, NB = _PALLAS_SUBM_CFG
            qk, G, TPG = _pallas_subm_qk(st, self.kernel_size, cache, self.indice_key, T)
            pallas_conv.audit_overflow(st.keys, qk, WIN, NB, T,
                                       tag=f"subm:{self.indice_key or self.name}")
            in_idx, found = subm_rulebook(st, self.kernel_size, cache)
            out = apply_rulebook_matmul(st.features, in_idx, found, w)
        else:
            grouped = _use_grouped(self.kernel_size)
            rb_key = ("subm_g" if grouped else "subm", self.indice_key)
            if cache is not None and self.indice_key and rb_key in cache:
                rb = cache[rb_key]
            else:
                if grouped:
                    rb = subm_rulebook_grouped(st, self.kernel_size)
                else:
                    rb = subm_rulebook(st, self.kernel_size, cache)
                if cache is not None and self.indice_key:
                    cache[rb_key] = rb
            if grouped:
                starts, pos, found = rb
                out = apply_rulebook_matmul_grouped(st.features, starts, pos, found, w)
            else:
                in_idx, found = rb
                out = apply_rulebook_matmul(st.features, in_idx, found, w)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            out = out + b
        out = jnp.where(st.valid[:, None], out, 0.0)
        return st.replace(features=out.astype(st.features.dtype))


class SparseConv3d(nn.Module):
    """Strided ("regular") sparse conv; generates new output sites and
    records them under `indice_key` for SparseInverseConv3d reuse."""

    out_channels: int
    kernel_size: Any = 3
    stride: Any = 1
    padding: Any = 0
    indice_key: str | None = None
    use_bias: bool = False
    out_capacity: int | None = None  # default: same as input capacity

    @nn.compact
    def __call__(self, st: SparseTensor, cache: dict | None = None) -> SparseTensor:
        K = int(np.prod(_triple(self.kernel_size)))
        cin = st.features.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (K, cin, self.out_channels),
        )
        cap = self.out_capacity or st.capacity
        keys, coords, nnz, out_shape = _get_sites(
            cache, self.indice_key, st, self.kernel_size, self.stride,
            self.padding, cap,
        )
        if (pallas_conv._OVERFLOW_SINK is not None
                and not use_pallas("conv")
                and _pallas_supported(self.kernel_size, self.out_channels)):
            T, WIN, NB = _PALLAS_STRIDED_CFG
            qk_a, _, _ = _pallas_conv_qk(
                st, coords, keys != INT32_MAX, self.kernel_size, self.stride,
                self.padding, cache, self.indice_key, T)
            pallas_conv.audit_overflow(st.keys, qk_a, WIN, NB, T,
                                       tag=f"conv:{self.indice_key or self.name}")
        if use_pallas("conv") and _pallas_supported(self.kernel_size, self.out_channels):
            T, WIN, NB = _PALLAS_STRIDED_CFG
            qk, G, TPG = _pallas_conv_qk(
                st, coords, keys != INT32_MAX, self.kernel_size, self.stride,
                self.padding, cache, self.indice_key, T)
            out_shape = _conv_out_shape(
                st.spatial_shape, self.kernel_size, self.stride, self.padding)
            out = _pallas_strided_ad(
                (G, TPG, T, WIN, NB, keys.shape[0],
                 tuple(int(x) for x in out_shape), st.batch_size,
                 _triple(self.kernel_size), _triple(self.stride),
                 _triple(self.padding),
                 pallas_conv.tap_perm(self.kernel_size)),
                st.features, w, qk, st.keys, keys, st.coords)
        else:
            grouped = _use_grouped(self.kernel_size)
            rb = _get_conv_rulebook(
                cache, self.indice_key, st, coords, keys != INT32_MAX,
                self.kernel_size, self.stride, self.padding, grouped,
            )
            if grouped:
                starts, pos, found = rb
                out = apply_rulebook_matmul_grouped(st.features, starts, pos, found, w)
            else:
                in_idx, found = rb
                out = apply_rulebook_matmul(st.features, in_idx, found, w)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            out = out + b
        out = jnp.where((keys != INT32_MAX)[:, None], out, 0.0)
        return SparseTensor(
            features=out.astype(st.features.dtype),
            coords=coords,
            keys=keys,
            nnz=nnz,
            spatial_shape=tuple(int(x) for x in out_shape),
            batch_size=st.batch_size,
        )


class SparseConvTranspose3d(nn.Module):
    out_channels: int
    kernel_size: Any = 3
    stride: Any = 1
    padding: Any = 0
    indice_key: str | None = None
    use_bias: bool = False
    out_capacity: int | None = None

    @nn.compact
    def __call__(self, st: SparseTensor, cache: dict | None = None) -> SparseTensor:
        K = int(np.prod(_triple(self.kernel_size)))
        cin = st.features.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (K, cin, self.out_channels),
        )
        cap = self.out_capacity or st.capacity
        keys, coords, nnz, out_shape = transpose_output_sites(
            st, self.kernel_size, self.stride, self.padding, cap
        )
        in_idx, found = transpose_rulebook(
            st, coords, keys != INT32_MAX, self.kernel_size, self.stride, self.padding
        )
        out = apply_rulebook_matmul(st.features, in_idx, found, w)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            out = out + b
        out = jnp.where((keys != INT32_MAX)[:, None], out, 0.0)
        return SparseTensor(
            features=out.astype(st.features.dtype),
            coords=coords,
            keys=keys,
            nnz=nnz,
            spatial_shape=tuple(int(x) for x in out_shape),
            batch_size=st.batch_size,
        )


class SparseInverseConv3d(nn.Module):
    """Inverse conv: restores the pre-conv coordinate set recorded under
    `indice_key` by the matching SparseConv3d (spconv indice_key reuse)."""

    out_channels: int
    kernel_size: Any = 3
    indice_key: str = ""
    use_bias: bool = False
    # stride/padding of the forward conv whose key we reuse
    stride: Any = 1
    padding: Any = 0

    @nn.compact
    def __call__(self, st: SparseTensor, cache: dict) -> SparseTensor:
        pre = cache[("pre", self.indice_key)]
        fine_keys, fine_coords, fine_nnz, fine_shape = pre
        K = int(np.prod(_triple(self.kernel_size)))
        cin = st.features.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (K, cin, self.out_channels),
        )
        # fine site f receives coarse c where f = c*s - p + off
        # => c = (f + p - off) / s : exactly the transpose rulebook
        fine_st_like = SparseTensor(
            features=st.features,  # unused for coords math
            coords=st.coords,
            keys=st.keys,
            nnz=st.nnz,
            spatial_shape=st.spatial_shape,
            batch_size=st.batch_size,
        )
        in_idx, found = transpose_rulebook(
            fine_st_like, fine_coords, fine_keys != INT32_MAX,
            self.kernel_size, self.stride, self.padding,
        )
        out = apply_rulebook_matmul(st.features, in_idx, found, w)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            out = out + b
        out = jnp.where((fine_keys != INT32_MAX)[:, None], out, 0.0)
        return SparseTensor(
            features=out.astype(st.features.dtype),
            coords=fine_coords,
            keys=fine_keys,
            nnz=fine_nnz,
            spatial_shape=tuple(int(x) for x in fine_shape),
            batch_size=st.batch_size,
        )


class SparseMaxPool3d(nn.Module):
    kernel_size: Any = 3
    stride: Any = 1
    padding: Any = 0
    indice_key: str | None = None
    out_capacity: int | None = None

    @nn.compact
    def __call__(self, st: SparseTensor, cache: dict | None = None) -> SparseTensor:
        cap = self.out_capacity or st.capacity
        keys, coords, nnz, out_shape = _get_sites(
            cache, self.indice_key, st, self.kernel_size, self.stride,
            self.padding, cap,
        )
        if use_pallas("pool") and _pallas_supported(self.kernel_size, st.features.shape[-1]):
            T, WIN, NB = _PALLAS_STRIDED_CFG
            qk, G, TPG = _pallas_conv_qk(
                st, coords, keys != INT32_MAX, self.kernel_size, self.stride,
                self.padding, cache, self.indice_key, T)
            in_idx, found = _get_conv_rulebook(
                cache, self.indice_key, st, coords, keys != INT32_MAX,
                self.kernel_size, self.stride, self.padding, False)
            out = _pallas_pool_ad(
                (G, TPG, T, WIN, NB, keys.shape[0], "max"),
                st.features, qk, st.keys, in_idx, found)
        else:
            grouped = _use_grouped(self.kernel_size)
            rb = _get_conv_rulebook(
                cache, self.indice_key, st, coords, keys != INT32_MAX,
                self.kernel_size, self.stride, self.padding, grouped,
            )
            if grouped:
                starts, pos, found = rb
                out = apply_rulebook_max_grouped(st.features, starts, pos, found)
            else:
                in_idx, found = rb
                out = apply_rulebook_max(st.features, in_idx, found)
        out = out.astype(st.features.dtype)  # engine-independent dtype
        return SparseTensor(
            features=out,
            coords=coords,
            keys=keys,
            nnz=nnz,
            spatial_shape=tuple(int(x) for x in out_shape),
            batch_size=st.batch_size,
        )


class FixedSparseConv3d(nn.Module):
    """Strided conv with constant (non-learned) weights -- the reference's
    'fixspconv' occ-code downsampler (`spconv_backbone.py:812-828`)."""

    kernel_size: Any = 3
    stride: Any = 1
    padding: Any = 0
    indice_key: str | None = None
    default_value: float = 1.0 / 27
    out_capacity: int | None = None

    @nn.compact
    def __call__(self, st: SparseTensor, cache: dict | None = None) -> SparseTensor:
        cap = self.out_capacity or st.capacity
        keys, coords, nnz, out_shape = _get_sites(
            cache, self.indice_key, st, self.kernel_size, self.stride,
            self.padding, cap,
        )
        if use_pallas("fix") and _pallas_supported(self.kernel_size, st.features.shape[-1]):
            T, WIN, NB = _PALLAS_STRIDED_CFG
            qk, G, TPG = _pallas_conv_qk(
                st, coords, keys != INT32_MAX, self.kernel_size, self.stride,
                self.padding, cache, self.indice_key, T)
            in_idx, found = _get_conv_rulebook(
                cache, self.indice_key, st, coords, keys != INT32_MAX,
                self.kernel_size, self.stride, self.padding, False)
            out = _pallas_pool_ad(
                (G, TPG, T, WIN, NB, keys.shape[0], "sum"),
                st.features, qk, st.keys, in_idx, found) * self.default_value
        else:
            grouped = _use_grouped(self.kernel_size)
            rb = _get_conv_rulebook(
                cache, self.indice_key, st, coords, keys != INT32_MAX,
                self.kernel_size, self.stride, self.padding, grouped,
            )
            if grouped:
                starts, pos, found = rb
                out = apply_rulebook_sum_grouped(
                    st.features, starts, pos, found) * self.default_value
            else:
                in_idx, found = rb
                gathered = st.features[in_idx]
                gathered = jnp.where(found[..., None], gathered, 0.0)
                out = gathered.sum(axis=0) * self.default_value
        out = out.astype(st.features.dtype)  # engine-independent dtype
        return SparseTensor(
            features=out,
            coords=coords,
            keys=keys,
            nnz=nnz,
            spatial_shape=tuple(int(x) for x in out_shape),
            batch_size=st.batch_size,
        )


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over active voxels only (padding rows excluded from the
    statistics). torch-style momentum: new = (1-m)*old + m*batch.
    Defaults match the reference backbones (eps=1e-3, momentum=0.01).
    Set `axis_name` to psum stats across a device mesh (SyncBN)."""

    momentum: float = 0.01
    epsilon: float = 1e-3
    use_running_average: bool | None = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array, use_running_average: bool | None = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((C,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = mask.astype(jnp.float32)
            cnt = jnp.maximum(m.sum(), 1.0)
            xm = x.astype(jnp.float32) * m[:, None]
            if self.axis_name is not None:
                cnt = jax.lax.psum(cnt, self.axis_name)
                mean = jax.lax.psum(xm.sum(axis=0), self.axis_name) / cnt
                var = (
                    jax.lax.psum(
                        (jnp.square(x.astype(jnp.float32) - mean) * m[:, None]).sum(axis=0),
                        self.axis_name,
                    )
                    / cnt
                )
            else:
                mean = xm.sum(axis=0) / cnt
                var = (jnp.square(x.astype(jnp.float32) - mean) * m[:, None]).sum(axis=0) / cnt
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * var
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return jnp.where(mask[:, None], y, 0.0).astype(x.dtype)
