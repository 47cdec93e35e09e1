"""TPU-native sparse 3D convolution engine.

Replaces the reference's external spconv v1.2.1 dependency (used by both
backbones, the occ head and the ROI head; see reference
`btcdet/models/backbones_3d/spconv_backbone.py` and SURVEY.md §2.7) with a
gather-GEMM formulation that is jit-able and static-shape:

  * Active voxels live in capacity-padded tables sorted by a linear
    (batch, z, y, x) key; padding rows carry key INT32_MAX.
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

import itertools
from typing import Any, Sequence

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

INT32_MAX = np.int32(2**31 - 1)


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

    def dense(self) -> jax.Array:
        """-> (B, nz, ny, nx, C) channels-last dense tensor."""
        nz, ny, nx = self.spatial_shape
        C = self.features.shape[-1]
        out = jnp.zeros((self.batch_size * nz * ny * nx, C), dtype=self.features.dtype)
        idx = jnp.where(self.valid, self.keys, self.batch_size * nz * ny * nx)
        out = jnp.concatenate([out, jnp.zeros((1, C), out.dtype)], axis=0)
        out = out.at[idx].set(jnp.where(self.valid[:, None], self.features, 0.0))
        return out[:-1].reshape(self.batch_size, nz, ny, nx, C)

    def replace_features(self, features: jax.Array) -> "SparseTensor":
        return self.replace(features=features)


def linear_key(coords: jax.Array, spatial_shape, batch_size: int) -> jax.Array:
    """(N, 4) (b,z,y,x) -> int32 linear key; rows with b < 0 -> INT32_MAX."""
    nz, ny, nx = spatial_shape
    total = batch_size * nz * ny * nx
    assert total < 2**31 - 1, (
        f"grid {spatial_shape} x batch {batch_size} overflows int32 keys"
    )
    key = ((coords[:, 0] * nz + coords[:, 1]) * ny + coords[:, 2]) * nx + coords[:, 3]
    return jnp.where(coords[:, 0] >= 0, key.astype(jnp.int32), INT32_MAX)


def key_to_coords(keys: jax.Array, spatial_shape) -> jax.Array:
    nz, ny, nx = spatial_shape
    invalid = keys == INT32_MAX
    b = keys // (nz * ny * nx)
    r = keys - b * (nz * ny * nx)
    z = r // (ny * nx)
    r = r - z * (ny * nx)
    y = r // nx
    x = r - y * nx
    coords = jnp.stack([b, z, y, x], axis=-1).astype(jnp.int32)
    return jnp.where(invalid[:, None], -1, coords)


def from_coords(
    features: jax.Array,
    coords: jax.Array,
    spatial_shape,
    batch_size: int,
    *,
    assume_sorted: bool = False,
) -> SparseTensor:
    """Build a SparseTensor from (features, coords); sorts rows by key.

    coords rows with b < 0 are padding.
    """
    spatial_shape = tuple(int(s) for s in spatial_shape)
    keys = linear_key(coords, spatial_shape, batch_size)
    if not assume_sorted:
        order = jnp.argsort(keys)
        keys = keys[order]
        coords = coords[order]
        features = features[order]
    nnz = jnp.sum(keys != INT32_MAX).astype(jnp.int32)
    return SparseTensor(
        features=features,
        coords=coords,
        keys=keys,
        nnz=nnz,
        spatial_shape=spatial_shape,
        batch_size=int(batch_size),
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


def lookup_in(st: "SparseTensor", queries: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Lookup linear-key queries in a SparseTensor's voxel table, picking
    a dense table or sorted search by grid size."""
    nz, ny, nx = st.spatial_shape
    total = st.batch_size * nz * ny * nx
    if total > DENSE_LOOKUP_MAX_CELLS:
        return lookup(st.keys, queries)
    scat = jnp.where(st.valid, st.keys, total)
    table = jnp.full((total + 1,), -1, jnp.int32).at[scat].set(
        jnp.arange(st.capacity, dtype=jnp.int32)
    )
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


def subm_rulebook(st: SparseTensor, kernel_size) -> tuple[jax.Array, jax.Array]:
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
    idx, found = lookup_in(st, qkeys)
    K = offsets.shape[0]
    return idx.reshape(K, -1), found.reshape(K, -1)


def _unique_capped(
    cand_keys: jax.Array, capacity: int, total_cells: int | None = None
) -> tuple[jax.Array, jax.Array]:
    """Sorted-unique with static capacity.

    cand_keys: (M,) int32 (INT32_MAX = invalid). Returns (keys, nnz):
    keys (capacity,) sorted ascending with INT32_MAX padding.

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
    total = st.batch_size * out_shape[0] * out_shape[1] * out_shape[2]
    keys, nnz = _unique_capped(cand_keys, out_capacity, total_cells=total)
    coords = key_to_coords(keys, out_shape)
    return keys, coords, nnz, out_shape


def conv_rulebook(
    in_st: SparseTensor, out_coords: jax.Array, out_valid: jax.Array,
    kernel_size, stride, padding,
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
    idx, found = lookup_in(in_st, qkeys)
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
    total = st.batch_size * out_shape[0] * out_shape[1] * out_shape[2]
    keys, nnz = _unique_capped(cand_keys, out_capacity, total_cells=total)
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


# --------------------------------------------------------------- modules


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
        rb_key = ("subm", self.indice_key)
        if cache is not None and self.indice_key and rb_key in cache:
            in_idx, found = cache[rb_key]
        else:
            in_idx, found = subm_rulebook(st, self.kernel_size)
            if cache is not None and self.indice_key:
                cache[rb_key] = (in_idx, found)
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
        site_key = ("sites", self.indice_key)
        if cache is not None and self.indice_key and site_key in cache:
            keys, coords, nnz, out_shape, in_idx, found = cache[site_key]
        else:
            keys, coords, nnz, out_shape = conv_output_sites(
                st, self.kernel_size, self.stride, self.padding, cap
            )
            in_idx, found = conv_rulebook(
                st, coords, keys != INT32_MAX, self.kernel_size, self.stride, self.padding
            )
            if cache is not None and self.indice_key:
                # record fine-grid coords for the inverse conv
                cache[site_key] = (keys, coords, nnz, out_shape, in_idx, found)
                cache[("pre", self.indice_key)] = (
                    st.keys, st.coords, st.nnz, st.spatial_shape,
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
        site_key = ("sites", self.indice_key)
        if cache is not None and self.indice_key and site_key in cache:
            keys, coords, nnz, out_shape, in_idx, found = cache[site_key]
        else:
            keys, coords, nnz, out_shape = conv_output_sites(
                st, self.kernel_size, self.stride, self.padding, cap
            )
            in_idx, found = conv_rulebook(
                st, coords, keys != INT32_MAX, self.kernel_size, self.stride, self.padding
            )
            if cache is not None and self.indice_key:
                cache[site_key] = (keys, coords, nnz, out_shape, in_idx, found)
                cache[("pre", self.indice_key)] = (
                    st.keys, st.coords, st.nnz, st.spatial_shape,
                )
        out = apply_rulebook_max(st.features, in_idx, found)
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
        site_key = ("sites", self.indice_key)
        if cache is not None and self.indice_key and site_key in cache:
            keys, coords, nnz, out_shape, in_idx, found = cache[site_key]
        else:
            keys, coords, nnz, out_shape = conv_output_sites(
                st, self.kernel_size, self.stride, self.padding, cap
            )
            in_idx, found = conv_rulebook(
                st, coords, keys != INT32_MAX, self.kernel_size, self.stride, self.padding
            )
            if cache is not None and self.indice_key:
                cache[site_key] = (keys, coords, nnz, out_shape, in_idx, found)
        gathered = st.features[in_idx]
        gathered = jnp.where(found[..., None], gathered, 0.0)
        out = gathered.sum(axis=0) * self.default_value
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
