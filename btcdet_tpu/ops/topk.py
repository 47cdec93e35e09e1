"""Large-k top-k selection via radix select, TPU-tuned.

PassOccVox at eval needs the top 40000 of ~263k thresholded occupancy
probabilities per frame (reference `filter_occ_points`,
`add_occ_template.py:94-128`). `lax.top_k` / full argsort pay an
O(N log N) sort; `approx_max_k` degrades toward sort at k/N ~ 0.15.
This module instead radix-selects on the bitcast float bits:

  1. histogram successive 8-bit digits of the key (one-hot matmuls on
     the MXU -- scatter-add histograms serialize on TPU collisions),
     narrowing the rank-k boundary prefix over 3 passes (24 bits),
  2. compact every cell above the 24-bit threshold (plus enough
     boundary-tie cells to fill k) with a cumsum + no-collision scatter.

The selected SET equals exact top-k up to ties within the bottom 7
mantissa bits, a 2^-17 relative band (tie-breaking at the boundary is
arbitrary in `lax.top_k` too). Slots are
filled in scan order rather than descending prob order -- PassOccVox
consumers (point assembly, voxel merge, ball query) are order-
invariant.  Requires sel >= 0 (bit pattern of non-negative f32 is
monotone in value).
"""

import functools

import jax
import jax.numpy as jnp


def _histogram256(bins, mask):
    """Count bins (N,) int32 in [0,256) where mask, via one-hot matmul."""
    onehot = (bins[:, None] == jnp.arange(256, dtype=jnp.int32)[None, :])
    onehot = jnp.where(mask[:, None], onehot, False)
    # counts < 2^24 so f32 accumulation is exact
    return jnp.matmul(
        jnp.ones((1, bins.shape[0]), jnp.bfloat16),
        onehot.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )[0]


def _row_select(sel, k):
    n = sel.shape[0]
    nz = sel > 0
    keys = jax.lax.bitcast_convert_type(sel, jnp.int32)  # sign bit 0

    # radix passes over successive 8-bit digits of the (31-bit) key,
    # narrowing the boundary prefix; 3 passes -> 24-bit selection prefix
    # (tie band 2^-17 relative in the prob value)
    thr = jnp.int32(0)          # boundary prefix so far
    n_hi = jnp.float32(0.0)     # cells strictly above the prefix band
    rem = jnp.float32(k)        # slots left inside the band
    in_band = nz
    for shift in (23, 15, 7):
        digit = (keys >> shift) & 0xFF
        h = _histogram256(digit, in_band)
        cnt_gt = jnp.sum(h) - jnp.cumsum(h)
        j = jnp.argmax(cnt_gt < rem).astype(jnp.int32)
        thr = thr * 256 + j
        n_hi = n_hi + cnt_gt[j]
        rem = rem - cnt_gt[j]
        in_band = in_band & (digit == j)

    prefix = keys >> 7
    hi = nz & (prefix > thr)
    eq = nz & (prefix == thr)

    pos_hi = jnp.cumsum(hi.astype(jnp.int32)) - 1
    pos_eq = n_hi.astype(jnp.int32) + jnp.cumsum(eq.astype(jnp.int32)) - 1
    oob = jnp.int32(k + 1)
    pos = jnp.where(hi, pos_hi, jnp.where(eq & (pos_eq < k), pos_eq, oob))

    idx = jnp.zeros((k,), jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop", unique_indices=True
    )
    n_sel = jnp.minimum(
        n_hi.astype(jnp.int32)
        + jnp.sum(eq, dtype=jnp.int32),
        k,
    )
    valid = jnp.arange(k, dtype=jnp.int32) < n_sel
    vals = jnp.where(valid, sel[idx], 0.0)
    return vals, idx, valid


def _row_compact_nonzero(sel, k):
    """All-nonzero compaction in scan order; correct only when the row's
    nonzero count <= k (guarded by the caller's cond)."""
    n = sel.shape[0]
    nz = sel > 0
    pos = jnp.cumsum(nz.astype(jnp.int32)) - 1
    oob = jnp.int32(k + 1)
    pos = jnp.where(nz & (pos < k), pos, oob)
    idx = jnp.zeros((k,), jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop", unique_indices=True
    )
    n_sel = jnp.minimum(jnp.sum(nz, dtype=jnp.int32), k)
    valid = jnp.arange(k, dtype=jnp.int32) < n_sel
    vals = jnp.where(valid, sel[idx], 0.0)
    return vals, idx, valid


@functools.partial(jax.jit, static_argnames=("k",))
def capped_nonzero_top_k(sel, k):
    """Top-k nonzero entries per row of sel (B, N), sel >= 0.

    Returns (vals (B,k), idx (B,k) int32, valid (B,k) bool). Entries
    beyond the per-row nonzero count are zero/invalid. Equivalent to
    ``lax.top_k`` + ``>0`` masking up to a 2^-17-relative tie band at
    the rank-k boundary (see module docstring).

    Fast path: when NO row's nonzero count exceeds k (the common case —
    reference eval caps are sized with large headroom over real
    occupancy), selection degenerates to "keep every nonzero cell" and
    the radix passes are skipped entirely; a batch-level `lax.cond`
    picks the path on device. Selected sets are identical either way
    (order differs; every consumer is order-invariant, see module
    docstring)."""
    counts = jnp.sum(sel > 0, axis=1)
    return jax.lax.cond(
        jnp.all(counts <= k),
        lambda s: jax.vmap(lambda r: _row_compact_nonzero(r, k))(s),
        lambda s: jax.vmap(lambda r: _row_select(r, k))(s),
        sel,
    )


def _signed_monotone_key(x):
    """Bitcast f32 -> int32 key with the same total order as the floats
    (negatives reversed by xor with 0x7fffffff; -inf/-nan sort lowest)."""
    i = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jnp.where(i >= 0, i, i ^ jnp.int32(0x7FFFFFFF))


def _row_top_k_set(x, valid, k):
    """EXACT top-k set of a signed f32 row (N,) via 4x8-bit radix select
    on the monotone key -- no O(N log N) sort. Ties at the rank-k
    boundary are broken in scan order (``lax.top_k`` breaks them by
    index too, though not necessarily the same way). Returns
    (idx (k,) int32, got (k,) bool): strictly-above-boundary indices in
    scan order followed by boundary ties (NOT score order -- callers
    needing score order sort the k survivors, cheap for k << N)."""
    n = x.shape[0]
    keys = _signed_monotone_key(x)

    n_hi = jnp.float32(0.0)
    rem = jnp.float32(k)
    in_band = valid                       # == threshold prefix so far
    gt = jnp.zeros_like(valid)            # > threshold prefix so far
    for shift in (24, 16, 8, 0):
        digit = (keys >> shift) & 0xFF
        if shift == 24:
            digit = digit ^ 0x80  # signed high byte -> unsigned rank
        h = _histogram256(digit, in_band)
        cnt_gt = jnp.sum(h) - jnp.cumsum(h)
        j = jnp.argmax(cnt_gt < rem).astype(jnp.int32)
        n_hi = n_hi + cnt_gt[j]
        rem = rem - cnt_gt[j]
        gt = gt | (in_band & (digit > j))
        in_band = in_band & (digit == j)

    # after 4 passes in_band is exact key equality at the boundary
    hi = gt
    eq = in_band

    pos_hi = jnp.cumsum(hi.astype(jnp.int32)) - 1
    pos_eq = n_hi.astype(jnp.int32) + jnp.cumsum(eq.astype(jnp.int32)) - 1
    oob = jnp.int32(k + 1)
    pos = jnp.where(hi, pos_hi, jnp.where(eq & (pos_eq < k), pos_eq, oob))

    idx = jnp.zeros((k,), jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop", unique_indices=True
    )
    n_sel = jnp.minimum(
        n_hi.astype(jnp.int32) + jnp.sum(eq, dtype=jnp.int32), k)
    got = jnp.arange(k, dtype=jnp.int32) < n_sel
    return idx, got


@functools.partial(jax.jit, static_argnames=("k",))
def top_k_set(x, valid, k):
    """Exact top-k SET selection per row: x (B, N) f32 any sign, valid
    (B, N) bool. Returns (idx (B, k) int32, got (B, k) bool) with the
    selected indices in scan order. See `_row_top_k_set`."""
    return jax.vmap(lambda s, v: _row_top_k_set(s, v, k))(x, valid)
