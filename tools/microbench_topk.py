"""Microbenchmark the PassOccVox eval top-k (263k occ cells -> top 40000)
strategies on TPU:

  A. argsort descending + take (current occ_subnet path for K > 4096)
  B. jax.lax.top_k
  C. jax.lax.approx_max_k
  D. radix-select: 2-pass 256-bin histogram on the bitcast prob bits
     (histograms as one-hot matmuls on the MXU, not scatter-adds --
     scatter collisions serialize on TPU), then cumsum-compaction
     scatter of the selected cells into K slots.

The output of D is set-equivalent to exact top-k up to ties within the
bottom 16 bits of the f32 mantissa; slot order differs (scan order, not
prob order) which downstream PassOccVox consumers don't depend on.
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = jax.device_get(
        jax.tree_util.tree_leaves(jax.tree_util.tree_map(lambda x: x.sum(), out))[0]
    )
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)


def compact_nonzero(sel, K):
    """E: pure compaction of nonzero cells into K slots (no selection).

    Exact top-k SET equality whenever the per-row nonzero count <= K
    (the realistic eval case: ~5-20k cells above EVAL_OCC_THRESH vs the
    40000 cap); the caller must guard the count>K case. Two-level
    matmul cumsum (minor-axis cumsum lowers poorly on TPU) + one
    unique-index scatter."""
    B, N = sel.shape
    W = 128
    R = -(-N // W)
    nz = (sel > 0)
    x = jnp.pad(nz.astype(jnp.float32), ((0, 0), (0, R * W - N))).reshape(B, R, W)
    within = jax.lax.dot_general(
        x, jnp.triu(jnp.ones((W, W), jnp.float32)),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # inclusive within-row cumsum
    totals = within[..., -1]                      # (B, R)
    offs = jnp.cumsum(totals, axis=1) - totals    # exclusive row offsets
    c = (within + offs[..., None]).reshape(B, R * W)[:, :N]
    # zero cells and count>K overflow go to index K, which is OUT OF
    # BOUNDS for the (B, K) buffer so mode="drop" discards them -- the
    # remaining in-range indices are genuinely unique (c is a strict
    # running count over nonzero cells), so unique_indices=True is
    # sound (advisor r3: a shared in-bounds sink slot made them
    # non-unique, documented UB)
    pos = jnp.where(nz, c.astype(jnp.int32) - 1, K)
    pos = jnp.minimum(pos, K)
    cell = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
    idx = jnp.zeros((B, K), jnp.int32).at[
        jnp.arange(B)[:, None], pos
    ].set(cell, mode="drop", unique_indices=True)
    count = c[:, -1].astype(jnp.int32)
    valid = jnp.arange(K, dtype=jnp.int32)[None] < jnp.minimum(count, K)[:, None]
    vals = jnp.where(valid, jnp.take_along_axis(sel, idx, axis=1), 0.0)
    return vals, idx, valid


def main():
    B, N, K = 8, 9 * 157 * 209, 40000
    rng = np.random.RandomState(0)
    # ~30% of cells above threshold, like an occluded-region prob map
    probs = rng.uniform(0, 1, (B, N)).astype(np.float32)
    sel_np = np.where(probs > 0.7, probs, 0.0)
    sel = jnp.asarray(sel_np)
    # realistic eval occupancy: ~12k cells above EVAL_OCC_THRESH=0.57
    sel_lo_np = np.where(probs > 1.0 - 12000.0 / N, probs, 0.0)
    sel_lo = jnp.asarray(sel_lo_np)
    print(f"nonzero per frame: {(sel_np > 0).sum(1)} / lo {(sel_lo_np > 0).sum(1)}")

    @jax.jit
    def f_argsort(s):
        order = jnp.argsort(-s, axis=1)[:, :K]
        return jnp.take_along_axis(s, order, axis=1), order

    @jax.jit
    def f_topk(s):
        return jax.lax.top_k(s, K)

    @jax.jit
    def f_approx(s):
        return jax.lax.approx_max_k(s, K)

    from btcdet_tpu.ops.topk import capped_nonzero_top_k

    f_radix = jax.jit(functools.partial(capped_nonzero_top_k, k=K))

    f_compact = jax.jit(functools.partial(compact_nonzero, K=K))

    timeit("A argsort+take", f_argsort, sel)
    timeit("B lax.top_k", f_topk, sel)
    timeit("B lax.top_k (12k nz)", f_topk, sel_lo)
    timeit("C approx_max_k", f_approx, sel)
    timeit("D radix-select compaction", f_radix, sel)
    timeit("E cumsum-compaction (79k nz, overflow)", f_compact, sel)
    timeit("E cumsum-compaction (12k nz)", f_compact, sel_lo)

    # correctness: E's selected set == nonzero set when count <= K
    pv, iv, vv = jax.device_get(f_compact(sel_lo))
    for b in range(B):
        got = np.sort(iv[b][vv[b]])
        want = np.flatnonzero(sel_lo_np[b])
        assert got.shape == want.shape and (got == want).all(), b
    print("E set-exact on 12k-nz rows")

    # correctness: D's selected set == exact top-K set (up to tie band)
    pv, iv, valid = jax.device_get(f_radix(sel))
    exact_p, _ = jax.device_get(f_topk(sel))
    nsel = int(valid[0].sum())
    nz = int((sel_np[0] > 0).sum())
    assert nsel == min(K, nz), (nsel, nz)
    got = np.sort(pv[0][valid[0]])[::-1]
    want = exact_p[0][: len(got)]
    print("max |sorted(D) - top_k| =", np.abs(got - want).max())


if __name__ == "__main__":
    main()
