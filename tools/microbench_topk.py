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


def main():
    B, N, K = 1, 9 * 157 * 209, 40000
    rng = np.random.RandomState(0)
    # ~30% of cells above threshold, like an occluded-region prob map
    probs = rng.uniform(0, 1, (B, N)).astype(np.float32)
    sel_np = np.where(probs > 0.7, probs, 0.0)
    sel = jnp.asarray(sel_np)
    print(f"nonzero per frame: {(sel_np > 0).sum(1)}")

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

    timeit("A argsort+take", f_argsort, sel)
    timeit("B lax.top_k", f_topk, sel)
    timeit("C approx_max_k", f_approx, sel)
    timeit("D radix-select compaction", f_radix, sel)

    # correctness: D's selected set == exact top-K set (up to tie band)
    pv, iv, valid = jax.device_get(f_radix(sel))
    exact_p, _ = jax.device_get(f_topk(sel))
    nsel = int(valid.sum())
    nz = int((sel_np > 0).sum())
    assert nsel == min(K, nz), (nsel, nz)
    got = np.sort(pv[0][valid[0]])[::-1]
    want = exact_p[0][: len(got)]
    print("max |sorted(D) - top_k| =", np.abs(got - want).max())


if __name__ == "__main__":
    main()
