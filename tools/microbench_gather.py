"""Microbenchmark: per-row gather vs 3-row slice gather on TPU.

Motivation: rulebook application gathers K*N feature rows per sparse
conv; TPU gathers are transaction-bound (~9ns/row regardless of width,
CLAUDE.md). A 3x3x3 kernel's three x-taps hit *consecutive* rows of the
key-sorted voxel table, so they can be fetched as one 3-row slice
(lax.gather slice_sizes=(3, C)) -- 3x fewer transactions if the TPU
gather cost is per-slice. This probe decides whether to restructure
apply_rulebook_matmul around grouped slices.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt*1000:8.2f} ms", flush=True)


def main(N=20000, C=64):
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(N, C).astype(np.float32))
    idx27 = jnp.asarray(rng.randint(0, N, (27, N)).astype(np.int32))
    starts9 = jnp.asarray(rng.randint(0, N - 3, (9, N)).astype(np.int32))
    w27 = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.05)

    @jax.jit
    def row_gather(f, idx):
        return f[idx].sum()

    @jax.jit
    def row_gather_matmul(f, idx, w):
        g = f[idx]
        return jax.lax.dot_general(
            g, w, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).sum(axis=0).sum()

    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3), collapsed_slice_dims=(), start_index_map=(0,),
    )

    @jax.jit
    def slice_gather(f, starts):
        g = jax.lax.gather(
            f, starts[..., None], dimension_numbers=dn, slice_sizes=(3, f.shape[1]),
            mode="clip",
        )  # (9, N, 3, C)
        return g.sum()

    @jax.jit
    def slice_gather_matmul(f, starts, w):
        g = jax.lax.gather(
            f, starts[..., None], dimension_numbers=dn, slice_sizes=(3, f.shape[1]),
            mode="clip",
        )  # (9, N, 3, C)
        g27 = g.transpose(0, 2, 1, 3).reshape(27, N, f.shape[1])
        return jax.lax.dot_general(
            g27, w, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).sum(axis=0).sum()

    @jax.jit
    def row_gather_bf16(f, idx):
        return f.astype(jnp.bfloat16)[idx].sum()

    @jax.jit
    def concat3_gather(f, starts):
        # F3[i] = [F[i], F[i+1], F[i+2]] -- one wide row-gather per group
        fp = jnp.concatenate([f, jnp.zeros((2, f.shape[1]), f.dtype)], axis=0)
        f3 = jnp.concatenate([fp[:-2], fp[1:-1], fp[2:]], axis=1)  # (N, 3C)
        return f3[starts].sum()

    @jax.jit
    def concat3_gather_matmul(f, starts, w):
        fp = jnp.concatenate([f, jnp.zeros((2, f.shape[1]), f.dtype)], axis=0)
        f3 = jnp.concatenate([fp[:-2], fp[1:-1], fp[2:]], axis=1)  # (N, 3C)
        g = f3[starts]  # (9, N, 3C)
        g27 = g.reshape(9, N, 3, f.shape[1]).transpose(0, 2, 1, 3).reshape(27, N, f.shape[1])
        return jax.lax.dot_general(
            g27, w, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).sum(axis=0).sum()

    @jax.jit
    def concat3_gather_bf16(f, starts):
        f = f.astype(jnp.bfloat16)
        fp = jnp.concatenate([f, jnp.zeros((2, f.shape[1]), f.dtype)], axis=0)
        f3 = jnp.concatenate([fp[:-2], fp[1:-1], fp[2:]], axis=1)
        return f3[starts].sum()

    print(f"N={N} C={C}: 27xN row gathers vs 9xN 3-row slice gathers", flush=True)
    timeit("rows:   27xN row gather", row_gather, feats, idx27)
    timeit("slices: 9xN 3-row slice gather", slice_gather, feats, starts9)
    timeit("concat3: 9xN wide row gather", concat3_gather, feats, starts9)
    timeit("rows:   gather + 27-way GEMM", row_gather_matmul, feats, idx27, w27)
    timeit("slices: slice gather + 27-way GEMM", slice_gather_matmul, feats, starts9, w27)
    timeit("concat3: gather + 27-way GEMM", concat3_gather_matmul, feats, starts9, w27)
    timeit("rows:   bf16 row gather", row_gather_bf16, feats, idx27)
    timeit("concat3: bf16 wide row gather", concat3_gather_bf16, feats, starts9)


if __name__ == "__main__":
    kw = {}
    if len(sys.argv) > 1:
        kw["N"] = int(sys.argv[1])
    if len(sys.argv) > 2:
        kw["C"] = int(sys.argv[2])
    main(**kw)
