"""Microbenchmark: column (sparse-BEV x dense-Z) sparse conv vs the
row-gather rulebook formulation.

The det grid's z extent is tiny (41 -> 21 -> 11 -> 5), so a level can be
stored as M active BEV columns of shape (Z, C). A 3x3x3 subm conv then
needs 9 *column* gathers (one per BEV neighbor; each row is Z*C wide,
and TPU gather cost is per-row, not per-byte) plus z-shifted matmuls on
the MXU, instead of 27 per-voxel row gathers.

Usage: python tools/microbench_cols.py [M_cols] [Z] [C]
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
    print(f"{name:46s} {dt*1000:8.2f} ms", flush=True)


def main(M=14000, Z=41, C=16, N=20000):
    rng = np.random.RandomState(0)
    cols = jnp.asarray(rng.randn(M, Z, C).astype(np.float32))
    nbr_idx = jnp.asarray(rng.randint(0, M, (9, M)).astype(np.int32))
    w = jnp.asarray((rng.randn(9, 3, C, C) * 0.05).astype(np.float32))

    feats = jnp.asarray(rng.randn(N, C).astype(np.float32))
    idx27 = jnp.asarray(rng.randint(0, N, (27, N)).astype(np.int32))
    w27 = jnp.asarray((rng.randn(27, C, C) * 0.05).astype(np.float32))

    @jax.jit
    def row27(f, idx, w):
        g = f[idx]
        return jax.lax.dot_general(
            g, w, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).sum(axis=0).sum()

    @jax.jit
    def col_gather_only(c, idx):
        return c.reshape(M, Z * C)[idx].sum()

    @jax.jit
    def col_conv(c, idx, w):
        # gather 9 BEV neighbors: (9, M, Z, C)
        g = c.reshape(M, Z * C)[idx].reshape(9, M, Z, C)
        # z-pad once, take 3 shifted views, matmul each tap on the MXU
        gp = jnp.pad(g, ((0, 0), (0, 0), (1, 1), (0, 0)))
        out = jnp.zeros((M, Z, C), jnp.float32)
        for dz in range(3):
            sl = gp[:, :, dz:dz + Z, :].reshape(9, M * Z, C)
            out = out + jax.lax.dot_general(
                sl, w[:, dz], dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).sum(axis=0).reshape(M, Z, C)
        return out.sum()

    @jax.jit
    def col_conv_onemm(c, idx, w):
        # stack the 3 z-taps into the channel dim -> one (9,) batched matmul
        g = c.reshape(M, Z * C)[idx].reshape(9, M, Z, C)
        gp = jnp.pad(g, ((0, 0), (0, 0), (1, 1), (0, 0)))
        g3 = jnp.concatenate(
            [gp[:, :, dz:dz + Z, :] for dz in range(3)], axis=-1
        ).reshape(9, M * Z, 3 * C)
        w3 = w.reshape(9, 3 * C, C)  # (dz-major, c) matches the concat order
        return jax.lax.dot_general(
            g3, w3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).sum(axis=0).sum()

    @jax.jit
    def col_conv_bf16(c, idx, w):
        c = c.astype(jnp.bfloat16)
        w = w.astype(jnp.bfloat16)
        g = c.reshape(M, Z * C)[idx].reshape(9, M, Z, C)
        gp = jnp.pad(g, ((0, 0), (0, 0), (1, 1), (0, 0)))
        out = jnp.zeros((M, Z, C), jnp.float32)
        for dz in range(3):
            sl = gp[:, :, dz:dz + Z, :].reshape(9, M * Z, C)
            out = out + jax.lax.dot_general(
                sl, w[:, dz], dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).sum(axis=0).reshape(M, Z, C)
        return out.sum()

    print(f"M={M} Z={Z} C={C} (column bytes/row = {Z*C*4})")
    timeit(f"row-gather rulebook 27x{N} C={C}", row27, feats, idx27, w27)
    timeit("column gather only (9 wide gathers)", col_gather_only, cols, nbr_idx)
    timeit("column conv (9 gathers + 27 matmuls)", col_conv, cols, nbr_idx, w)
    timeit("column conv one-mm (z-stacked)", col_conv_onemm, cols, nbr_idx, w)
    timeit("column conv bf16", col_conv_bf16, cols, nbr_idx, w)


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
