"""Microbenchmark the pieces of a level-1 subm rulebook build
(N=30000 active sites on the 41x1600x1408 det grid): dense-table
construction, random table gathers, sorted-search, and the full
subm_rulebook -- to find where its ~18ms actually goes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from btcdet_tpu.ops import sparse


def timeit(name, fn, *args, iters=8):
    out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    print(f"{name:46s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)


def main(N=30000):
    nz, ny, nx = 41, 1600, 1408
    total = nz * ny * nx
    rng = np.random.RandomState(0)
    # realistic: clustered keys (sorted random sample)
    keys = np.sort(rng.choice(total, N, replace=False)).astype(np.int32)
    st_coords = np.stack([
        np.zeros(N, np.int32), keys // (ny * nx), (keys // nx) % ny, keys % nx,
    ], axis=1)
    feats = rng.randn(N, 16).astype(np.float32)
    st = sparse.from_coords(
        jnp.asarray(feats), jnp.asarray(st_coords), (nz, ny, nx), 1,
        assume_sorted=True,
    )
    Q = 27 * N
    queries = jnp.asarray(rng.randint(0, total, Q).astype(np.int32))

    @jax.jit
    def table_build(valid, skeys):
        scat = jnp.where(valid, skeys, total)
        table = jnp.full((total + 1,), -1, jnp.int32).at[scat].set(
            jnp.where(valid, jnp.arange(N, dtype=jnp.int32), -1))
        return table[::97].sum()  # consume without full copy-out

    @jax.jit
    def table_gather(table, q):
        return table[q].sum()

    @jax.jit
    def table_build_and_gather(valid, skeys, q):
        scat = jnp.where(valid, skeys, total)
        table = jnp.full((total + 1,), -1, jnp.int32).at[scat].set(
            jnp.where(valid, jnp.arange(N, dtype=jnp.int32), -1))
        return table[jnp.clip(q, 0, total)].sum()

    @jax.jit
    def sorted_search(skeys, q):
        return jnp.searchsorted(skeys, q, method="sort").astype(jnp.int32).sum()

    @jax.jit
    def full_subm(st_):
        idx, found = sparse.subm_rulebook(st_, 3)
        return idx.sum() + found.sum()

    @jax.jit
    def query_key_math(st_):
        # the coordinate/key arithmetic of subm_rulebook without lookups
        offsets = jnp.asarray(sparse._kernel_offsets(3) - 1)
        nbr = st_.coords[None, :, 1:4] + offsets[:, None, :]
        inb = (
            (nbr[..., 0] >= 0) & (nbr[..., 0] < nz)
            & (nbr[..., 1] >= 0) & (nbr[..., 1] < ny)
            & (nbr[..., 2] >= 0) & (nbr[..., 2] < nx)
            & st_.valid[None, :]
        )
        b = jnp.broadcast_to(st_.coords[None, :, 0], nbr.shape[:2])
        qcoords = jnp.concatenate([b[..., None], nbr], axis=-1).reshape(-1, 4)
        qcoords = jnp.where(inb.reshape(-1)[:, None], qcoords, -1)
        qkeys = sparse.linear_key(qcoords, st_.spatial_shape, st_.batch_size)
        return qkeys.sum()

    table = jnp.full((total + 1,), -1, jnp.int32).at[jnp.asarray(keys)].set(
        jnp.arange(N, dtype=jnp.int32))

    print(f"N={N} grid={nz}x{ny}x{nx} ({total/1e6:.0f}M cells), Q={Q}", flush=True)
    timeit("dense table build (92M int32)", table_build, st.valid, st.keys)
    timeit("810k random table gathers", table_gather, table, queries)
    timeit("table build + gather fused", table_build_and_gather, st.valid, st.keys, queries)
    timeit("sorted-search 810k (method=sort)", sorted_search, st.keys, queries)
    timeit("query coord/key math only", query_key_math, st)
    timeit("full subm_rulebook", full_subm, st)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30000)


def unique_scatter_probe(N=30000):
    nz, ny, nx = 41, 1600, 1408
    total = nz * ny * nx
    rng = np.random.RandomState(0)
    keys = np.sort(rng.choice(total, N, replace=False)).astype(np.int32)
    skeys = jnp.asarray(keys)
    valid = jnp.ones((N,), bool)
    Q = 27 * N
    queries = jnp.asarray(rng.randint(0, total, Q).astype(np.int32))

    @jax.jit
    def build_unique(valid, skeys):
        # padding rows target DISTINCT dead slots -> indices provably
        # unique -> XLA can parallelize the scatter
        scat = jnp.where(valid, skeys, total + jnp.arange(N, dtype=jnp.int32))
        table = jnp.full((total + N,), -1, jnp.int32).at[scat].set(
            jnp.where(valid, jnp.arange(N, dtype=jnp.int32), -1),
            unique_indices=True,
        )
        return table[::97].sum()

    @jax.jit
    def build_unique_and_gather(valid, skeys, q):
        scat = jnp.where(valid, skeys, total + jnp.arange(N, dtype=jnp.int32))
        table = jnp.full((total + N,), -1, jnp.int32).at[scat].set(
            jnp.where(valid, jnp.arange(N, dtype=jnp.int32), -1),
            unique_indices=True,
        )
        return table[jnp.clip(q, 0, total)].sum()

    timeit("UNIQUE dense table build", build_unique, valid, skeys)
    timeit("UNIQUE table build + gather", build_unique_and_gather, valid, skeys, queries)


if "unique" in sys.argv:
    unique_scatter_probe()
