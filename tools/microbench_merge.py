"""Microbench PassOccVox's incremental voxel merge at eval shapes
(det table 20480 voxels x 5 pts, K=40000 occ points, B=1), isolating its
pieces: the K-point bin argsort, the hit lookup (sorted-search vs dense
det-grid table), and the scatter appends.
"""

import functools
import os
import sys
import time

os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np

from btcdet_tpu.ops import voxelizer


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(
        jax.tree_util.tree_leaves(jax.tree_util.tree_map(lambda x: x.sum(), out))[0]
    )
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)


def main():
    B, Nd, Pd, C6, K, extra, Pd_m = 1, 20480, 5, 6, 40000, 10000, 8
    grid = (1408, 1600, 41)  # nx, ny, nz
    nxd, nyd, nzd = grid
    lo = jnp.asarray([0.0, -40.0, -3.0])
    vs = jnp.asarray([0.05, 0.05, 0.1])
    rng = np.random.RandomState(0)

    # key-sorted det table of ~16k live rows
    live = 16384
    keys = np.sort(rng.choice(nzd * nyd * nxd, size=live, replace=False))
    z = keys // (nyd * nxd); y = (keys - z * nyd * nxd) // nxd; x = keys % nxd
    dcoords = np.full((Nd, 4), -1, np.int32)
    dcoords[:live, 0] = 0
    dcoords[:live, 1] = z; dcoords[:live, 2] = y; dcoords[:live, 3] = x
    dnum = np.zeros((Nd,), np.int32); dnum[:live] = rng.randint(1, Pd + 1, live)
    dvox = rng.rand(Nd, Pd, C6).astype(np.float32)

    opts = np.zeros((K, C6), np.float32)
    opts[:, 0] = rng.uniform(0, 70.2, K)
    opts[:, 1] = rng.uniform(-40, 40, K)
    opts[:, 2] = rng.uniform(-3, 1, K)
    ovalid = rng.rand(K) < 0.6

    args = [jnp.asarray(a) for a in
            (dvox[None], dcoords[None], dnum[None], opts[None], ovalid[None])]

    merge = jax.jit(jax.vmap(functools.partial(
        voxelizer.merge_points_into_voxels,
        grid_size=grid, lo=lo, vs=vs, extra=extra, max_points=Pd_m,
    )))
    timeit("full merge (vmap B=1)", merge, *args)

    # pieces
    dkey = jnp.asarray(np.where(dcoords[:, 0] >= 0,
                                (z[0] if False else 0), 0))  # placeholder
    dz, dy, dx = (jnp.asarray(dcoords[:, i]) for i in (1, 2, 3))
    dvalid = jnp.asarray(dcoords[:, 0] >= 0)
    dkey = jnp.where(dvalid, (dz * nyd + dy) * nxd + dx, voxelizer.INT32_MAX).astype(jnp.int32)
    optsj = jnp.asarray(opts); ovj = jnp.asarray(ovalid)

    @jax.jit
    def bin_and_sort(o, ov):
        c = jnp.floor((o[:, :3] - lo) / vs).astype(jnp.int32)
        okey = jnp.where(ov, (c[:, 2] * nyd + c[:, 1]) * nxd + c[:, 0],
                         voxelizer.INT32_MAX).astype(jnp.int32)
        order = jnp.argsort(okey, stable=True)
        return okey[order], order

    timeit("bin + argsort(40k)", bin_and_sort, optsj, ovj)

    sk, _ = bin_and_sort(optsj, ovj)
    sk = jax.device_get(sk)
    skj = jnp.asarray(sk)

    @jax.jit
    def hit_sorted(dk, q):
        i = jnp.searchsorted(dk, q, method="sort").astype(jnp.int32)
        i = jnp.clip(i, 0, dk.shape[0] - 1)
        return i, dk[i] == q

    @jax.jit
    def hit_scan(dk, q):
        i = jnp.searchsorted(dk, q).astype(jnp.int32)
        i = jnp.clip(i, 0, dk.shape[0] - 1)
        return i, dk[i] == q

    total = nzd * nyd * nxd

    @jax.jit
    def hit_dense(dk, dv, q):
        scat = jnp.where(dv, dk, total)
        table = jnp.full((total + 1,), -1, jnp.int32).at[scat].set(
            jnp.where(dv, jnp.arange(dk.shape[0], dtype=jnp.int32), -1))
        qq = jnp.clip(q, 0, total)
        i = table[qq]
        return jnp.maximum(i, 0), i >= 0

    timeit("hit lookup: searchsorted(sort)", hit_sorted, dkey, skj)
    timeit("hit lookup: searchsorted(scan)", hit_scan, dkey, skj)
    timeit("hit lookup: dense 92M table", hit_dense, dkey, dvalid, skj)

    # scatter append cost
    rr = jnp.asarray(rng.randint(0, Nd, K).astype(np.int32))
    ss = jnp.asarray(rng.randint(0, Pd_m, K).astype(np.int32))
    sp = jnp.asarray(rng.rand(K, C6).astype(np.float32))
    dv = jnp.asarray(dvox)

    @jax.jit
    def scat(dvx, r, s, p):
        return dvx.at[r, s].set(p)

    timeit("scatter append (40k rows)", scat, dv, rr, ss, sp)


if __name__ == "__main__":
    main()
