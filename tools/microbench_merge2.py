"""Where do merge_points_into_voxels' 7.7 ms/frame go? Times the full
merge and ablated variants (no-scatter, sort-only) on KITTI-shaped
inputs at B=8, eval caps (20k det rows, K=40k occ points)."""

import os, sys, time
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.getcwd())

import functools
import jax, jax.numpy as jnp, numpy as np
from btcdet_tpu.ops import voxelizer

B, Nd, Pd, C6, K, extra = 8, 20000, 8, 9, 40000, 10000
GRID = (1408, 1600, 41)
lo = jnp.asarray([0.0, -40.0, -3.0], jnp.float32)
vs = jnp.asarray([0.05, 0.05, 0.1], jnp.float32)

rng = np.random.RandomState(0)
dvox = jnp.asarray(rng.randn(B, Nd, Pd, C6).astype(np.float32))
zc = rng.randint(0, 41, (B, Nd)); yc = rng.randint(0, 1600, (B, Nd)); xc = rng.randint(0, 1408, (B, Nd))
dcoords = jnp.asarray(np.stack([np.zeros_like(zc), zc, yc, xc], -1).astype(np.int32))
# sort per frame by key like the real table
dkey = (zc * 1600 + yc) * 1408 + xc
order = np.argsort(dkey, axis=1)
dcoords = jnp.take_along_axis(dcoords, jnp.asarray(order)[..., None], axis=1)
dnum = jnp.asarray(rng.randint(1, Pd, (B, Nd)).astype(np.int32))
opts = jnp.asarray(np.concatenate([
    rng.uniform(0, 1, (B, K, 3)).astype(np.float32) * np.array([70.4, 80, 4], np.float32)
    + np.array([0, -40, -3], np.float32),
    rng.rand(B, K, C6 - 3).astype(np.float32)], -1))
ovalid = jnp.asarray(rng.rand(B, K) < 0.5)

def timeit(name, fn, *args, iters=10):
    red = jax.jit(lambda *a: sum(l.sum().astype(jnp.float32) for l in jax.tree_util.tree_leaves(fn(*a))))
    _ = jax.device_get(red(*args))
    t0 = time.perf_counter()
    for _ in range(iters): out = red(*args)
    _ = jax.device_get(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:30s} {dt*1000:8.2f} ms ({dt*1000/B:5.2f}/frame)", flush=True)

merge = functools.partial(voxelizer.merge_points_into_voxels,
                          grid_size=GRID, lo=lo, vs=vs, extra=extra, max_points=Pd)
timeit("full merge", lambda *a: jax.vmap(merge)(*a), dvox, dcoords, dnum, opts, ovalid)

def sort_only(opts_f, ovalid_f):
    c = jnp.floor((opts_f[:, :3] - lo) / vs).astype(jnp.int32)
    okey = jnp.where(ovalid_f, (c[:, 2] * 1600 + c[:, 1]) * 1408 + c[:, 0], 2**31 - 1).astype(jnp.int32)
    order = jnp.argsort(okey, stable=True)
    return okey[order], opts_f[order]
timeit("sort+gather only", lambda o, v: jax.vmap(sort_only)(o, v), opts, ovalid)

def to_searchsorted(dcoords_f, opts_f, ovalid_f):
    dz, dy, dx = dcoords_f[:, 1], dcoords_f[:, 2], dcoords_f[:, 3]
    dkey = jnp.where(dcoords_f[:, 0] >= 0, (dz * 1600 + dy) * 1408 + dx, 2**31 - 1).astype(jnp.int32)
    sk, sp = sort_only(opts_f, ovalid_f)
    ridx = jnp.clip(jnp.searchsorted(dkey, sk, method="sort").astype(jnp.int32), 0, Nd - 1)
    return ridx, sk, sp
timeit("+ searchsorted", lambda d, o, v: jax.vmap(to_searchsorted)(d, o, v), dcoords, opts, ovalid)

def with_scatter(dvox_f, dcoords_f, dnum_f, opts_f, ovalid_f):
    ridx, sk, sp = to_searchsorted(dcoords_f, opts_f, ovalid_f)
    hit = sk != 2**31 - 1
    dest = jnp.clip(dnum_f[ridx], 0, Pd - 1)
    rr = jnp.where(hit, ridx, Nd)
    dvox_p = jnp.concatenate([dvox_f, jnp.zeros((1, Pd, C6), dvox_f.dtype)], axis=0)
    dvox_p = dvox_p.at[rr, dest].set(jnp.where(hit[:, None], sp, 0.0))
    return dvox_p[:Nd]
timeit("+ hit scatter", lambda *a: jax.vmap(with_scatter)(*a), dvox, dcoords, dnum, opts, ovalid)

merge2 = functools.partial(voxelizer.merge_points_into_voxels_v2,
                           grid_size=GRID, lo=lo, vs=vs, extra=extra, max_points=Pd)
timeit("full merge v2 (1 sort)", lambda *a: jax.vmap(merge2)(*a), dvox, dcoords, dnum, opts, ovalid)
