"""Microbenchmark occ-target mask pieces at flagship sizes (B=1):
occ grid 209x157x9, sphere support grid 214x157x49, 20000 occ voxels x
12 pts = 240k flat points. Finds where the ~33ms targets cost lives.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from btcdet_tpu.config import cfg_from_yaml_file
from btcdet_tpu.models.occ import occ_targets as T


def timeit(name, fn, *args, iters=8):
    out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    print(f"{name:40s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)


def main():
    cfg = cfg_from_yaml_file("tools/cfgs/model_configs/btcdet_kitti_car.yaml")
    spec = T.build_grid_spec(cfg.DATA_CONFIG)
    B = 1
    rng = np.random.RandomState(0)
    NV = 20000
    NP = 12
    nx, ny, nz = spec.grid_size
    vcoords = np.stack([
        np.zeros(NV, np.int32), rng.randint(0, nz, NV),
        rng.randint(0, ny, NV), rng.randint(0, nx, NV),
    ], axis=1).astype(np.int32)
    vcoords = jnp.asarray(vcoords)
    valid = jnp.ones((NV,), bool)

    Nf = NV * NP
    pts = np.stack([
        rng.uniform(3, 68, Nf), rng.uniform(-38, 38, Nf), rng.uniform(-2.4, 0.5, Nf),
    ], axis=1).astype(np.float32)
    pts = jnp.asarray(pts)
    pb = jnp.zeros((Nf,), jnp.int32)
    pvalid = jnp.asarray(rng.rand(Nf) > 0.3)
    rot_z = jnp.zeros((B,), jnp.float32)

    @jax.jit
    def f_scatter_mask(vc, v):
        return T.scatter_mask(vc, v, B, spec.grid_size).sum()

    @jax.jit
    def f_dilate(vc, v):
        m = T.scatter_mask(vc, v, B, spec.grid_size)
        return T.dilate_predict_area(m, spec.dist_kern, spec.concede_x).sum()

    @jax.jit
    def f_occlusion(p, pv, pbb, rz):
        return T.occlusion_mask(spec, p, pv, pbb, rz, B).sum()

    snx, sny, snz = spec.sphere_grid_size
    scell = snz * sny * snx

    @jax.jit
    def f_sphere_scatter(p, pv, pbb, rz):
        from btcdet_tpu.utils import coords as C
        sr = jnp.asarray(spec.sphere_range[:6], jnp.float32)
        svs = jnp.asarray(spec.sphere_voxel_size, jnp.float32)
        sph = C.absxyz_to_sphere(p)
        sph = sph.at[:, 1].add(rz[pbb])
        inr = jnp.all((sph[:, :3] >= sr[:3]) & (sph[:, :3] <= sr[3:6]), axis=1) & pv
        cell = jnp.floor((sph[:, :3] - sr[:3]) / svs).astype(jnp.int32)
        cell = jnp.clip(cell, 0, jnp.asarray([snx-1, sny-1, snz-1], jnp.int32))
        lin = (cell[:, 2] * sny + cell[:, 1]) * snx + cell[:, 0]
        idx = jnp.where(inr, pbb * scell + lin, B * scell)
        smask = jnp.zeros((B * scell + 1,), jnp.float32).at[idx].max(
            jnp.where(inr, 1.0, 0.0))
        return smask.sum()

    @jax.jit
    def f_sphere_cumsum(m):
        return (jnp.cumsum(m, axis=3) > 0.9).sum()

    @jax.jit
    def f_reproject(occ_sph):
        ncell = nz * ny * nx
        smap = jnp.asarray(spec.sphere_to_grid_map)
        tgt = jnp.where(smap >= 0, smap, ncell)
        out = jnp.zeros((B, ncell + 1), bool)
        out = out.at[jnp.arange(B)[:, None], tgt[None, :]].max(
            occ_sph.reshape(B, -1))
        return out.sum()

    smask = jnp.asarray(rng.rand(B, snz, sny, snx) > 0.85, jnp.float32)
    occ_sph = jnp.asarray(rng.rand(B, snz, sny, snx) > 0.5)

    print(f"occ grid {spec.grid_size}, sphere {spec.sphere_grid_size}, flat pts {Nf}",
          flush=True)
    timeit("scatter_mask (20k voxels)", f_scatter_mask, vcoords, valid)
    timeit("scatter + dilate 5x9x5", f_dilate, vcoords, valid)
    timeit("sphere scatter-max (240k pts)", f_sphere_scatter, pts, pvalid, pb, rot_z)
    timeit("sphere cumsum+thresh", f_sphere_cumsum, smask)
    timeit("sphere->occ reprojection", f_reproject, occ_sph)
    timeit("occlusion_mask (all)", f_occlusion, pts, pvalid, pb, rot_z)


if __name__ == "__main__":
    main()
