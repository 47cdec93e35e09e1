"""Microbench occ-subnet hot spots (round 5 byte/compute diet):

a) occlusion_mask substages: point->sphere scatter-max vs the range
   matmuls (f32 vs bf16 banded) vs the reproj one-hot matmul
b) dense occ backbone conv formulations: XLA conv3d (NDHWC, C=16..64)
   vs z-unfolded conv2d (z taps folded into input channels - exact
   same math, MXU-friendlier channel count)

    python tools/microbench_occ2.py
"""

import os
import sys
import time

os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=10):
    red = jax.jit(lambda *a: jax.tree_util.tree_reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), fn(*a), 0.0))
    r = red(*args)
    float(jax.device_get(r))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = red(*args)
    float(jax.device_get(r))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:56s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    B = 8
    N = 40000 * 12          # occ points per frame at eval caps
    snx, sny, snz = 214, 157, 49
    scell = snz * sny * snx
    rng = np.random.RandomState(0)

    pts = jnp.asarray(rng.randn(B * N, 3).astype(np.float32) * 20)
    pvalid = jnp.asarray(rng.rand(B * N) < 0.4)
    pb = jnp.asarray(np.repeat(np.arange(B), N).astype(np.int32))

    sr = jnp.asarray([2.24, -40.69, -16.6, 70.72, 40.69, 4.0], jnp.float32)
    svs = jnp.asarray([0.32, 0.5184, 0.4203125], jnp.float32)

    from btcdet_tpu.utils import coords

    def sphere_cells(p, pv, b):
        sph = coords.absxyz_to_sphere(p)
        inr = jnp.all((sph[:, :3] >= sr[:3]) & (sph[:, :3] <= sr[3:6]), axis=1) & pv
        cell = jnp.floor((sph[:, :3] - sr[:3]) / svs).astype(jnp.int32)
        cell = jnp.clip(cell, 0, jnp.asarray([snx - 1, sny - 1, snz - 1], jnp.int32))
        lin = (cell[:, 2] * sny + cell[:, 1]) * snx + cell[:, 0]
        return jnp.where(inr, b * scell + lin, B * scell), inr

    def smask_scatter(p, pv, b):
        idx, inr = sphere_cells(p, pv, b)
        return jnp.zeros((B * scell + 1,), jnp.float32).at[idx].max(
            jnp.where(inr, 1.0, 0.0))[:-1]

    def smask_scatter_bool(p, pv, b):
        idx, inr = sphere_cells(p, pv, b)
        return jnp.zeros((B * scell + 1,), bool).at[idx].set(inr)[:-1]

    timeit("occl: sphere-cell math only", lambda p, pv, b: sphere_cells(p, pv, b)[0], pts, pvalid, pb)
    timeit("occl: scatter-max f32 (current)", smask_scatter, pts, pvalid, pb)
    timeit("occl: scatter-set bool", smask_scatter_bool, pts, pvalid, pb)

    smask = jnp.asarray((rng.rand(B, snz, sny, snx) < 0.05).astype(np.float32))

    def range_mm(dtype):
        def f(m):
            band = jnp.triu(jnp.ones((snx, snx), dtype))
            return jax.lax.dot_general(
                m.reshape(-1, snx).astype(dtype), band,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).reshape(m.shape)
        return f

    timeit("occl: range matmul f32 (current)", range_mm(jnp.float32), smask)
    timeit("occl: range matmul bf16", range_mm(jnp.bfloat16), smask)

    nzg, nxg = 9, 209
    reproj = jnp.asarray(rng.randint(-1, nzg * nxg, size=(snz * snx,)).astype(np.int32))

    def reproj_mm(s):
        m2d = jax.nn.one_hot(reproj, nzg * nxg, dtype=jnp.bfloat16)
        sflat = s.transpose(0, 2, 1, 3).reshape(B * sny, snz * snx)
        return jax.lax.dot_general(
            sflat.astype(jnp.bfloat16), m2d,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    timeit("occl: reproj one-hot matmul", reproj_mm, smask)

    # ---- backbone conv formulations --------------------------------------
    ny, nx = 157, 209
    for C_in, C_out, name in ((16, 16, "16->16 full-res"),
                              (32, 32, "32->32 (half-res 79x105)",)):
        if "half" in name:
            nyc, nxc, nzc = 79, 105, 5
        else:
            nyc, nxc, nzc = ny, nx, 9
        x = jnp.asarray(rng.randn(B, nzc, nyc, nxc, C_in).astype(np.float32)).astype(jnp.bfloat16)
        w3 = jnp.asarray(rng.randn(3, 3, 3, C_in, C_out).astype(np.float32)).astype(jnp.bfloat16)

        def conv3d(x, w):
            return jax.lax.conv_general_dilated(
                x, w, window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32)

        def conv2d_zunfold(x, w):
            # pad z, stack the 3 z taps into channels, one 2D conv
            xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
            xs = jnp.concatenate(
                [xp[:, :-2], xp[:, 1:-1], xp[:, 2:]], axis=-1
            )  # (B, nz, ny, nx, 3C)
            Bs, nzs = xs.shape[0], xs.shape[1]
            x2 = xs.reshape(Bs * nzs, xs.shape[2], xs.shape[3], xs.shape[4])
            w2 = w.transpose(1, 2, 0, 3, 4).reshape(3, 3, 3 * C_in, C_out)
            y = jax.lax.conv_general_dilated(
                x2, w2, window_strides=(1, 1), padding=[(1, 1)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return y.reshape(Bs, nzs, y.shape[1], y.shape[2], C_out)

        a = timeit(f"bb conv3d {name}", conv3d, x, w3)
        bres = timeit(f"bb conv2d z-unfold {name}", conv2d_zunfold, x, w3)
        ya = conv3d(x, w3)
        yb = conv2d_zunfold(x, w3)
        err = float(jnp.max(jnp.abs(ya - yb)))
        print(f"  max|conv3d - zunfold| = {err:.3e}  speedup {a/max(bres,1e-9):.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
