"""Microbenchmark the ConvHead branches at eval shapes on the current
device: multi-scale ball queries (raw + occ), grouping+MLP, and the
x_combine trilinear pool. Identifies the next optimization target.
"""

import os
import sys
import time

os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np

from btcdet_tpu.ops import group_ops
from btcdet_tpu.utils import common


def timeit(name, fn, *args, iters=10):
    r = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(r)[0])  # sync (tunnel-safe)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(r)[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    B, M = 1, 2700
    P_raw, P_occ = 16384, 40000
    rng = np.random.RandomState(0)
    new_xyz = jnp.asarray(rng.randn(B, M, 3).astype(np.float32) * 10)
    new_mask = jnp.ones((B, M), bool)

    raw_xyz = jnp.asarray(rng.randn(B, P_raw, 3).astype(np.float32) * 15)
    raw_mask = jnp.ones((B, P_raw), bool)
    occ_xyz = jnp.asarray(rng.randn(B, P_occ, 3).astype(np.float32) * 15)
    occ_mask = jnp.ones((B, P_occ), bool)

    raw_radii, raw_ns = [0.4, 0.8, 1.2, 2.4], [16, 16, 32, 64]
    occ_radii, occ_ns = [0.8, 1.2, 2.4], [16, 16, 32]

    q_raw = jax.jit(lambda xyz, m, nx, nm: group_ops.multi_ball_query(
        xyz, m, nx, nm, raw_radii, raw_ns, approx=True))
    q_occ = jax.jit(lambda xyz, m, nx, nm: group_ops.multi_ball_query(
        xyz, m, nx, nm, occ_radii, occ_ns, approx=True))
    timeit("raw multi_ball_query (4 scales, P=16k)", q_raw, raw_xyz, raw_mask, new_xyz, new_mask)
    timeit("occ multi_ball_query (3 scales, P=40k)", q_occ, occ_xyz, occ_mask, new_xyz, new_mask)

    # grouping gathers only
    idxs = jax.jit(q_occ)(occ_xyz, occ_mask, new_xyz, new_mask)
    idx0, empty0 = idxs[-1]  # largest nsample=32

    def group_only(xyz, idx, empty):
        return group_ops.group_from_idx(xyz, new_xyz, idx, empty)

    timeit("occ group_from_idx (ns=32)", jax.jit(group_only), occ_xyz, idx0, empty0)

    # trilinear x_combine pool: dense (1, 11, 200, 176, 128), 2700*96 samples
    dense = jnp.asarray(rng.randn(1, 11, 200, 176, 128).astype(np.float32))
    L = 2 * 4 * 12
    pts = jnp.asarray(rng.rand(1, M * L, 3).astype(np.float32))
    zyx = pts * jnp.asarray([10.0, 199.0, 175.0])

    def tri(d, z):
        return jax.vmap(common.trilinear_interpolate_dense)(d, z)

    timeit("x_combine trilinear sample (259k pts, C=128)", jax.jit(tri), dense, zyx)

    # full SA modules with params
    from btcdet_tpu.models.roi_heads.conv_head import ConvHead
    import flax.linen as nn

    class RawSA(nn.Module):
        @nn.compact
        def __call__(self, xyz, m, nx, nm, f):
            sa = group_ops.PointSAModuleMSG(
                radii=raw_radii, nsamples=raw_ns,
                mlps=[[4, 16, 16]] * 4, approx_query=True)
            return sa(xyz, m, nx, nm, features=f, train=False)

    class OccSA(nn.Module):
        @nn.compact
        def __call__(self, xyz, m, nx, nm, f):
            sa = group_ops.PointSAModuleMSG(
                radii=occ_radii, nsamples=occ_ns,
                mlps=[[4, 16, 16]] * 3, approx_query=True)
            return sa(xyz, m, nx, nm, features=f, train=False)

    raw_f = jnp.asarray(rng.randn(B, P_raw, 1).astype(np.float32))
    occ_f = jnp.asarray(rng.randn(B, P_occ, 1).astype(np.float32))
    raw_mod = RawSA()
    v = jax.jit(raw_mod.init)(jax.random.PRNGKey(0), raw_xyz, raw_mask, new_xyz, new_mask, raw_f)
    timeit("raw SA full (query+group+mlp+pool)",
           jax.jit(lambda *a: raw_mod.apply(v, *a)), raw_xyz, raw_mask, new_xyz, new_mask, raw_f)
    occ_mod = OccSA()
    v2 = jax.jit(occ_mod.init)(jax.random.PRNGKey(0), occ_xyz, occ_mask, new_xyz, new_mask, occ_f)
    timeit("occ SA full (query+group+mlp+pool)",
           jax.jit(lambda *a: occ_mod.apply(v2, *a)), occ_xyz, occ_mask, new_xyz, new_mask, occ_f)


if __name__ == "__main__":
    main()
