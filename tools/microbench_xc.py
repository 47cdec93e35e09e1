"""Microbench the ConvHead x_combine branch split (Pallas sampler vs
dense conv stack vs BN) and the SA query paths (dense per-grid-point vs
roi-grouped two-stage) at flagship eval shapes, on the current device.

Usage: python tools/microbench_xc.py [B]
"""

import os
import sys
import time

os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.getcwd())

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from btcdet_tpu.ops import group_ops, pallas_interp, sparse


def timeit(name, fn, *args, iters=10):
    # scalar-reduce before fetch: device_get of a multi-MB result pays
    # ~4.8 ms/MB on the tunnel (CLAUDE.md), which swamps the kernel time
    red = jax.jit(lambda *a: jax.tree_util.tree_reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), fn(*a), 0.0))
    r = red(*args)
    float(jax.device_get(r))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = red(*args)
    float(jax.device_get(r))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    N = 100            # eval rois
    G = 27             # 3x3x3 grid
    lz, ly, lx = 2, 4, 12
    L = lz * ly * lx
    C = 128
    R = B * N
    S = G * L
    rng = np.random.RandomState(0)

    # ---- xc branch pieces ------------------------------------------------
    dense = jnp.asarray(rng.randn(B, 11, 200, 176, C).astype(np.float32))
    zyx = jnp.asarray(
        np.stack([
            rng.rand(R, S) * 10, rng.rand(R, S) * 10 + 90,
            rng.rand(R, S) * 10 + 80,
        ], -1).astype(np.float32))
    cyx = jnp.asarray(np.stack(
        [rng.rand(R) * 10 + 95, rng.rand(R) * 10 + 85], -1).astype(np.float32))
    roi_b = jnp.asarray(np.repeat(np.arange(B), N).astype(np.int32))
    val = jnp.ones((R, S), bool)
    tile = pallas_interp.pick_tile(S)

    f_prep = jax.jit(pallas_interp.prep_volume)
    timeit("prep_volume", f_prep, dense)

    f_samp = jax.jit(lambda d, z: pallas_interp.trilinear_pool(
        d, z, cyx, roi_b, val, tile=tile))
    timeit(f"pallas sampler (R={R}, S={S})", f_samp, dense, zyx)

    # conv stack exactly as ConvHead builds it (3 convs + masked BN + relu)
    kernels = [(3, 3, 3), (3, 3, 3), (2, 2, 3)]
    strides = [(1, 1, 2), (1, 2, 2), (2, 2, 3)]
    pads = [(1, 1, 1), (1, 1, 1), (0, 0, 0)]

    class Stack(nn.Module):
        use_bn: bool = True

        @nn.compact
        def __call__(self, g, m):
            for i, (k, s, p) in enumerate(zip(kernels, strides, pads)):
                g = nn.Conv(C, k, strides=s, padding=[(q, q) for q in p],
                            use_bias=False, dtype=jnp.bfloat16,
                            name=f"conv{i}")(g)
                if self.use_bn:
                    sh = g.shape
                    gf = sparse.MaskedBatchNorm(momentum=0.01, epsilon=1e-3)(
                        g.reshape(-1, sh[-1]),
                        jnp.broadcast_to(m[:, None], (sh[0], sh[1] * sh[2] * sh[3])).reshape(-1),
                        use_running_average=True)
                    g = nn.relu(gf).reshape(sh)
                else:
                    g = nn.relu(g)
            return g

    gin = jnp.asarray(rng.randn(R * G, lz, ly, lx, C).astype(np.float32)).astype(jnp.bfloat16)
    m = jnp.ones((R * G,), bool)
    for use_bn in (True, False):
        st = Stack(use_bn=use_bn)
        v = jax.jit(st.init)(jax.random.PRNGKey(0), gin, m)
        f = jax.jit(lambda v, g: st.apply(v, g, m))
        timeit(f"xc conv stack (bn={use_bn}) (RG={R*G})", f, v, gin)

    # ---- SA queries ------------------------------------------------------
    P_raw = 16384
    raw_xyz = jnp.asarray((rng.rand(B, P_raw, 3) * 60 - 30).astype(np.float32))
    raw_mask = jnp.ones((B, P_raw), bool)
    centers = jnp.asarray((rng.rand(B, N, 3) * 50 - 25).astype(np.float32))
    qpts = jnp.asarray(np.asarray(centers)[:, :, None, :]
                       + rng.randn(B, N, G, 3).astype(np.float32))
    new_xyz = qpts.reshape(B, N * G, 3)
    new_mask = jnp.ones((B, N * G), bool)
    raw_radii, raw_ns = [0.4, 0.8, 1.2, 2.4], [16, 16, 32, 64]

    f_old = jax.jit(lambda x, nx: group_ops.multi_ball_query(
        x, raw_mask, nx, new_mask, raw_radii, raw_ns, approx=True))
    timeit("SA raw query dense (M=2700/frame, P=16384)", f_old, raw_xyz, new_xyz)

    for ck in (256, 512, 1024):
        f_new = jax.jit(lambda x, nx, ck=ck: group_ops.multi_ball_query_grouped(
            x, raw_mask, nx, new_mask, raw_radii, raw_ns, centers, G, cand_k=ck))
        timeit(f"SA raw query grouped (cand_k={ck})", f_new, raw_xyz, new_xyz)

    P_occ = 40000
    occ_xyz_np = (rng.rand(B, P_occ, 3) * 60 - 30).astype(np.float32)
    occ_mask_np = np.zeros((B, P_occ), bool)
    occ_mask_np[:, :3000] = True  # typical live occ population
    occ_xyz = jnp.asarray(occ_xyz_np)
    occ_mask = jnp.asarray(occ_mask_np)
    occ_radii, occ_ns = [0.8, 1.2, 2.4], [16, 16, 32]

    f_old_o = jax.jit(lambda x, m, nx: group_ops.multi_ball_query(
        x, m, nx, new_mask, occ_radii, occ_ns, approx=True))
    timeit("SA occ query dense (P=40000, live 3000)", f_old_o, occ_xyz, occ_mask, new_xyz)
    for ck in (256, 512):
        f_new_o = jax.jit(lambda x, m, nx, ck=ck: group_ops.multi_ball_query_grouped(
            x, m, nx, new_mask, occ_radii, occ_ns, centers, G, cand_k=ck))
        timeit(f"SA occ query grouped (cand_k={ck})", f_new_o, occ_xyz, occ_mask, new_xyz)

    # ---- grouped-query stage split --------------------------------------
    def stage1(x, m, ck):
        xsq = jnp.sum(x * x, -1)
        csq = jnp.sum(centers * centers, -1)
        cross = jnp.einsum("brc,bnc->brn", centers, x,
                           preferred_element_type=jnp.float32)
        d2 = csq[..., None] + xsq[:, None, :] - 2.0 * cross
        neg = jnp.where(m[:, None, :], -d2, -jnp.float32(3e38))
        _, cd = jax.lax.approx_max_k(neg, ck, recall_target=0.95)
        return cd.astype(jnp.int32)

    for ck in (256, 512):
        f1 = jax.jit(lambda x, m, ck=ck: stage1(x, m, ck))
        timeit(f"  grouped stage1 only raw (cand_k={ck})", f1, raw_xyz, raw_mask)

    def stage2(cand, x, m, topk_mode):
        packed = jnp.concatenate([x, m[..., None].astype(x.dtype)], -1)
        cg = jax.vmap(lambda t, ix: t[ix])(packed, cand)
        cand_xyz = cg[..., :3]
        cand_ok = cg[..., 3] > 0.5
        qp = qpts
        d2 = (jnp.sum(qp * qp, -1)[..., None]
              + jnp.sum(cand_xyz * cand_xyz, -1)[:, :, None, :]
              - 2.0 * jnp.einsum("brgc,brkc->brgk", qp, cand_xyz,
                                 preferred_element_type=jnp.float32))
        in_any = (d2 <= 2.4 ** 2) & cand_ok[:, :, None, :]
        neg = jnp.where(in_any, -d2, -jnp.float32(3e38))
        if topk_mode == "exact":
            nd, pos = jax.lax.top_k(neg, 64)
        else:
            nd, pos = jax.lax.approx_max_k(neg, 64, recall_target=0.95)
        return nd, pos

    for ck in (256, 512):
        cand = jax.jit(lambda x, m, ck=ck: stage1(x, m, ck))(raw_xyz, raw_mask)
        for mode in ("exact", "approx"):
            f2 = jax.jit(lambda c, x, m, mode=mode: stage2(c, x, m, mode))
            timeit(f"  grouped stage2 only (cand_k={ck}, {mode})", f2, cand, raw_xyz, raw_mask)


if __name__ == "__main__":
    main()
