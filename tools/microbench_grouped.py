"""Bisect multi_ball_query_grouped's cost on TPU: time the function
truncated at successive stages to find where the wall-clock goes."""

import os
import sys
import time

os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np

from btcdet_tpu.ops import group_ops


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


def grouped_upto(xyz, xyz_mask, new_xyz, new_mask, radii, nsamples,
                 group_centers, group_size, cand_k, stop):
    """Copy of multi_ball_query_grouped with a `stop` stage."""
    B, N, _ = xyz.shape
    RG = new_xyz.shape[1]
    G = int(group_size)
    R = RG // G
    k_max = max(int(k) for k in nsamples)
    r2 = [(0.0, float(r) ** 2) for r in radii]
    BIG = jnp.float32(3.0e38)
    cand_k = min(int(cand_k), N)

    iota_n = jnp.arange(N, dtype=jnp.int32)
    nvalid = jnp.max(jnp.where(xyz_mask, iota_n[None, :], -1)) + 1
    tiers = [t for t in (4096, 16384) if cand_k < t < N]

    xyz_sq = jnp.sum(xyz * xyz, axis=-1)
    c_sq = jnp.sum(group_centers * group_centers, axis=-1)

    def cands_width(width):
        x = xyz[:, :width]
        m = xyz_mask[:, :width]
        cross = jnp.einsum("brc,bnc->brn", group_centers, x,
                           preferred_element_type=jnp.float32)
        d2 = c_sq[..., None] + xyz_sq[:, None, :width] - 2.0 * cross
        neg = jnp.where(m[:, None, :], -d2, -BIG)
        _, cd = jax.lax.approx_max_k(neg, cand_k, recall_target=0.95)
        return cd.astype(jnp.int32)

    def tier(i):
        if i == len(tiers):
            return lambda: cands_width(N)
        return lambda: jax.lax.cond(
            nvalid <= tiers[i], lambda: cands_width(tiers[i]), tier(i + 1))

    cand = tier(0)()
    if stop == "stage1":
        return cand
    packed = jnp.concatenate(
        [xyz, xyz_mask[..., None].astype(xyz.dtype)], axis=-1)
    cg = jax.vmap(lambda t, ix: t[ix])(packed, cand)
    cand_xyz = cg[..., :3]
    cand_ok = cg[..., 3] > 0.5
    if stop == "gather":
        return cg

    qpts = new_xyz.reshape(B, R, G, 3)
    d2 = jnp.sum(qpts * qpts, -1)[..., None] + jnp.sum(
        cand_xyz * cand_xyz, -1)[:, :, None, :] - 2.0 * jnp.einsum(
        "brgc,brkc->brgk", qpts, cand_xyz,
        preferred_element_type=jnp.float32)
    if stop == "d2":
        return d2
    cand_okg = cand_ok[:, :, None, :]
    r_out_max = max(hi for _, hi in r2)
    in_any = (d2 <= r_out_max) & cand_okg
    neg = jnp.where(in_any, -d2, -BIG)
    nd, pos = jax.lax.top_k(neg, k_max)
    if stop == "topk":
        return nd, pos
    sel_d2 = -nd
    sel_ok = nd > -BIG / 2
    sel_idx = jnp.take_along_axis(
        jnp.broadcast_to(cand[:, :, None, :], d2.shape), pos, axis=-1)
    if stop == "selidx":
        return sel_idx

    qm = new_mask.reshape(B, R, G)
    out = []
    for (lo, hi), ks in zip(r2, nsamples):
        in_s = sel_ok & (sel_d2 <= hi) & (sel_d2 >= lo)
        sc = jnp.where(in_s, -sel_idx.astype(jnp.float32), -BIG)
        ss, p2 = jax.lax.top_k(sc, int(ks))
        found = ss > -BIG / 2
        sel = jnp.take_along_axis(sel_idx, p2, axis=-1)
        first = sel[..., 0:1]
        sel = jnp.where(found, sel, first)
        empty = (~found[..., 0]) | ~qm
        sel = jnp.where(empty[..., None], 0, sel)
        out.append((sel.reshape(B, RG, int(ks)).astype(jnp.int32),
                    empty.reshape(B, RG)))
    return out


def main():
    B, N, G = 8, 100, 27
    P = 16384
    rng = np.random.RandomState(0)
    xyz = jnp.asarray((rng.rand(B, P, 3) * 60 - 30).astype(np.float32))
    mask = jnp.ones((B, P), bool)
    centers = jnp.asarray((rng.rand(B, N, 3) * 50 - 25).astype(np.float32))
    qpts = jnp.asarray(np.asarray(centers)[:, :, None, :]
                       + rng.randn(B, N, G, 3).astype(np.float32))
    new_xyz = qpts.reshape(B, N * G, 3)
    new_mask = jnp.ones((B, N * G), bool)
    radii, ns = [0.4, 0.8, 1.2, 2.4], [16, 16, 32, 64]

    for stop in ("stage1", "gather", "d2", "topk", "selidx", "full"):
        f = jax.jit(lambda x, m, nx, stop=stop: grouped_upto(
            x, m, nx, new_mask, radii, ns, centers, G, 512, stop))
        timeit(f"grouped upto {stop}", f, xyz, mask, new_xyz)


if __name__ == "__main__" and (len(sys.argv) == 1 or sys.argv[1] != "v2"):
    main()


def grouped_v2(xyz, xyz_mask, new_xyz, new_mask, radii, nsamples,
               group_centers, group_size, cand_k):
    """Layout-friendly rework: 2-D shapes throughout the tail, flat
    gathers instead of batched take_along_axis."""
    B, N, _ = xyz.shape
    RG = new_xyz.shape[1]
    G = int(group_size)
    R = RG // G
    k_max = max(int(k) for k in nsamples)
    r2 = [(0.0, float(r) ** 2) for r in radii]
    BIG = jnp.float32(3.0e38)
    ck = min(int(cand_k), N)

    iota_n = jnp.arange(N, dtype=jnp.int32)
    nvalid = jnp.max(jnp.where(xyz_mask, iota_n[None, :], -1)) + 1
    tiers = [t for t in (4096, 16384) if ck < t < N]
    xyz_sq = jnp.sum(xyz * xyz, axis=-1)
    c_sq = jnp.sum(group_centers * group_centers, axis=-1)

    def cands_width(width):
        x = xyz[:, :width]
        m = xyz_mask[:, :width]
        cross = jnp.einsum("brc,bnc->brn", group_centers, x,
                           preferred_element_type=jnp.float32)
        d2 = c_sq[..., None] + xyz_sq[:, None, :width] - 2.0 * cross
        neg = jnp.where(m[:, None, :], -d2, -BIG)
        _, cd = jax.lax.approx_max_k(neg, ck, recall_target=0.95)
        return cd.astype(jnp.int32)

    def tier(i):
        if i == len(tiers):
            return lambda: cands_width(N)
        return lambda: jax.lax.cond(
            nvalid <= tiers[i], lambda: cands_width(tiers[i]), tier(i + 1))

    cand = tier(0)()                                   # (B, R, ck)
    packed = jnp.concatenate(
        [xyz, xyz_mask[..., None].astype(xyz.dtype)], axis=-1)
    # flat gather: global row ids
    grow = cand + (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
    cg = packed.reshape(B * N, 4)[grow.reshape(-1)].reshape(B * R, ck, 4)
    cand_xyz = cg[..., :3]
    cand_ok = cg[..., 3] > 0.5

    qp = new_xyz.reshape(B * R, G, 3)
    d2 = (jnp.sum(qp * qp, -1)[..., None]
          + jnp.sum(cand_xyz * cand_xyz, -1)[:, None, :]
          - 2.0 * jnp.einsum("rgc,rkc->rgk", qp, cand_xyz,
                             preferred_element_type=jnp.float32))
    r_out_max = max(hi for _, hi in r2)
    in_any = (d2 <= r_out_max) & cand_ok[:, None, :]
    neg = jnp.where(in_any, -d2, -BIG).reshape(B * R * G, ck)
    nd, pos = jax.lax.top_k(neg, k_max)                # (BRG, k_max)
    sel_d2 = -nd
    sel_ok = nd > -BIG / 2
    crow = jnp.repeat(jnp.arange(B * R, dtype=jnp.int32) * ck, G)
    sel_idx = cand.reshape(-1)[(pos + crow[:, None]).reshape(-1)].reshape(
        B * R * G, k_max)

    qm = new_mask.reshape(B * R * G)
    srow = jnp.arange(B * R * G, dtype=jnp.int32) * k_max
    out = []
    for (lo, hi), ks in zip(r2, nsamples):
        in_s = sel_ok & (sel_d2 <= hi) & (sel_d2 >= lo)
        sc = jnp.where(in_s, -sel_idx.astype(jnp.float32), -BIG)
        ss, p2 = jax.lax.top_k(sc, int(ks))            # (BRG, ks)
        found = ss > -BIG / 2
        sel = sel_idx.reshape(-1)[(p2 + srow[:, None]).reshape(-1)].reshape(
            B * R * G, int(ks))
        first = sel[:, 0:1]
        sel = jnp.where(found, sel, first)
        empty = (~found[:, 0]) | ~qm
        sel = jnp.where(empty[:, None], 0, sel)
        out.append((sel.reshape(B, RG, int(ks)).astype(jnp.int32),
                    empty.reshape(B, RG)))
    return out


def main_v2():
    B, N, G = 8, 100, 27
    P = 16384
    rng = np.random.RandomState(0)
    xyz = jnp.asarray((rng.rand(B, P, 3) * 60 - 30).astype(np.float32))
    mask = jnp.ones((B, P), bool)
    centers = jnp.asarray((rng.rand(B, N, 3) * 50 - 25).astype(np.float32))
    qpts = jnp.asarray(np.asarray(centers)[:, :, None, :]
                       + rng.randn(B, N, G, 3).astype(np.float32))
    new_xyz = qpts.reshape(B, N * G, 3)
    new_mask = jnp.ones((B, N * G), bool)
    radii, ns = [0.4, 0.8, 1.2, 2.4], [16, 16, 32, 64]
    for ck in (256, 512):
        f = jax.jit(lambda x, m, nx, ck=ck: grouped_v2(
            x, m, nx, new_mask, radii, ns, centers, G, ck))
        timeit(f"grouped_v2 full (cand_k={ck})", f, xyz, mask, new_xyz)
    # correctness vs v1 on CPU-comparable shapes is covered by tests; here
    # compare v1 vs v2 outputs directly on device
    f1 = jax.jit(lambda x, m, nx: group_ops.multi_ball_query_grouped(
        x, m, nx, new_mask, radii, ns, centers, G, cand_k=512))
    f2 = jax.jit(lambda x, m, nx: grouped_v2(
        x, m, nx, new_mask, radii, ns, centers, G, 512))
    o1 = f1(xyz, mask, new_xyz)
    o2 = f2(xyz, mask, new_xyz)
    for (i1, e1), (i2, e2) in zip(o1, o2):
        same_i = bool(jnp.all(i1 == i2))
        same_e = bool(jnp.all(e1 == e2))
        print("v1==v2 idx", same_i, "empty", same_e)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "v2":
    main_v2()
