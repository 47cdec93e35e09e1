"""Benchmark the real ConvHead module at eval shapes, with per-source
ablations, to find where its time goes inside the flagship model."""

import os
import sys
import time

os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np

from btcdet_tpu.ops import sparse
from btcdet_tpu.models.roi_heads.conv_head import ConvHead


def timeit(name, fn, *args, iters=10):
    r = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(r)[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


def make_inputs(rng, B=1, N=100, P=16384, Q=40000, cap=20480, C=128,
                shape=(11, 200, 176)):
    rois = np.zeros((B, N, 7), np.float32)
    rois[..., 0] = rng.rand(B, N) * 60 + 5
    rois[..., 1] = rng.rand(B, N) * 60 - 30
    rois[..., 2] = rng.rand(B, N) * 2 - 2
    rois[..., 3:6] = rng.rand(B, N, 3) * 2 + 1.5
    rois[..., 6] = rng.rand(B, N) * np.pi
    roi_valid = np.ones((B, N), bool)

    pts = np.stack([
        rng.rand(B, P) * 70, rng.rand(B, P) * 80 - 40, rng.rand(B, P) * 4 - 3,
    ], -1).astype(np.float32)
    occ = np.stack([
        rng.rand(B, Q) * 70, rng.rand(B, Q) * 80 - 40, rng.rand(B, Q) * 4 - 3,
    ], -1).astype(np.float32)

    nz, ny, nx = shape
    n = cap
    b = rng.randint(0, B, n)
    z = rng.randint(0, nz, n)
    y = rng.randint(0, ny, n)
    x = rng.randint(0, nx, n)
    coords = np.unique(np.stack([b, z, y, x], 1), axis=0).astype(np.int32)
    pad = cap - len(coords)
    coords = np.concatenate([coords, np.full((pad, 4), -1, np.int32)])
    feats = rng.randn(cap, C).astype(np.float32)
    xc = sparse.from_coords(jnp.asarray(feats), jnp.asarray(coords), shape, B)

    return dict(
        rois=jnp.asarray(rois), roi_valid=jnp.asarray(roi_valid),
        points_xyz=jnp.asarray(pts), points_feat=jnp.asarray(rng.randn(B, P, 1).astype(np.float32)),
        points_mask=jnp.ones((B, P), bool),
        occ_xyz=jnp.asarray(occ), occ_feat=jnp.asarray(rng.rand(B, Q, 1).astype(np.float32)),
        occ_mask=jnp.ones((B, Q), bool),
        x_combine=xc,
    )


def main():
    rng = np.random.RandomState(0)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    Q = int(sys.argv[2]) if len(sys.argv) > 2 else 40000
    inp = make_inputs(rng, B=B, Q=Q, cap=20480 * max(1, B // 2))

    for label, sources in [
        ("full (xc+raw+occ)", ("x_combine", "raw_points", "occ_points")),
        ("raw only", ("raw_points",)),
        ("occ only", ("occ_points",)),
        ("x_combine only", ("x_combine",)),
    ]:
        head = ConvHead(num_class=1, features_source=sources)
        v = jax.jit(lambda r: head.init(
            {"params": r, "dropout": jax.random.PRNGKey(1)},
            inp["rois"], inp["roi_valid"], inp["points_xyz"], inp["points_feat"],
            inp["points_mask"], inp["occ_xyz"], inp["occ_feat"], inp["occ_mask"],
            inp["x_combine"], False))(jax.random.PRNGKey(0))
        f = jax.jit(lambda v, i: head.apply(
            v, i["rois"], i["roi_valid"], i["points_xyz"], i["points_feat"],
            i["points_mask"], i["occ_xyz"], i["occ_feat"], i["occ_mask"],
            i["x_combine"], False))
        timeit(label, f, v, inp)


if __name__ == "__main__":
    main()
