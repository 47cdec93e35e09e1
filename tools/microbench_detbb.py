"""Per-level latency breakdown of the det 3D backbone at reference eval
caps (40k det voxels, B=8): successive `stop_after` prefixes of
VoxelBackBone8xOcc fed the REAL PassOccVox-merged voxel set, so channel
counts and occupancy match the in-model call exactly. Prefix deltas are
trustworthy per-level costs (XLA DCEs everything past the early
return).

    python tools/microbench_detbb.py [batch_size] [det_vox_cap]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from btcdet_tpu.config import cfg_from_yaml_file
from btcdet_tpu.datasets import make_synthetic_batch
from btcdet_tpu.models import build_network
from btcdet_tpu.ops import sparse


def timeit(name, fn, *args, iters=5):
    @jax.jit
    def red(*a):
        leaves = jax.tree_util.tree_leaves(fn(*a))
        return sum(l.sum().astype(jnp.float32)
                   for l in leaves if hasattr(l, "dtype"))

    _ = jax.device_get(red(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = red(*args)
    _ = jax.device_get(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s} {dt*1000:9.2f} ms", flush=True)
    return dt


def main(batch_size=8, det_vox_cap=40000, occ_vox_cap=40000):
    cfg = cfg_from_yaml_file("tools/cfgs/model_configs/btcdet_kitti_car.yaml")
    for proc in cfg.DATA_CONFIG.DATA_PROCESSOR:
        if proc.NAME == "transform_points_to_sphere_voxels" and occ_vox_cap:
            proc.MAX_NUMBER_OF_VOXELS["test"] = occ_vox_cap
        if proc.NAME == "det_transform_points_to_voxels" and det_vox_cap:
            proc.MAX_NUMBER_OF_VOXELS["test"] = det_vox_cap
    net = build_network(cfg.MODEL, cfg.DATA_CONFIG, cfg.CLASS_NAMES)
    batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(
        cfg.DATA_CONFIG, batch_size, 16384, 10, mode="test").items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = jax.jit(lambda r, b: net.init(r, b, train=False))(rngs, batch)
    print("params ready", flush=True)

    nz, ny, nx = (net.det_grid_size[2] + 1, net.det_grid_size[1],
                  net.det_grid_size[0])

    @jax.jit
    def merged_inputs(v, b):
        def run(m, bb, train):
            o = m.occ(bb, train=train)
            if "det_voxel_features" in o:
                vfeat, occ_code = o["det_voxel_features"], o["det_occ_code"]
            else:
                vfeat, occ_code = m.det_vfe(
                    o["det_voxels"], o["det_voxel_num_points"])
            return vfeat, occ_code, o["det_voxel_coords"]
        return net.apply(v, b, train=False, method=run)

    mv, mo, mc = merged_inputs(variables, batch)
    b2 = dict(batch)
    b2["det_vfeat"], b2["det_occ_code"], b2["det_voxel_coords"] = mv, mo, mc
    live = jax.device_get((mc[:, 0] >= 0).sum())
    print(f"live merged voxels: {live} / cap {mc.shape[0]}", flush=True)

    def bb_prefix(stop):
        @jax.jit
        def f(v, b):
            def run(m, bb, train):
                st, occ = sparse.from_coords(
                    bb["det_vfeat"], bb["det_voxel_coords"],
                    (nz, ny, nx), batch_size, aux=bb["det_occ_code"])
                out = m.backbone_3d(st, occ, train=train,
                                    stop_after=stop)
                ret = next(iter(out.values()))
                return ret.features if hasattr(ret, "features") else ret
            return net.apply(v, b, train=False, method=run)
        return f

    prev = 0.0
    for stop, label in [("conv1", "L1 (2x subm C16 @input cap)"),
                        ("conv2s", "+spconv2 (strided, site-gen)"),
                        ("conv2", "+2x subm C32 @L2 cap"),
                        ("conv3s", "+spconv3"),
                        ("conv3", "+2x subm C64 @L3 cap"),
                        ("conv4", "+L4 (spconv + 2 subm C64)"),
                        ("out", "+conv_out (z-down C128)"),
                        (None, "+res_combine (full)")]:
        dt = timeit(f"bb prefix: {label}", bb_prefix(stop),
                    variables, b2, iters=5)
        print(f"{'':36s}   delta {1000*(dt - prev):7.2f} ms", flush=True)
        prev = dt


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8,
         int(sys.argv[2]) if len(sys.argv) > 2 else 40000)
