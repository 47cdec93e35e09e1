"""Measure actual active-site counts (nnz) at every level of the det 3D
backbone on synthetic KITTI-shaped input, to pick static
`BACKBONE_3D.LEVEL_CAPACITIES`. Static capacities are paid on every
frame (rulebooks, gathers, BN all scale with capacity), so caps should
sit just above the observed max (CLAUDE.md perf log).

Usage: python tools/voxel_stats.py [n_frames] [train|test]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from btcdet_tpu.config import cfg_from_yaml_file
from btcdet_tpu.datasets import make_synthetic_batch
from btcdet_tpu.models import build_network
from btcdet_tpu.ops import sparse  # noqa: F401


def main(n_frames=8, mode="test", caps=None):
    cfg = cfg_from_yaml_file("tools/cfgs/model_configs/btcdet_kitti_car.yaml")
    # these diagnostics inspect the materialized merged point table
    cfg.MODEL.OCC.OCC_PNT_UPDATE["FUSED_VFE"] = False
    if caps:  # e.g. "80000,80000,60000,40000" to measure true (uncapped) counts
        cfg.MODEL.BACKBONE_3D.LEVEL_CAPACITIES = [int(c) for c in caps.split(",")]
        print("level caps override:", cfg.MODEL.BACKBONE_3D.LEVEL_CAPACITIES)
    net = build_network(cfg.MODEL, cfg.DATA_CONFIG, cfg.CLASS_NAMES)
    batch0 = {k: jnp.asarray(v) for k, v in make_synthetic_batch(
        cfg.DATA_CONFIG, 1, 16384, 10, mode=mode, seed=0).items()}
    rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = jax.jit(lambda r, b: net.init(r, b, train=False))(rngs, batch0)
    print("params ready", flush=True)

    is_train = mode == "train"

    @jax.jit
    def probe(v, b):
        def run(m, bb, train):
            out = m.occ(bb, train=train) if m.use_occ else dict(bb)
            merged = {**bb, **out}
            vfeat, occ_code = m.det_vfe(
                merged["det_voxels"], merged["det_voxel_num_points"]
            )
            nz, ny, nx = (m.det_grid_size[2], m.det_grid_size[1], m.det_grid_size[0])
            st = sparse.from_coords(
                vfeat, merged["det_voxel_coords"], (nz, ny, nx),
                bb["gt_boxes"].shape[0],
            )
            r = m.backbone_3d(st, occ_code, train=train)
            B = bb["gt_boxes"].shape[0]
            # PassOccVox capacity utilization (tune EVAL_MAX_NUM_OCC_PNTS
            # and OCC_PNT_UPDATE.MERGED_CAP_EXTRA from these)
            occ_pts = out["occ_points_mask"].sum() if m.use_occ else 0
            extra_used = 0
            if m.use_occ:
                mc = merged["det_voxel_coords"].shape[0] // B
                pf = bb["det_voxels"].shape[0] // B
                cc = merged["det_voxel_coords"].reshape(B, mc, 4)
                extra_used = (cc[:, pf:, 0] >= 0).sum(axis=1).max()
            return {
                "occ_pnts": occ_pts,
                "mrg_extra": extra_used,
                "in": st.nnz,
                "x_conv1": r["x_conv1"].nnz,
                "x_conv2": r["x_conv2"].nnz,
                "x_conv3": r["x_conv3"].nnz,
                "x_conv4": r["x_conv4"].nnz,
                "out": r["encoded"].nnz,
                "x_combine": r["x_combine"].nnz if r["x_combine"] is not None else 0,
                "caps": {
                    "in": st.capacity,
                    "x_conv2": r["x_conv2"].capacity,
                    "x_conv3": r["x_conv3"].capacity,
                    "x_conv4": r["x_conv4"].capacity,
                    "out": r["encoded"].capacity,
                },
            }
        if is_train:
            out, _ = net.apply(
                v, b, train=True, method=run, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(3),
                      "sampling": jax.random.PRNGKey(4)},
            )
            return out
        return net.apply(v, b, train=False, method=run)

    stats = {}
    for i in range(int(n_frames)):
        b = {k: jnp.asarray(v) for k, v in make_synthetic_batch(
            cfg.DATA_CONFIG, 1, 16384, 10, mode=mode, seed=100 + i).items()}
        r = jax.device_get(probe(variables, b))
        for k, v in r.items():
            if k == "caps":
                continue
            stats.setdefault(k, []).append(int(v))
        if i == 0:
            print("capacities:", {k: int(v) for k, v in r["caps"].items()}, flush=True)
    for k, vals in stats.items():
        print(f"{k:10s} max={max(vals):7d} mean={np.mean(vals):9.1f}", flush=True)


if __name__ == "__main__":
    main(*(sys.argv[1:] or []))
