"""Compare per-frame intermediate tensors between a bs=1 and a bs=2
eval forward to localize the batched-eval corruption (frame b=1 loses
detections at bs=2 while bs=1 is clean).

    python tools/diag_batch.py
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from btcdet_tpu.config import cfg, cfg_from_yaml_file
from btcdet_tpu.datasets.kitti.kitti_dataset import KittiDataset
from btcdet_tpu.datasets.loader import make_loader
from btcdet_tpu.models import build_network
from btcdet_tpu.train import checkpoint as ckpt_mod
from btcdet_tpu.train import trainer as trainer_mod


def coord_set(coords, b):
    c = np.asarray(coords)
    c = c[c[:, 0] == b]
    return set(map(tuple, c[:, 1:].tolist()))


def main():
    cfg_from_yaml_file("output/overfit/btcdet_overfit.yaml", cfg)
    # these diagnostics inspect the materialized merged point table
    cfg.MODEL.OCC.OCC_PNT_UPDATE["FUSED_VFE"] = False
    dataset = KittiDataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES, training=False,
                           root_path=cfg.DATA_CONFIG.DATA_PATH)
    net = build_network(cfg.MODEL, cfg.DATA_CONFIG, cfg.CLASS_NAMES)

    # collate frames 0 and 1 as a bs=2 batch, and frame 1 alone
    items = [dataset[0], dataset[1]]
    b2 = dataset.collate_batch(items)
    b1 = dataset.collate_batch([dataset[1]])

    state, _ = trainer_mod.create_train_state(
        net, {k: jnp.asarray(v) for k, v in b2.items() if k != "frame_id"},
        jax.random.PRNGKey(0), det_opt_cfg=cfg.OPTIMIZATION,
        occ_opt_cfg=cfg.get("OCC_OPTIMIZATION", None), total_steps=1)
    mgr = ckpt_mod.CheckpointManager("output/btcdet_overfit/overfit/ckpt")
    restored, _ = mgr.restore(state, mgr.latest_step())
    variables = {"params": restored.params, "batch_stats": restored.batch_stats}

    @jax.jit
    def occ_out(v, b):
        def run(m, bb, train):
            o = m.occ(bb, train=train)
            return {k: o[k] for k in ("det_voxels", "det_voxel_coords",
                                      "det_voxel_num_points", "occ_points",
                                      "occ_points_mask")}
        return net.apply(v, b, train=False, method=run)

    o1 = jax.device_get(occ_out(variables, {k: jnp.asarray(v) for k, v in b1.items() if k != "frame_id"}))
    o2 = jax.device_get(occ_out(variables, {k: jnp.asarray(v) for k, v in b2.items() if k != "frame_id"}))

    # input det voxels for frame 1 in both runs
    d1 = np.asarray(b1["det_voxel_coords"])  # frame 1 alone (b=0)
    d2 = np.asarray(b2["det_voxel_coords"])  # frames 0+1 (b=0,1)
    s1 = coord_set(d1, 0)
    s2 = coord_set(d2, 1)
    print(f"input det voxels frame1: bs1 {len(s1)} bs2 {len(s2)} "
          f"missing_in_bs2 {len(s1 - s2)} extra {len(s2 - s1)}")

    m1 = coord_set(o1["det_voxel_coords"], 0)
    m2 = coord_set(o2["det_voxel_coords"], 1)
    print(f"merged det voxels frame1: bs1 {len(m1)} bs2 {len(m2)} "
          f"missing_in_bs2 {len(m1 - m2)} extra {len(m2 - m1)}")

    p1 = np.asarray(o1["occ_points"])[0]
    p2 = np.asarray(o2["occ_points"])[1]
    v1 = np.asarray(o1["occ_points_mask"])[0]
    v2 = np.asarray(o2["occ_points_mask"])[1]
    print(f"occ points frame1: bs1 {v1.sum()} bs2 {v2.sum()}")
    if v1.sum() and v2.sum():
        a = set(map(tuple, np.round(p1[v1][:, :3], 2).tolist()))
        b = set(map(tuple, np.round(p2[v2][:, :3], 2).tolist()))
        print(f"  occ xyz set: common {len(a & b)} only_bs1 {len(a - b)} only_bs2 {len(b - a)}")

    # also frame0 at bs2 vs bs=1 frame0 for contrast
    b1f0 = dataset.collate_batch([dataset[0]])
    o1f0 = jax.device_get(occ_out(variables, {k: jnp.asarray(v) for k, v in b1f0.items() if k != "frame_id"}))
    m1f0 = coord_set(o1f0["det_voxel_coords"], 0)
    m2f0 = coord_set(o2["det_voxel_coords"], 0)
    print(f"merged det voxels frame0: bs1 {len(m1f0)} bs2 {len(m2f0)} "
          f"missing_in_bs2 {len(m1f0 - m2f0)} extra {len(m2f0 - m1f0)}")


if __name__ == "__main__":
    main()
