"""Stage-2 of the batched-eval corruption hunt: compare det-backbone
level coord sets and BEV features per frame between bs=1 and bs=2.

    python tools/diag_batch2.py
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
from btcdet_tpu.models import build_network
from btcdet_tpu.ops import sparse
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
    b2 = dataset.collate_batch([dataset[0], dataset[1]])
    b1 = dataset.collate_batch([dataset[1]])

    state, _ = trainer_mod.create_train_state(
        net, {k: jnp.asarray(v) for k, v in b2.items() if k != "frame_id"},
        jax.random.PRNGKey(0), det_opt_cfg=cfg.OPTIMIZATION,
        occ_opt_cfg=cfg.get("OCC_OPTIMIZATION", None), total_steps=1)
    mgr = ckpt_mod.CheckpointManager("output/btcdet_overfit/overfit/ckpt")
    restored, _ = mgr.restore(state, mgr.latest_step())
    variables = {"params": restored.params, "batch_stats": restored.batch_stats}

    nz, ny, nx = net.det_grid_size[2] + 1, net.det_grid_size[1], net.det_grid_size[0]

    @jax.jit
    def probe(v, b):
        def run(m, bb, train):
            o = m.occ(bb, train=train)
            B = bb["det_voxels"].reshape(
                -1, bb["det_voxels"].shape[-2], bb["det_voxels"].shape[-1]).shape[0]
            vfeat, occ_code = m.det_vfe(o["det_voxels"], o["det_voxel_num_points"])
            st = sparse.from_coords(
                vfeat, o["det_voxel_coords"], (nz, ny, nx),
                bb["gt_boxes"].shape[0])
            bb_out = m.backbone_3d(st, occ_code, train=train)
            return {
                "c2": bb_out["x_conv2"].coords, "f2": bb_out["x_conv2"].features,
                "c4": bb_out["x_conv4"].coords,
                "enc_coords": bb_out["encoded"].coords,
                "enc_feats": bb_out["encoded"].features,
            }
        return net.apply(v, b, train=False, method=run)

    o1 = jax.device_get(probe(variables, {k: jnp.asarray(v) for k, v in b1.items() if k != "frame_id"}))
    o2 = jax.device_get(probe(variables, {k: jnp.asarray(v) for k, v in b2.items() if k != "frame_id"}))

    for lvl, key in (("x_conv2", "c2"), ("x_conv4", "c4"), ("encoded", "enc_coords")):
        s1 = coord_set(o1[key], 0)
        s2 = coord_set(o2[key], 1)
        print(f"{lvl} frame1 coords: bs1 {len(s1)} bs2 {len(s2)} "
              f"missing {len(s1 - s2)} extra {len(s2 - s1)}")

    # feature agreement on common encoded coords (frame 1)
    def feat_map(coords, feats, b):
        c = np.asarray(coords); f = np.asarray(feats)
        m = c[:, 0] == b
        return {tuple(k): v for k, v in zip(map(tuple, c[m, 1:].tolist()), f[m])}
    fm1 = feat_map(o1["enc_coords"], o1["enc_feats"], 0)
    fm2 = feat_map(o2["enc_coords"], o2["enc_feats"], 1)
    common = set(fm1) & set(fm2)
    if common:
        diffs = np.array([np.abs(fm1[k] - fm2[k]).max() for k in list(common)[:500]])
        print(f"encoded feats frame1: common {len(common)}, "
              f"max|diff| {diffs.max():.5f}, mean {diffs.mean():.6f}")
    fm1 = feat_map(o1["c2"], o1["f2"], 0)
    fm2 = feat_map(o2["c2"], o2["f2"], 1)
    common = set(fm1) & set(fm2)
    if common:
        diffs = np.array([np.abs(fm1[k] - fm2[k]).max() for k in list(common)[:500]])
        print(f"x_conv2 feats frame1: common {len(common)}, "
              f"max|diff| {diffs.max():.5f}, mean {diffs.mean():.6f}")


if __name__ == "__main__":
    main()
