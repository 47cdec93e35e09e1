"""Stage-wise per-slot probe for the batch-slot bug: runs the overfit
checkpoint on two real frames at B=2 and reports per-slot valid-site
counts and feature norms at every det-backbone level, plus the merged
voxel stats coming out of the occ subnet. CPU (XLA path) by default —
the bug reproduces with BTCDET_PALLAS=0, so no TPU needed.
"""

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
os.chdir(REPO)
sys.path.insert(0, str(REPO))

import numpy as np


def main():
    import jax

    if "--tpu" not in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from btcdet_tpu.config import cfg, cfg_from_yaml_file
    from btcdet_tpu.datasets.kitti.kitti_dataset import KittiDataset
    from btcdet_tpu.models import build_network
    from btcdet_tpu.ops import sparse
    from btcdet_tpu.train import checkpoint as ckpt_mod
    from btcdet_tpu.train import trainer as trainer_mod
    from btcdet_tpu.utils.common import create_logger

    run = Path("output/btcdet_overfit/overfit")
    cfg_from_yaml_file(str(run / "btcdet_overfit.yaml"), cfg)
    # these diagnostics inspect the materialized merged point table
    cfg.MODEL.OCC.OCC_PNT_UPDATE["FUSED_VFE"] = False
    logger = create_logger(None)
    dataset = KittiDataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES, training=False,
                           root_path=cfg.DATA_CONFIG.DATA_PATH, logger=logger)
    net = build_network(cfg.MODEL, cfg.DATA_CONFIG, cfg.CLASS_NAMES)
    batch = dataset.collate_batch([dataset[0], dataset[1]])
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "frame_id"}

    state, _ = trainer_mod.create_train_state(
        net, jb, jax.random.PRNGKey(0),
        det_opt_cfg=cfg.OPTIMIZATION,
        occ_opt_cfg=cfg.get("OCC_OPTIMIZATION", None), total_steps=1)
    mgr = ckpt_mod.CheckpointManager(run / "ckpt")
    state, step = mgr.restore(state, None)
    print(f"restored step {step}", flush=True)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def run_probe(m, bb, train):
        out = m.occ(bb, train=train)
        merged = {**bb, **out}
        vfeat, occ_code = m.det_vfe(
            merged["det_voxels"], merged["det_voxel_num_points"])
        nz, ny, nx = (m.det_grid_size[2] + 1, m.det_grid_size[1],
                      m.det_grid_size[0])
        B = bb["gt_boxes"].shape[0]
        st = sparse.from_coords(
            vfeat, merged["det_voxel_coords"], (nz, ny, nx), B)
        r = m.backbone_3d(st, occ_code, train=train)

        def slot_stats(t):
            bcol = t.coords[:, 0]
            fnorm = jnp.linalg.norm(
                t.features.astype(jnp.float32), axis=-1)
            return {
                f"n{b}": (bcol == b).sum() for b in range(B)
            } | {
                f"fsum{b}": jnp.where(bcol == b, fnorm, 0.0).sum()
                for b in range(B)
            }

        res = {
            "in": slot_stats(st),
            "x_conv1": slot_stats(r["x_conv1"]) if "x_conv1" in r else {},
            "x_conv2": slot_stats(r["x_conv2"]),
            "x_conv3": slot_stats(r["x_conv3"]),
            "x_conv4": slot_stats(r["x_conv4"]),
            "encoded": slot_stats(r["encoded"]),
        }
        mcoords = merged["det_voxel_coords"]
        mvalid = mcoords[:, 0]
        res["merged"] = {f"n{b}": (mvalid == b).sum() for b in range(B)}
        pf = bb["det_voxels"].shape[0] // B
        mc = mcoords.shape[0] // B
        cc = mcoords.reshape(B, mc, 4)
        res["merged_extra"] = {
            f"n{b}": (cc[b, pf:, 0] >= 0).sum() for b in range(B)}
        res["det_in"] = {
            f"n{b}": (bb["det_voxel_coords"][:, 0] == b).sum()
            for b in range(B)}
        return res

    probe = jax.jit(lambda v, b: net.apply(v, b, train=False, method=run_probe))
    r = jax.device_get(probe(variables, jb))
    for stage, d in r.items():
        print(stage, {k: float(v) if "fsum" in k else int(v)
                      for k, v in sorted(d.items())}, flush=True)


if __name__ == "__main__":
    main()
