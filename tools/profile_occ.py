"""Fine-grained occ-subnet profile (VERDICT r4 next #7: byte diet).

Times each occ sub-stage as its own jitted program with XLA cost
analysis, so the 63%-of-roofline occ prefix (docs/runs/r4/
roofline_40k_b8_tiered.log line 3) decomposes into named byte movers.

    PROFILE_COST=1 python tools/profile_occ.py [--batch_size 8]
"""

import argparse
import os
import sys
from pathlib import Path

os.chdir(Path(__file__).resolve().parent.parent)
sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np

from tools.profile_stages import timeit  # scalar-fetch timing + cost cols


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--train", action="store_true",
                    help="profile the train-mode chain (loss masks alive)")
    args = ap.parse_args()

    from btcdet_tpu.config import cfg_from_yaml_file
    from btcdet_tpu.datasets import make_synthetic_batch
    from btcdet_tpu.models import build_network
    from btcdet_tpu.models.occ import occ_targets as T
    from btcdet_tpu.utils import coords as coords_utils

    cfg = cfg_from_yaml_file("tools/cfgs/model_configs/btcdet_kitti_car.yaml")
    net = build_network(cfg.MODEL, cfg.DATA_CONFIG, cfg.CLASS_NAMES)
    mode = "train" if args.train else "test"
    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(
            cfg.DATA_CONFIG, args.batch_size, 16384, 10, mode=mode
        ).items()
    }
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), batch)
    print("params ready", flush=True)
    train = bool(args.train)

    def occ_ctx(bb):
        """Shared unpacking mirroring OccSubnet.__call__."""
        voxels = bb["occ_voxels"]
        vcoords = bb["occ_voxel_coords"]
        vnum = bb["occ_voxel_num_points"]
        gt_boxes = bb["gt_boxes"]
        B = gt_boxes.shape[0]
        rot_z = bb.get("rot_z", jnp.zeros((B,), jnp.float32))
        mirr = bb.get("box_mirr_flag", jnp.ones(gt_boxes.shape[:2], jnp.float32))
        slot = (jnp.arange(voxels.shape[1])[None, :] < vnum[:, None]) & (
            vcoords[:, :1] >= 0)
        return voxels, vcoords, vnum, gt_boxes, rot_z, mirr, slot, B

    def probe(name, fn, iters=None):
        @jax.jit
        def f(v, b):
            return net.apply(v, b, train=train, method=fn)
        timeit(name, f, variables, batch, iters=iters or args.iters)

    # ---- full occ subnet (reference point)
    probe("occ subnet (+merge)",
          lambda m, bb, train: m.occ(bb, train=train))

    # ---- targets chain, split
    def mk(pieces):
        def run(m, bb, train):
            o = m.occ
            spec = o.spec
            nx, ny, nz = spec.grid_size
            grid = (nx, ny, nz)
            voxels, vcoords, vnum, gt_boxes, rot_z, mirr, slot, B = occ_ctx(bb)
            pts_abs = coords_utils.occ_uvd_to_absxyz(
                voxels[..., 0], voxels[..., 1], voxels[..., 2], spec.coord_type)
            N, P, _ = pts_abs.shape
            pts = pts_abs.reshape(N * P, 3)
            pvalid = slot.reshape(N * P)
            pb = jnp.where(pvalid, jnp.repeat(vcoords[:, 0], P), 0)
            pcoords = jnp.repeat(vcoords, P, axis=0)
            gt_valid = gt_boxes[..., 7] > 1e-2
            outs = []
            if "voxelwise" in pieces or "vcc" in pieces:
                voxelwise = T.scatter_mask(vcoords, vcoords[:, 0] >= 0, B, grid)
                if "voxelwise" in pieces:
                    outs.append(voxelwise)
            if "vcc" in pieces:
                outs.append(T.dilate_predict_area(
                    voxelwise, spec.dist_kern, spec.concede_x))
            if "occlusion" in pieces:
                occl = T.occlusion_mask(spec, pts, pvalid, pb, rot_z, B)
                outs.append(occl)
            if "fore" in pieces:
                fore_p, mirr_pts, mirr_val = T.mirror_points_in_boxes_blocked(
                    pts, pvalid, gt_boxes, gt_valid, mirr, B)
                outs.append(T.scatter_mask(pcoords, fore_p, B, grid))
                if "mirr" in pieces:
                    mirr_occ = T.world_to_occ_coords(mirr_pts, rot_z[pb], spec)
                    mc, minr = T.points_to_grid_coords(mirr_occ, spec)
                    mcoords = jnp.concatenate([pb[:, None], mc[:, ::-1]], 1)
                    outs.append(T.scatter_mask(mcoords, mirr_val & minr, B, grid))
            if "bm" in pieces and bb.get("bm_points") is not None:
                bm_pts = bb["bm_points"]
                Bb, Nbm, _ = bm_pts.shape
                bmp = bm_pts.reshape(B * Nbm, 3)
                bmv = bb["bm_points_mask"].reshape(B * Nbm)
                in_gt = T.points_in_gt_blocked(bmp, bmv, gt_boxes, gt_valid, B)
                bm_occ = T.world_to_occ_coords(
                    bmp, rot_z[jnp.repeat(jnp.arange(B, dtype=jnp.int32), Nbm)],
                    spec)
                bc, binr = T.points_to_grid_coords(bm_occ, spec)
                outs.append(T.scatter_mask(
                    jnp.concatenate(
                        [jnp.repeat(jnp.arange(B, dtype=jnp.int32), Nbm)[:, None],
                         bc[:, ::-1]], 1),
                    in_gt & binr, B, grid))
            return outs
        return run

    probe("targets: voxelwise scatter", mk({"voxelwise"}))
    probe("targets: +vcc dilation", mk({"voxelwise", "vcc"}))
    probe("targets: occlusion mask", mk({"occlusion"}))
    probe("targets: fore (pts-in-box)", mk({"fore"}))
    probe("targets: fore+mirr chain", mk({"fore", "mirr"}))
    probe("targets: bm chain", mk({"bm"}))

    def full_targets(m, bb, train):
        o = m.occ
        spec = o.spec
        voxels, vcoords, vnum, gt_boxes, rot_z, mirr, slot, B = occ_ctx(bb)
        pts_abs = coords_utils.occ_uvd_to_absxyz(
            voxels[..., 0], voxels[..., 1], voxels[..., 2], spec.coord_type)
        occ_pnts = jnp.concatenate([pts_abs, voxels[..., 3:]], axis=-1)
        tgt = o._make_targets(occ_pnts, slot, vcoords, gt_boxes, mirr, bb,
                              rot_z, B, train)
        return [v for v in tgt.values() if v is not None]

    probe("targets: FULL chain", full_targets)

    # ---- VFE + dense scatter
    def vfe_dense(m, bb, train):
        o = m.occ
        spec = o.spec
        nx, ny, nz = spec.grid_size
        voxels, vcoords, vnum, gt_boxes, rot_z, mirr, slot, B = occ_ctx(bb)
        pts_abs = coords_utils.occ_uvd_to_absxyz(
            voxels[..., 0], voxels[..., 1], voxels[..., 2], spec.coord_type)
        occ_pnts = jnp.concatenate([pts_abs, voxels[..., 3:]], axis=-1)
        vfe_voxels = occ_pnts if o.use_absxyz in (True, "absxyz") else voxels
        if o.use_absxyz == "both":
            vfe_voxels = jnp.concatenate([pts_abs, voxels], axis=-1)
        coord_valid = vcoords[:, 0] >= 0
        feat = o.vfe(vfe_voxels, jnp.where(coord_valid, vnum, 0))
        ncell = nz * ny * nx
        lin = (vcoords[:, 1] * ny + vcoords[:, 2]) * nx + vcoords[:, 3]
        idx = jnp.where(coord_valid, vcoords[:, 0] * ncell + lin, B * ncell)
        return jnp.zeros((B * ncell + 1, feat.shape[-1]), feat.dtype).at[
            idx].set(jnp.where(coord_valid[:, None], feat, 0.0))

    probe("VFE + dense scatter", vfe_dense)

    # ---- backbone + head on a fixed dense input
    def bb_head(m, bb, train):
        o = m.occ
        spec = o.spec
        nx, ny, nz = spec.grid_size
        voxels, vcoords, vnum, gt_boxes, rot_z, mirr, slot, B = occ_ctx(bb)
        grid = (nx, ny, nz)
        voxelwise = T.scatter_mask(vcoords, vcoords[:, 0] >= 0, B, grid)
        cin = {"absxyz": 4, True: 4}.get(o.use_absxyz, voxels.shape[-1])
        if o.use_absxyz == "both":
            cin = 4 + voxels.shape[-1]
        from btcdet_tpu.utils import common
        dense = jnp.ones((B, nz, ny, nx, cin), common.activation_dtype())
        x, mask = o.backbone(dense, voxelwise, train=train)
        logits = o.conv_cls(x)
        if o.is_softmax:
            prob = jax.nn.softmax(logits, axis=-1)[..., -1]
        else:
            prob = jax.nn.sigmoid(logits[..., -1])
        outs = [prob]
        if o.reg:
            outs.append(o.conv_res(x))
        return outs

    probe("backbone + head (dense in)", bb_head)


if __name__ == "__main__":
    main()
