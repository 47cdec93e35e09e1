"""Synthetic KITTI-like batches for tests and benchmarking.

Produces the exact batch-dict layout the detector consumes (static
shapes; same keys the real KITTI pipeline emits), with random points
plus a few planted car-like boxes whose interiors are densified so the
occ/fore machinery has signal.
"""

from __future__ import annotations

import numpy as np

from ..ops import voxelizer
from ..utils import coords as coords_utils


def _plant_boxes(rng, n, point_range):
    lo = np.asarray(point_range[:3])
    hi = np.asarray(point_range[3:6])
    ctr = rng.uniform(lo + 3, np.maximum(lo + 3.5, hi - 3), size=(n, 3))
    ctr[:, 2] = rng.uniform(-1.2, -0.6, size=n)
    dims = np.stack([
        rng.uniform(3.4, 4.4, n), rng.uniform(1.5, 1.8, n), rng.uniform(1.4, 1.7, n)
    ], axis=1)
    yaw = rng.uniform(-np.pi, np.pi, size=n)
    return np.concatenate([ctr, dims, yaw[:, None]], axis=1).astype(np.float32)


def make_synthetic_batch(
    data_cfg,
    batch_size: int = 2,
    num_points: int = 16384,
    num_gt: int = 10,
    seed: int = 0,
    mode: str = "train",
    max_bm_points: int = 2048,
):
    """Returns a dict of numpy arrays shaped like the real pipeline output."""
    rng = np.random.RandomState(seed)
    pcr = np.asarray(data_cfg.POINT_CLOUD_RANGE, np.float64)

    det_cfg = occ_cfg = None
    for proc in data_cfg.DATA_PROCESSOR:
        if proc.NAME in ("det_transform_points_to_voxels", "transform_points_to_voxels"):
            det_cfg = proc
        if proc.NAME == "transform_points_to_sphere_voxels":
            occ_cfg = proc
    assert det_cfg is not None

    use_occ = data_cfg.get("OCC", None) is not None and occ_cfg is not None

    batch = {}
    pts_list, det_v, det_c, det_n = [], [], [], []
    occ_v, occ_c, occ_n = [], [], []
    gt_list, mirr_list, bm_list, bm_mask_list = [], [], [], []

    det_max_vox = int(det_cfg.MAX_NUMBER_OF_VOXELS[mode])
    occ_max_vox = int(occ_cfg.MAX_NUMBER_OF_VOXELS[mode]) if use_occ else 0

    for b in range(batch_size):
        # LiDAR-like background: a ground surface plus a few vertical
        # walls, so voxel-neighborhood statistics resemble real scans
        # (uniform 3D noise would make every voxel isolated)
        n_bg = num_points * 3 // 4
        n_ground = n_bg * 2 // 3
        gxy = rng.uniform(pcr[:2], pcr[3:5], size=(n_ground, 2))
        gz = -1.7 + 0.04 * np.sin(gxy[:, 0]) + rng.randn(n_ground) * 0.02
        ground = np.concatenate([gxy, gz[:, None]], axis=1)
        n_wall = n_bg - n_ground
        n_walls = 6
        per_wall = n_wall // n_walls
        walls = []
        for w in range(n_walls):
            x0 = rng.uniform(pcr[0] + 5, pcr[3] - 5)
            y0 = rng.uniform(pcr[1] + 5, pcr[4] - 5)
            ang = rng.uniform(0, np.pi)
            t = rng.uniform(-4, 4, per_wall)
            walls.append(np.stack([
                x0 + t * np.cos(ang) + rng.randn(per_wall) * 0.02,
                y0 + t * np.sin(ang) + rng.randn(per_wall) * 0.02,
                rng.uniform(-1.7, 0.8, per_wall),
            ], axis=1))
        bg = np.concatenate([ground] + walls, axis=0)[:n_bg]
        if len(bg) < n_bg:
            bg = np.concatenate([bg, ground[: n_bg - len(bg)]], axis=0)
        bg = np.clip(bg, pcr[:3] + 1e-3, pcr[3:6] - 1e-3)
        pts = np.concatenate([bg, rng.rand(n_bg, 1)], axis=1).astype(np.float32)

        boxes = _plant_boxes(rng, num_gt, pcr)
        # densify box interiors (front-ish half, crude self-occlusion)
        obj_pts = []
        per_box = (num_points - n_bg) // max(num_gt, 1)
        for box in boxes:
            local = rng.uniform(-0.5, 0.5, size=(per_box, 3)) * box[3:6]
            local = local[local[:, 0] < 0.25 * box[3]]  # drop far side
            c, s = np.cos(box[6]), np.sin(box[6])
            world = np.stack([
                local[:, 0] * c - local[:, 1] * s + box[0],
                local[:, 0] * s + local[:, 1] * c + box[1],
                local[:, 2] + box[2],
            ], axis=1)
            obj_pts.append(np.concatenate([world, rng.rand(len(world), 1) * 0.5], axis=1))
        pts = np.concatenate([pts] + obj_pts, axis=0).astype(np.float32)[:num_points]
        if len(pts) < num_points:
            pts = np.concatenate([pts, np.zeros((num_points - len(pts), 4), np.float32)])
        pts_list.append(pts)

        v, c, n = voxelizer.voxelize_np(
            pts, pcr, det_cfg.VOXEL_SIZE, int(det_cfg.MAX_POINTS_PER_VOXEL), det_max_vox
        )
        det_v.append(v)
        det_c.append(np.concatenate(
            [np.where(c[:, :1] >= 0, b, -1), c], axis=1))
        det_n.append(n)

        gt = np.zeros((max(num_gt, 1), 8), np.float32)
        gt[:num_gt, :7] = boxes
        gt[:num_gt, 7] = 1  # class Car
        gt_list.append(gt)
        mirr_list.append((gt[:, 7] > 0).astype(np.float32))

        if use_occ:
            occ_pcr = np.asarray(data_cfg.OCC.POINT_CLOUD_RANGE, np.float64)
            cyl = coords_utils.absxyz_to_cylinder(pts)
            vo, co, no = voxelizer.voxelize_np(
                np.asarray(cyl), occ_pcr, data_cfg.OCC.VOXEL_SIZE,
                int(occ_cfg.MAX_POINTS_PER_VOXEL), occ_max_vox,
            )
            occ_v.append(vo)
            occ_c.append(np.concatenate(
                [np.where(co[:, :1] >= 0, b, -1), co], axis=1))
            occ_n.append(no)

            # bm points: mirrored box-interior points stand in for the
            # offline best-match shapes
            bm = np.zeros((max_bm_points, 3), np.float32)
            bm_m = np.zeros((max_bm_points,), bool)
            allobj = np.concatenate(obj_pts, axis=0)[:, :3] if obj_pts else np.zeros((0, 3))
            k = min(len(allobj), max_bm_points)
            bm[:k] = allobj[:k]
            bm_m[:k] = True
            bm_list.append(bm)
            bm_mask_list.append(bm_m)

    batch["points"] = np.stack(pts_list)
    batch["points_mask"] = np.abs(batch["points"][..., :3]).sum(-1) > 0
    batch["voxels"] = np.concatenate(det_v)
    batch["voxel_coords"] = np.concatenate(det_c)
    batch["voxel_num_points"] = np.concatenate(det_n)
    batch["gt_boxes"] = np.stack(gt_list)
    batch["box_mirr_flag"] = np.stack(mirr_list)
    if use_occ:
        batch["det_voxels"] = batch.pop("voxels")
        batch["det_voxel_coords"] = batch.pop("voxel_coords")
        batch["det_voxel_num_points"] = batch.pop("voxel_num_points")
        # occ path consumes occ_* keys; det path re-reads merged voxels
        batch["occ_voxels"] = np.concatenate(occ_v)
        batch["occ_voxel_coords"] = np.concatenate(occ_c)
        batch["occ_voxel_num_points"] = np.concatenate(occ_n)
        batch["rot_z"] = np.zeros((batch_size,), np.float32)
        batch["use_occ_prob"] = np.ones((batch_size,), bool)
        batch["bm_points"] = np.stack(bm_list)
        batch["bm_points_mask"] = np.stack(bm_mask_list)
    return batch
