"""Synthetic on-disk KITTI tree: velodyne .bin + calib + labels +
planes + ImageSets, with planted cars whose interiors carry dense
points. Used by the pipeline tests and the overfit-to-convergence proof
(tools/overfit_proof.py) to drive the FULL CLI stack (infos -> gt db ->
best-match db -> train -> official eval) without real KITTI data.
"""

from __future__ import annotations

import numpy as np

CALIB_TXT = """P0: 700 0 600 0 0 700 180 0 0 0 1 0
P1: 700 0 600 0 0 700 180 0 0 0 1 0
P2: 700 0 600 44 0 700 180 0.1 0 0 1 0.003
P3: 700 0 600 -330 0 700 180 0.02 0 0 1 0.003
R0_rect: 1 0 0 0 1 0 0 0 1
Tr_velo_to_cam: 0 -1 0 0 0 0 -1 -0.08 1 0 0 -0.27
Tr_imu_to_velo: 1 0 0 0 0 1 0 0 0 0 1 -0.3
"""


def make_raw_kitti(root, n_frames=4, seed=0, n_train=None, cars_per_frame=2,
                   n_background=4000, x_range=(8, 30), y_range=(-5, 5)):
    """Write a raw synthetic KITTI tree under `root`; the last
    `n_frames - n_train` frames form the val split (default: 1)."""
    rng = np.random.RandomState(seed)
    (root / "training" / "velodyne").mkdir(parents=True, exist_ok=True)
    (root / "training" / "calib").mkdir(parents=True, exist_ok=True)
    (root / "training" / "label_2").mkdir(parents=True, exist_ok=True)
    (root / "training" / "planes").mkdir(parents=True, exist_ok=True)
    (root / "ImageSets").mkdir(parents=True, exist_ok=True)
    if n_train is None:
        n_train = n_frames - 1

    frame_ids = [f"{i:06d}" for i in range(n_frames)]
    for fid in frame_ids:
        # forward-cone points so FOV filtering keeps them
        n = n_background
        pts = np.concatenate([
            rng.uniform([3, -8, -2.5], [40, 8, 0.5], size=(n, 3)),
            rng.rand(n, 1),
        ], axis=1).astype(np.float32)
        labels = []
        for _ in range(cars_per_frame):
            cx = rng.uniform(*x_range)
            cy = rng.uniform(*y_range)
            cz = -1.0
            l_, w_, h_ = 3.9, 1.6, 1.56
            yaw = rng.uniform(-np.pi, np.pi)
            local = rng.uniform(-0.5, 0.5, (400, 3)) * [l_, w_, h_]
            c, s = np.cos(yaw), np.sin(yaw)
            world = np.stack([
                local[:, 0] * c - local[:, 1] * s + cx,
                local[:, 0] * s + local[:, 1] * c + cy,
                local[:, 2] + cz,
            ], axis=1)
            pts = np.concatenate(
                [pts, np.concatenate([world, rng.rand(400, 1)], 1).astype(np.float32)]
            )
            # camera-frame label: cam = R*velo + t with rows
            # (0,-1,0),(0,0,-1),(1,0,0) per the calib above
            loc_cam = np.array([-cy, -(cz - h_ / 2) - 0.08, cx - 0.27])
            ry = -yaw - np.pi / 2
            labels.append(
                f"Car 0.0 0 {-np.arctan2(-cy, cx) + ry:.2f} 300 150 400 250 "
                f"{h_} {w_} {l_} {loc_cam[0]:.2f} {loc_cam[1]:.2f} {loc_cam[2]:.2f} {ry:.2f}"
            )
        pts.astype(np.float32).tofile(str(root / "training" / "velodyne" / f"{fid}.bin"))
        (root / "training" / "calib" / f"{fid}.txt").write_text(CALIB_TXT)
        (root / "training" / "label_2" / f"{fid}.txt").write_text("\n".join(labels) + "\n")
        (root / "training" / "planes" / f"{fid}.txt").write_text(
            "# Plane\nWidth 4\nHeight 1\n0 -1 0 1.73\n"
        )
    (root / "ImageSets" / "train.txt").write_text("\n".join(frame_ids[:n_train]) + "\n")
    (root / "ImageSets" / "val.txt").write_text("\n".join(frame_ids[n_train:]) + "\n")
    return frame_ids
