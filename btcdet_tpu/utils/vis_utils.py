"""Visualization utilities (reference `btcdet/utils/vis_occ_utils.py` and
`tools/visual_utils/`).

Dependency-light: BEV raster images are plain numpy arrays (H, W, 3)
uint8 suitable for tensorboard / PNG; the mayavi 3D viewers of the
reference are replaced by `.npy` point-cloud dumps plus an export to
PLY for any external viewer.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from . import box_utils


def bev_raster(
    points=None, boxes=None, occ_points=None,
    point_cloud_range=(0, -40, -3, 70.4, 40, 1), resolution: float = 0.1,
):
    """Rasterize points (white), occ points (orange) and boxes (green) on
    a BEV canvas (reference `draw_lidars_box3d_on_birdview`)."""
    pr = np.asarray(point_cloud_range)
    W = int((pr[3] - pr[0]) / resolution)
    H = int((pr[4] - pr[1]) / resolution)
    img = np.zeros((H, W, 3), np.uint8)

    def to_px(xy):
        u = ((xy[:, 0] - pr[0]) / resolution).astype(int)
        v = ((xy[:, 1] - pr[1]) / resolution).astype(int)
        ok = (u >= 0) & (u < W) & (v >= 0) & (v < H)
        return u[ok], v[ok]

    if points is not None and len(points):
        u, v = to_px(np.asarray(points)[:, :2])
        img[v, u] = (220, 220, 220)
    if occ_points is not None and len(occ_points):
        u, v = to_px(np.asarray(occ_points)[:, :2])
        img[v, u] = (255, 140, 0)
    if boxes is not None and len(boxes):
        corners = np.asarray(box_utils.boxes_to_corners_bev(np.asarray(boxes)))
        for quad in corners:  # (4, 2)
            for i in range(4):
                a, b = quad[i], quad[(i + 1) % 4]
                n = int(np.linalg.norm(b - a) / resolution) + 1
                seg = a[None] + (b - a)[None] * np.linspace(0, 1, n)[:, None]
                u, v = to_px(seg)
                img[v, u] = (0, 255, 0)
    return img[::-1]  # +x up


def save_point_cloud(points, path, colors=None):
    """Dump points as .npy (the reference's cloud/ dumps) or .ply."""
    path = Path(path)
    points = np.asarray(points)
    if path.suffix == ".npy":
        np.save(str(path), points)
        return
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(points)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for i, p in enumerate(points):
            line = f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f}"
            if colors is not None:
                c = colors[i]
                line += f" {int(c[0])} {int(c[1])} {int(c[2])}"
            f.write(line + "\n")
