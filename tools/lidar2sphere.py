"""Range-image panorama study tool: project velodyne `.bin` scans to
spherical 2D panoramas / depth maps.

TPU-repo rebuild of the reference study script
(`/root/reference/btcdet/datasets/kitti/spherical_coords/lidar2sphere.py:64`
`velo_points_2_pano`): same v_res/h_res/FOV parameterization and pixel
mapping, without the hard-coded dev paths; reads any velodyne `.bin`
(or synthesizes a cloud with --synthetic) and writes a PNG.

Usage:
  python tools/lidar2sphere.py --bin data/kitti/training/velodyne/000000.bin
  python tools/lidar2sphere.py --synthetic   # no data needed
"""

import argparse
import os

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def normalize_depth(val, min_v, max_v):
    """Inverted depth normalization (closer = brighter), uint8.
    reference `lidar2sphere.py:20`."""
    return (((max_v - val) / (max_v - min_v)) * 255).astype(np.uint8)


def normalize_val(val, min_v, max_v):
    """reference `lidar2sphere.py:28`."""
    return (((val - min_v) / (max_v - min_v)) * 255).astype(np.uint8)


def fov_filter(points, h_fov, v_fov):
    """Keep points inside the horizontal/vertical FOV (degrees).
    reference `fov_setting` `lidar2sphere.py:48`."""
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    xydist = np.sqrt(x**2 + y**2)
    h = np.degrees(np.arctan2(-y, x))
    v = np.degrees(np.arctan2(z, xydist))
    keep = (h >= h_fov[0]) & (h < h_fov[1]) & (v >= v_fov[0]) & (v < v_fov[1])
    return points[keep]


def velo_points_2_pano(points, v_res, h_res, v_fov, h_fov, depth=False):
    """Project (N, >=3) velodyne points to a (y_size, x_size) uint8
    panorama. reference `velo_points_2_pano` `lidar2sphere.py:64`."""
    points = fov_filter(points, h_fov, v_fov)
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    dist = np.sqrt(x**2 + y**2 + z**2)
    xydist = np.sqrt(x**2 + y**2)

    x_img = np.trunc((np.degrees(np.arctan2(-y, x)) - h_fov[0]) / h_res).astype(np.int32)
    y_img = np.trunc((v_fov[1] - np.degrees(np.arctan2(z, xydist))) / v_res).astype(np.int32)

    x_size = int(np.ceil((h_fov[1] - h_fov[0]) / h_res))
    y_size = int(np.ceil((v_fov[1] - v_fov[0]) / v_res))
    x_img = np.clip(x_img, 0, x_size - 1)
    y_img = np.clip(y_img, 0, y_size - 1)

    if depth:
        val = normalize_depth(dist, min_v=0, max_v=120)
    else:
        val = normalize_val(dist, min_v=0, max_v=120)

    img = np.zeros([y_size, x_size], dtype=np.uint8)
    img[y_img, x_img] = val
    return img


def synthetic_cloud(n=60000, seed=0):
    rng = np.random.RandomState(seed)
    r = rng.uniform(3, 70, n)
    az = rng.uniform(-np.pi / 4, np.pi / 4, n)
    el = np.radians(rng.uniform(-24.9, 2.0, n))
    x = r * np.cos(el) * np.cos(az)
    y = r * np.cos(el) * np.sin(az)
    z = r * np.sin(el)
    inten = rng.uniform(0, 1, n)
    return np.stack([x, y, z, inten], axis=1).astype(np.float32)


def main():
    parser = argparse.ArgumentParser(description="arg parser")
    parser.add_argument("--bin", type=str, default=None, help="velodyne .bin path")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--v_res", type=float, default=0.42, help="HDL-64E vertical res (deg)")
    parser.add_argument("--h_res", type=float, default=0.35, help="horizontal res (deg)")
    parser.add_argument("--v_fov", type=float, nargs=2, default=(-24.9, 2.0))
    parser.add_argument("--h_fov", type=float, nargs=2, default=(-180, 180))
    parser.add_argument("--depth", action="store_true", help="inverted depth map shading")
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args()

    if args.bin:
        points = np.fromfile(args.bin, dtype=np.float32).reshape(-1, 4)
        stem = os.path.splitext(os.path.basename(args.bin))[0]
    elif args.synthetic:
        points = synthetic_cloud()
        stem = "synthetic"
    else:
        parser.error("need --bin or --synthetic")

    img = velo_points_2_pano(
        points, args.v_res, args.h_res, tuple(args.v_fov), tuple(args.h_fov),
        depth=args.depth,
    )
    out = args.out or f"pano_{stem}.png"
    fig, ax = plt.subplots(figsize=(14, 3))
    ax.imshow(img, cmap="jet", interpolation="nearest")
    ax.axis("off")
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    print(f"panorama {img.shape} -> {out}")


if __name__ == "__main__":
    main()
