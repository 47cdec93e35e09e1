"""Render point-cloud `.npy` dumps (the `pc_{epoch}_{iter}.npy` dicts
written by the train/eval loops) to PNG scenes.

TPU rebuild of the reference mayavi viewer
(`/root/reference/tools/visual_utils/visualize_pc.py:171-346`): the
reference opens an interactive mayavi window per frame; here each dump
is rendered headlessly (BEV and optional 3D projection) with the same
named-point-set color scheme, and `--dir2` overlays a second run's point
sets for comparison (the reference's two-dir diff mode).

A dump file is a pickled dict of named (N, >=3) float arrays, e.g.
gt_points / addpnt_view / filter_center / drop_voxel_center, plus
optional `gt_boxes` (G, 7+) and `pred_boxes` (P, 7+) / `pred_scores`.

Usage:
  python tools/visual_utils/visualize_pc.py --dir1 out/cloud \
      [--dir2 other/cloud] [--three_d] [--max_frames 20] [--out pngs]
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import visualize_utils as vu  # noqa: E402

# RGB per named point set (reference visualize_pc.py:9-25)
clrs = {
    "gt_points": (1.0, 1.0, 1.0),
    "fore_gt_center": (1.0, 0.5, 0.5),
    "filter_center": (0.8, 0.8, 0.0),
    "boxvoxel_center": (1.0, 0.5, 0.0),
    "addpnt_view": (0.2, 1.0, 0.2),
    "drop_voxel_center": (0.3, 0.0, 0.8),
    "occ_points": (0.2, 1.0, 0.2),
    "points": (1.0, 1.0, 1.0),
}
scales = {
    "gt_points": 0.01, "points": 0.01,
    "fore_gt_center": 0.1, "filter_center": 0.1, "boxvoxel_center": 0.1,
    "addpnt_view": 0.1, "drop_voxel_center": 0.1, "occ_points": 0.1,
}


def parse_config():
    parser = argparse.ArgumentParser(description="arg parser")
    parser.add_argument("--dir1", type=str, required=True, help="cloud dump dir")
    parser.add_argument("--dir2", type=str, default=None, help="second dump dir to overlay")
    parser.add_argument("--out", type=str, default=None, help="PNG output dir (default dir1)")
    parser.add_argument("--three_d", action="store_true", help="3D projection instead of BEV")
    parser.add_argument("--max_frames", type=int, default=20)
    return parser.parse_args()


def load_dump(path):
    d = np.load(path, allow_pickle=True)
    if isinstance(d, np.ndarray) and d.dtype == object:
        d = d.item()
    if not isinstance(d, dict):  # bare point array
        d = {"points": np.asarray(d)}
    return d


def render(dump, out_path, bev=True, overlay=None):
    names, pts_lst, col_lst, sc_lst = [], [], [], []
    boxes = {"gt_boxes": None, "pred_boxes": None}
    scores = None
    for k, v in dump.items():
        v = np.asarray(v)
        if k in boxes:
            boxes[k] = v.reshape(-1, v.shape[-1])
        elif k == "pred_scores":
            scores = v.reshape(-1)
        elif v.ndim >= 2 and v.shape[-1] >= 3:
            names.append(k)
            pts_lst.append(v.reshape(-1, v.shape[-1])[:, :3])
            col_lst.append(clrs.get(k, (0.7, 0.7, 0.7)))
            sc_lst.append(scales.get(k, 0.05))
    if overlay:
        for k, v in overlay.items():
            v = np.asarray(v)
            if k not in boxes and k != "pred_scores" and v.ndim >= 2 and v.shape[-1] >= 3:
                names.append(f"run2:{k}")
                pts_lst.append(v.reshape(-1, v.shape[-1])[:, :3])
                col_lst.append((1.0, 0.3, 0.3))
                sc_lst.append(scales.get(k, 0.05))
    fig = vu.draw_scenes_multi(
        pts_lst, col_lst, scales_lst=sc_lst,
        gt_boxes=boxes["gt_boxes"], ref_boxes=boxes["pred_boxes"],
        ref_scores=scores, bev=bev,
    )
    vu.save_fig(fig, out_path)
    print("wrote", out_path, "sets:", ", ".join(names))


def main():
    args = parse_config()
    out_dir = args.out or args.dir1
    os.makedirs(out_dir, exist_ok=True)
    files = sorted(glob.glob(os.path.join(args.dir1, "*.npy")))[: args.max_frames]
    if not files:
        print(f"no .npy dumps in {args.dir1}")
        return
    for f in files:
        stem = os.path.splitext(os.path.basename(f))[0]
        overlay = None
        if args.dir2:
            f2 = os.path.join(args.dir2, os.path.basename(f))
            if os.path.exists(f2):
                overlay = load_dump(f2)
        render(load_dump(f), os.path.join(out_dir, stem + ".png"),
               bev=not args.three_d, overlay=overlay)


if __name__ == "__main__":
    main()
