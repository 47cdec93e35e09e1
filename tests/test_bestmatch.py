"""Offline best-match generation on a synthetic gt database."""

import pickle

import numpy as np

from btcdet_tpu.datasets import bestmatch


def make_fake_db(tmp_path, n_objects=8):
    rng = np.random.RandomState(0)
    db = {"Car": []}
    for i in range(n_objects):
        dims = np.array([4.0, 1.6, 1.5]) + rng.uniform(-0.05, 0.05, 3)
        box = np.array([10.0 + i, 0.0, -1.0, *dims, rng.uniform(-np.pi, np.pi)], np.float32)
        # half-side observed points (local frame, one y side) + intensity
        n = 200
        local = rng.uniform(-0.5, 0.5, (n, 3)) * dims
        local = local[local[:, 1] > 0]
        c, s = np.cos(box[6]), np.sin(box[6])
        pts = np.stack(
            [local[:, 0] * c - local[:, 1] * s, local[:, 0] * s + local[:, 1] * c,
             local[:, 2]], axis=1,
        )
        pts4 = np.concatenate([pts, rng.rand(len(pts), 1)], axis=1).astype(np.float32)
        rel = f"gt_database/0000{i}_Car_0.bin"
        (tmp_path / "gt_database").mkdir(exist_ok=True)
        pts4.tofile(str(tmp_path / rel))
        db["Car"].append({
            "name": "Car", "path": rel, "image_idx": str(i), "gt_idx": 0,
            "box3d_lidar": box, "num_points_in_gt": len(pts4), "difficulty": 0,
        })
    with open(tmp_path / "kitti_dbinfos_train.pkl", "wb") as f:
        pickle.dump(db, f)


def test_bestmatch_generation(tmp_path):
    make_fake_db(tmp_path)
    bestmatch.create_best_match_db(tmp_path, class_names=("Car",), splits=("train",))
    out_dir = tmp_path / "bm_50maxdist_2num_car"
    files = list(out_dir.glob("*.pkl"))
    assert len(files) == 8
    with open(files[0], "rb") as f:
        pts = pickle.load(f)
    assert pts.dtype == np.float32 and pts.shape[1] == 3
    # mirrored + borrowed shapes should cover both y sides
    assert pts[:, 1].max() > 0.1 and pts[:, 1].min() < -0.1


def test_dims_iou_closed_form():
    dims = np.array([[4, 2, 2], [4, 2, 2], [2, 2, 2]])
    iou = bestmatch.dims_iou(dims)
    assert abs(iou[0, 1] - 1.0) < 1e-9
    # [2,2,2] inside [4,2,2]: inter 8, union 16 -> 0.5
    assert abs(iou[0, 2] - 0.5) < 1e-9
