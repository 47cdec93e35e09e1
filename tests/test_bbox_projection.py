"""Pin the lidar->camera->image bbox projection chain and the official
AP protocol's small-sample ceiling (VERDICT r2 next #1/#2).

The synthetic fixture projects its gt bboxes with its own inline P2
matmul (synthetic_kitti._project_cam_box), deliberately NOT sharing code
with the prediction path (kitti_dataset.generate_prediction_dicts ->
box_utils.boxes3d_kitti_camera_to_imageboxes, reference
`btcdet/utils/box_utils.py` boxes3d_lidar_to_kitti_camera /
boxes3d_kitti_camera_to_imageboxes). Agreement between the two is a real
cross-check of the projection math.
"""

import copy

import numpy as np
import pytest

from btcdet_tpu.datasets.kitti import calibration
from btcdet_tpu.datasets.synthetic_kitti import make_raw_kitti
from btcdet_tpu.eval import kitti_eval
from btcdet_tpu.utils import box_utils


def _read_labels(root, fid):
    out = []
    for line in (root / "training" / "label_2" / f"{fid}.txt").read_text().strip().split("\n"):
        f = line.split()
        out.append({
            "bbox": np.array(list(map(float, f[4:8]))),
            "hwl": np.array(list(map(float, f[8:11]))),
            "loc": np.array(list(map(float, f[11:14]))),
            "ry": float(f[14]),
            "alpha": float(f[3]),
        })
    return out


def test_fixture_bbox_matches_prediction_projection(tmp_path):
    """Fixture gt bbox == prediction-path projection of the same 3D box
    (two independent implementations of the KITTI camera projection)."""
    make_raw_kitti(tmp_path, n_frames=3, seed=11, cars_per_frame=3,
                   x_range=(8, 26))
    calib = calibration.Calibration(str(tmp_path / "training" / "calib" / "000000.txt"))
    n_checked = 0
    for fid in ("000000", "000001", "000002"):
        for lab in _read_labels(tmp_path, fid):
            h, w, l = lab["hwl"]
            cam = np.array([[*lab["loc"], l, h, w, lab["ry"]]])
            img = box_utils.boxes3d_kitti_camera_to_imageboxes(
                cam, calib, (375, 1242))
            assert np.abs(img[0] - lab["bbox"]).max() < 1.0, (fid, lab)
            # bbox tall enough that no gt is ignored at 'easy'
            assert lab["bbox"][3] - lab["bbox"][1] > kitti_eval.MIN_HEIGHTS[0]
            n_checked += 1
    assert n_checked == 9


def test_lidar_camera_image_chain_roundtrip(tmp_path):
    """gt camera label -> lidar box (the training representation) ->
    camera -> image bbox reproduces the label's bbox: the exact chain
    generate_prediction_dicts runs on network output."""
    make_raw_kitti(tmp_path, n_frames=1, seed=3, cars_per_frame=2)
    calib = calibration.Calibration(str(tmp_path / "training" / "calib" / "000000.txt"))
    for lab in _read_labels(tmp_path, "000000"):
        h, w, l = lab["hwl"]
        cam = np.array([[*lab["loc"], l, h, w, lab["ry"]]])
        lidar = box_utils.boxes3d_kitti_camera_to_lidar(cam, calib)
        cam2 = box_utils.boxes3d_lidar_to_kitti_camera(lidar, calib)
        np.testing.assert_allclose(cam2, cam, rtol=1e-4, atol=1e-3)
        img = box_utils.boxes3d_kitti_camera_to_imageboxes(cam2, calib, (375, 1242))
        assert np.abs(img[0] - lab["bbox"]).max() < 1.0


def _annos_from_tree(root, fids):
    from btcdet_tpu.datasets.kitti import kitti_infos
    annos = []
    for fid in fids:
        objs = _read_labels(root, fid)
        n = len(objs)
        annos.append({
            "name": np.array(["Car"] * n),
            "truncated": np.zeros(n),
            "occluded": np.zeros(n),
            "alpha": np.array([o["alpha"] for o in objs]),
            "bbox": np.stack([o["bbox"] for o in objs]),
            # info annos store dimensions as (l, h, w)
            "dimensions": np.stack([o["hwl"][[2, 0, 1]] for o in objs]),
            "location": np.stack([o["loc"] for o in objs]),
            "rotation_y": np.array([o["ry"] for o in objs]),
            "score": np.full(n, -1.0),
        })
    return annos


@pytest.mark.parametrize("n_frames,cars,floor", [(3, 2, 0.0), (12, 4, 99.0)])
def test_perfect_detector_ap(tmp_path, n_frames, cars, floor):
    """Feed gt back as perfect detections. The official protocol fills at
    most one PR slot per tp score (reference eval.py get_thresholds), so
    num_gt=6 caps AP_R40 at 15 while num_gt=48 >= 41 reaches 100 — this
    pins BOTH the metric machinery (incl. bbox/AOS via the now-projected
    fixture bboxes) and the small-sample ceiling that round 2's overfit
    proof tripped over."""
    make_raw_kitti(tmp_path, n_frames=n_frames, n_train=n_frames, seed=5,
                   cars_per_frame=cars, x_range=(8, 26))
    fids = [f"{i:06d}" for i in range(n_frames)]
    gt = _annos_from_tree(tmp_path, fids)
    det = []
    for a in gt:
        d = copy.deepcopy(a)
        # distinct descending scores: the protocol assumes ranked dets
        d["score"] = np.linspace(0.9, 0.5, len(d["name"]))
        det.append(d)
    s, rd, _ = kitti_eval.get_official_eval_result(
        copy.deepcopy(gt), det, ["Car"])
    num_gt = sum(len(a["name"]) for a in gt)
    ceiling = min(100.0, (num_gt - 1) / 40.0 * 100.0)
    for fam in ("3d", "bev", "image", "aos"):
        v = rd[f"Car_{fam}/easy_R40"]
        assert v > max(floor, ceiling - 3.0), (fam, v, ceiling)
    if num_gt >= 48:
        for fam in ("3d", "bev", "image", "aos"):
            assert rd[f"Car_{fam}/easy_R40"] > 99.0
