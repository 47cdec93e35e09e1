"""Official KITTI AP metric sanity tests."""

import numpy as np

from btcdet_tpu.eval import kitti_eval


def make_annos(rng, n_img=10, perfect=True):
    gt_annos, dt_annos = [], []
    for _ in range(n_img):
        n = rng.randint(1, 6)
        bbox = np.zeros((n, 4))
        bbox[:, 0] = rng.uniform(0, 1000, n)
        bbox[:, 1] = rng.uniform(0, 200, n)
        bbox[:, 2] = bbox[:, 0] + rng.uniform(60, 120, n)
        bbox[:, 3] = bbox[:, 1] + rng.uniform(60, 120, n)
        loc = np.stack([rng.uniform(-20, 20, n), rng.uniform(0.5, 2, n),
                        rng.uniform(5, 60, n)], axis=1)
        dims = np.stack([rng.uniform(3.5, 4.5, n), rng.uniform(1.4, 1.8, n),
                         rng.uniform(1.5, 1.9, n)], axis=1)
        ry = rng.uniform(-np.pi, np.pi, n)
        gt = {
            "name": np.array(["Car"] * n),
            "truncated": np.zeros(n),
            "occluded": np.zeros(n),
            "alpha": ry.copy(),
            "bbox": bbox,
            "location": loc,
            "dimensions": dims,
            "rotation_y": ry,
        }
        if perfect:
            dt = {k: (v.copy() if isinstance(v, np.ndarray) else v) for k, v in gt.items()}
            dt["score"] = rng.uniform(0.5, 1.0, n)
        else:
            dt = {
                "name": np.array([]), "truncated": np.zeros(0),
                "occluded": np.zeros(0), "alpha": np.zeros(0),
                "bbox": np.zeros((0, 4)), "location": np.zeros((0, 3)),
                "dimensions": np.zeros((0, 3)), "rotation_y": np.zeros(0),
                "score": np.zeros(0),
            }
        gt_annos.append(gt)
        dt_annos.append(dt)
    return gt_annos, dt_annos


def test_perfect_predictions_ap_100():
    rng = np.random.RandomState(0)
    gt, dt = make_annos(rng, n_img=60, perfect=True)
    result, ret, _ = kitti_eval.get_official_eval_result(gt, dt, ["Car"])
    # with num_gt >> 41 every recall sample point is populated
    assert ret["Car_3d/easy_R40"] > 97.0, result
    assert ret["Car_bev/moderate_R40"] > 97.0
    assert ret["Car_image/hard_R40"] > 97.0


def test_empty_predictions_ap_0():
    rng = np.random.RandomState(1)
    gt, dt = make_annos(rng, n_img=6, perfect=False)
    result, ret, _ = kitti_eval.get_official_eval_result(gt, dt, ["Car"])
    assert ret["Car_3d/moderate_R40"] == 0.0


def test_shifted_predictions_partial():
    rng = np.random.RandomState(2)
    gt, dt = make_annos(rng, n_img=12, perfect=True)
    # shift half the detections far away -> ~half AP at strict overlap
    for d in dt:
        n = len(d["name"])
        k = n // 2
        d["location"][:k, 0] += 10.0
        d["bbox"][:k, 0] += 500
        d["bbox"][:k, 2] += 500
    result, ret, _ = kitti_eval.get_official_eval_result(gt, dt, ["Car"])
    ap = ret["Car_3d/moderate_R40"]
    assert 10.0 < ap < 90.0, (ap, result)


def test_native_matches_python_fallback():
    rng = np.random.RandomState(3)
    gt, dt = make_annos(rng, n_img=4, perfect=True)
    for d in dt:
        d["location"][:, 0] += rng.uniform(-0.5, 0.5, len(d["name"]))
    lib = kitti_eval._load_native()
    if not lib:
        import pytest
        pytest.skip("no native toolchain")
    r_native, ret_native, _ = kitti_eval.get_official_eval_result(gt, dt, ["Car"])
    kitti_eval._NATIVE = False  # force fallback
    try:
        r_py, ret_py, _ = kitti_eval.get_official_eval_result(gt, dt, ["Car"])
    finally:
        kitti_eval._NATIVE = None
    for k in ret_native:
        assert abs(ret_native[k] - ret_py[k]) < 1e-9, k


def test_pr_rc_details_export(tmp_path):
    """The third return element holds bev/3d precision + real-recall
    curves (reference eval.py:639 create_details) and the PR-curve tool
    can plot them."""
    rng = np.random.RandomState(2)
    gt, dt = make_annos(rng, n_img=60, perfect=True)
    _, _, details = kitti_eval.get_official_eval_result(gt, dt, ["Car"])
    assert set(details.keys()) == {"bev", "3d"}
    car = details["3d"]["Car"]
    assert set(car.keys()) == {"easy", "moderate", "hard"}
    c = car["moderate"]
    assert c["R11_pc"].shape == (11,) and c["R40_pc"].shape == (40,)
    assert c["R11_rc"].shape == (11,) and c["R40_rc"].shape == (40,)
    # real_recall is a running max of raw recall -> non-decreasing
    assert np.all(np.diff(c["R40_rc"]) >= -1e-9)
    # perfect predictions: precision stays ~1 wherever recall is sampled
    assert c["R40_pc"].max() > 0.97

    # the plotting tool consumes pc_rc.pkl end to end
    import pickle
    import subprocess
    import sys

    run_dir = tmp_path / "run"
    run_dir.mkdir()
    with open(run_dir / "pc_rc.pkl", "wb") as f:
        pickle.dump(details, f)
    r = subprocess.run(
        [sys.executable, "tools/visual_utils/visualize_pcrc_curve.py",
         "--dir1", str(run_dir)],
        capture_output=True, text=True, cwd=".",
    )
    assert r.returncode == 0, r.stderr
    assert (run_dir / "pr_3d_Car_R40.png").exists()


def test_visualize_pc_tool(tmp_path):
    """visualize_pc renders a dumped point-set dict to PNG."""
    import subprocess
    import sys

    dump_dir = tmp_path / "cloud"
    dump_dir.mkdir()
    rng = np.random.RandomState(3)
    d = {
        "gt_points": rng.uniform(-10, 10, (500, 3)).astype(np.float32),
        "addpnt_view": rng.uniform(-5, 5, (40, 3)).astype(np.float32),
        "gt_boxes": np.array([[0, 0, 0, 4, 1.6, 1.5, 0.3]], np.float32),
        "pred_boxes": np.array([[1, 1, 0, 4, 1.6, 1.5, -0.2]], np.float32),
        "pred_scores": np.array([0.9], np.float32),
    }
    np.save(dump_dir / "pc_eval_0_0.npy", d)
    r = subprocess.run(
        [sys.executable, "tools/visual_utils/visualize_pc.py",
         "--dir1", str(dump_dir)],
        capture_output=True, text=True, cwd=".",
    )
    assert r.returncode == 0, r.stderr
    assert (dump_dir / "pc_eval_0_0.png").exists()


def test_coverage_bucket_difficulty_axis():
    """Coverage-rate buckets replace easy/mod/hard (reference
    `eval.py:55-57,597,685`): a gt whose coverage is inside the bucket is
    moved to the ignored class; keys are named cvrg_lo_hi."""
    rng = np.random.RandomState(3)
    gt, dt = make_annos(rng, n_img=40, perfect=True)
    for g in gt:
        n = len(g["name"])
        g["coverage_rates"] = rng.uniform(0.0, 1.0, (n, 1))
    buckets = [[0.0, 0.3], [0.3, 0.7], [0.7, 1.01]]
    result, ret, details = kitti_eval.get_official_eval_result(
        gt, dt, ["Car"], coverage_rates=buckets)
    for lo, hi in buckets:
        key = f"Car_3d/cvrg_{lo}_{hi}_R40"
        assert key in ret, sorted(ret)
        assert np.isfinite(ret[key])
    # perfect detections still score high in every bucket (non-ignored
    # gt are matched perfectly; ignored ones don't count against)
    assert ret["Car_3d/cvrg_0.0_0.3_R40"] > 90.0, result


def test_compute_coverage_rates(tmp_path):
    """compute_coverage_rates: fully-covered object -> rate ~1; object
    with far fewer observed points -> rate < 1 (reference
    `kitti_dataset.py:204-266`)."""
    import pickle

    from btcdet_tpu.datasets.kitti import kitti_infos

    rng = np.random.RandomState(0)
    gt_box = np.array([10.0, 2.0, -0.5, 4.0, 1.6, 1.5, 0.3])
    # canonical best-match shape: a dense box-surface-ish cloud
    bm = rng.uniform(-1, 1, (600, 3)) * np.array([2.0, 0.8, 0.7])
    bm_dir = tmp_path / "bm_car"
    bm_dir.mkdir()
    with open(bm_dir / "7_0.pkl", "wb") as f:
        pickle.dump(bm.astype(np.float32), f)
    with open(bm_dir / "7_1.pkl", "wb") as f:
        pickle.dump(bm.astype(np.float32), f)
    db = tmp_path / "gt_database"
    db.mkdir()
    # object 0: observed points = the full bm shape rotated into the box
    # frame convention (db bins are stored center-relative, world-rotated)
    from btcdet_tpu.utils import common
    world = common.rotate_points_along_z_np(bm[None], np.asarray([gt_box[6]]))[0]
    full = np.concatenate([world, np.zeros((len(world), 1))], axis=1).astype(np.float32)
    full.tofile(str(db / "000007_Car_0.bin"))
    # object 1: only 5 observed points
    full[:5].tofile(str(db / "000007_Car_1.bin"))
    info = {
        "point_cloud": {"lidar_idx": "000007"},
        "annos": {
            "name": np.array(["Car", "Car", "DontCare"]),
            "gt_boxes_lidar": np.stack([gt_box, gt_box, gt_box]),
        },
    }
    out = kitti_infos.compute_coverage_rates(
        [info], {"Car": bm_dir}, db, workers=1)
    rates = np.asarray(out[0]["annos"]["coverage_rates"]).reshape(-1)
    assert rates.shape[0] == 3
    assert rates[0] > 0.95, rates
    assert 0.0 < rates[1] < 0.2, rates
    assert rates[2] == 0.0


def test_occ_box_coverage():
    """Per-occ-threshold gt-box coverage (reference occ_post_processing
    detector3d_template.py:515-535)."""
    import numpy as np
    from btcdet_tpu.train.eval_utils import occ_box_coverage

    boxes = np.array([
        [0, 0, 0, 4, 2, 2, 0, 1],
        [10, 0, 0, 4, 2, 2, 0, 1],
        [0, 0, 0, 0, 0, 0, 0, 0],   # pad row ignored
    ], np.float32)
    pts = np.array([
        [0.5, 0.2, 0.1, 0.95],   # box 0, high prob
        [10.1, 0.0, 0.0, 0.35],  # box 1, low prob
        [50, 50, 50, 0.99],      # outside both
    ], np.float32)
    mask = np.array([True, True, True])
    cov = occ_box_coverage(pts, mask, boxes)
    assert cov["box_num_sum"] == 2
    # thresholds 0.1..0.9: both boxes covered up to 0.3; only box 0 after
    assert cov["occ_box_num"] == [2, 2, 2, 1, 1, 1, 1, 1, 1]
    # masked-out / empty cases stay well-formed
    cov0 = occ_box_coverage(pts, np.zeros(3, bool), boxes)
    assert cov0["occ_box_num"] == [0] * 9
    cov_nb = occ_box_coverage(pts, mask, np.zeros((2, 8), np.float32))
    assert cov_nb["box_num_sum"] == 0
