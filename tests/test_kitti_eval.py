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
    result, ret = kitti_eval.get_official_eval_result(gt, dt, ["Car"])
    # with num_gt >> 41 every recall sample point is populated
    assert ret["Car_3d/easy_R40"] > 97.0, result
    assert ret["Car_bev/moderate_R40"] > 97.0
    assert ret["Car_image/hard_R40"] > 97.0


def test_empty_predictions_ap_0():
    rng = np.random.RandomState(1)
    gt, dt = make_annos(rng, n_img=6, perfect=False)
    result, ret = kitti_eval.get_official_eval_result(gt, dt, ["Car"])
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
    result, ret = kitti_eval.get_official_eval_result(gt, dt, ["Car"])
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
    r_native, ret_native = kitti_eval.get_official_eval_result(gt, dt, ["Car"])
    kitti_eval._NATIVE = False  # force fallback
    try:
        r_py, ret_py = kitti_eval.get_official_eval_result(gt, dt, ["Car"])
    finally:
        kitti_eval._NATIVE = None
    for k in ret_native:
        assert abs(ret_native[k] - ret_py[k]) < 1e-9, k
