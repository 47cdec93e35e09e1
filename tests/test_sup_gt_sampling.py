"""SupGTSampling full parity (reference `sup_gt_sampling.py`): GT_SMP
real-point pastes + MLT_BM bm-only pastes with cylinder-space jitter,
iterative collision pruning, no-stucking, remove_occ first-surface
filtering, and the pre_aug_bm handshake with the bm querier.

Runs on the synthetic on-disk KITTI tree from test_kitti_pipeline.
"""

import numpy as np
import pytest

from btcdet_tpu.config import EasyDict
from btcdet_tpu.datasets.augmentor import (
    DataAugmentor, MltBestMatchQuerier, SupGTSampling,
)
from test_kitti_pipeline import kitti_root, make_raw_kitti  # noqa: F401


def sup_cfg(gt_n=2, bm_n=2, no_stucking=False, rmv=0):
    return EasyDict({
        "NAME": "sup_gt_sampling",
        "DB_INFO_PATH": ["kitti_dbinfos_train.pkl"],
        "PREPARE": {"filter_by_min_points": ["Car:5"],
                    "filter_by_difficulty": [-1]},
        "SAMPLE_GROUPS": [f"Car:{gt_n + bm_n}"],
        "NUM_POINT_FEATURES": 4,
        "BM_NUM_POINT_FEATURES": 3,
        "MLT_BM_ROOT": "bm_50maxdist_2num_car",
        "REMOVE_EXTRA_WIDTH": [0.0, 0.0, 0.0],
        "LIMIT_WHOLE_SCENE": False,
        "NO_STUCKING": no_stucking,
        "GT_SMP": {"SAMPLE_GROUPS": [f"Car:{gt_n}"],
                   "BOX_RANGE_JITTER": 2.0, "BOX_ROT_JITTER": 3.0,
                   "BOX_YAW_JITTER": 0.3, "YAW_TYPE": None,
                   "RMV_YZ_EXPSN": rmv, "DROP_RATE": 0.0},
        "MLT_BM": {"SAMPLE_GROUPS": [f"Car:{bm_n}"],
                   "BOX_RANGE_JITTER": 2.0, "BOX_ROT_JITTER": 3.0,
                   "BOX_YAW_JITTER": 0.3, "YAW_TYPE": None,
                   "RMV_YZ_EXPSN": rmv, "DROP_RATE": 0.0},
    })


def scene_dict(rng):
    pts = np.concatenate([
        rng.uniform([3, -8, -2.5], [40, 8, 0.5], size=(3000, 3)),
        rng.rand(3000, 1),
    ], axis=1).astype(np.float32)
    return {
        "frame_id": "000000",
        "points": pts,
        "gt_boxes": np.zeros((0, 7), np.float32),
        "gt_names": np.array([], dtype="<U10"),
        "gt_boxes_mask": np.zeros((0,), bool),
        "gt_boxes_inds": np.arange(0),
    }


def test_sup_sampler_pastes_both_groups(kitti_root):
    sampler = SupGTSampling(kitti_root, sup_cfg(), ["Car"])
    rng = np.random.RandomState(0)
    d = sampler(scene_dict(rng), rng=rng)
    assert d.get("pre_aug_bm", False)
    n = len(d["gt_boxes"])
    assert n >= 1
    assert isinstance(d["bm_points"], list) and len(d["bm_points"]) == n
    assert len(d["aug_boxes_image_idx"]) == n
    # sampled boxes do not mutually overlap in BEV
    from btcdet_tpu.ops import iou3d
    if n > 1:
        iou = iou3d.boxes_bev_iou_cpu(d["gt_boxes"][:, :7], d["gt_boxes"][:, :7])
        iou[range(n), range(n)] = 0
        assert iou.max() == 0


def test_querier_respects_pre_aug_bm(kitti_root):
    """After SupGTSampling the querier must not reload shapes for pasted
    boxes (reference `__call__:278-285` pre_aug_bm)."""
    sampler = SupGTSampling(kitti_root, sup_cfg(), ["Car"])
    querier = MltBestMatchQuerier(
        kitti_root,
        EasyDict({"NAME": "add_multi_best_match",
                  "CAR_MLT_BM_ROOT": "bm_50maxdist_2num_car",
                  "NUM_POINT_FEATURES": 3}),
        ["Car"],
    )
    rng = np.random.RandomState(1)
    d = sampler(scene_dict(rng), rng=rng)
    n_boxes = len(d["gt_boxes"])
    pre = [b.copy() for b in d["bm_points"]]
    d = querier(d, rng=rng)
    # no real boxes in this scene: final bm set == the sampler's, concat'd
    assert d["bm_points"].shape[0] == sum(len(b) for b in pre)
    assert n_boxes == len(pre)


def test_remove_occ_first_surface_and_min_points():
    sampler = SupGTSampling.__new__(SupGTSampling)
    rng = np.random.RandomState(0)
    # scene: nothing. pasted points: two surfaces on the same rays; the
    # nearer one (x=8 plane) must survive, the farther (x=12) be removed
    yy, zz = np.meshgrid(np.linspace(-1, 1, 12), np.linspace(-0.6, 0.6, 8))
    near = np.stack([np.full(yy.size, 8.0), yy.ravel(), zz.ravel()], 1)
    far = near * 1.5  # same rays (radial scaling), 50% farther
    bm = np.concatenate([near, far]).astype(np.float32)
    bm = np.concatenate([bm, np.ones((len(bm), 1), np.float32)], 1)
    box = np.array([[10.0, 0.0, 0.0, 8.0, 3.0, 2.0, 0.0]], np.float32)
    points = np.array([[30.0, 5.0, -1.0, 1.0]], np.float32)
    out, ok = sampler.remove_occ(points, bm, box, yz_expansion=2,
                                 drop_rate=0.0, rng=rng)
    assert ok.all()
    assert (out[:, 0] < 9.0).all(), "far surface must be removed"
    assert len(out) > 5
    # min-points rule: a box ending up with < 5 points loses them all
    few = bm[:3]
    out2, ok2 = sampler.remove_occ(points, few, box, yz_expansion=2,
                                   drop_rate=0.0, rng=rng)
    assert not ok2.any() and len(out2) == 0


def test_dataaugmentor_builds_sup_sampler(kitti_root):
    aug = DataAugmentor(
        kitti_root,
        EasyDict({"AUG_CONFIG_LIST": [sup_cfg()]}),
        class_names=["Car"],
    )
    rng = np.random.RandomState(2)
    d = aug.forward(scene_dict(rng), rng=rng)
    assert "bm_points" in d
