"""End-to-end CPU pipeline test on a synthetic on-disk KITTI dataset:
raw files -> infos -> gt database -> best-match shapes -> dataset
__getitem__ (augmentation, occ voxelization) -> collate."""

import numpy as np
import pytest

from btcdet_tpu.config import EasyDict
from btcdet_tpu.datasets import bestmatch
from btcdet_tpu.datasets.kitti import kitti_infos
from btcdet_tpu.datasets.kitti.kitti_dataset import KittiDataset
from btcdet_tpu.datasets.synthetic_kitti import make_raw_kitti


def data_cfg(root):
    return EasyDict({
        "DATASET": "KittiDataset",
        "DATA_PATH": str(root),
        "POINT_CLOUD_RANGE": [0, -16.0, -3.0, 48.0, 16.0, 1.1],
        "DATA_SPLIT": {"train": "train", "test": "val"},
        "INFO_PATH": {"train": ["kitti_infos_train.pkl"], "test": ["kitti_infos_val.pkl"]},
        "FOV_POINTS_ONLY": False,
        "MAX_POINTS_PER_FRAME": 8192,
        "MAX_GT_BOXES": 20,
        "MAX_BM_POINTS": 4096,
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity"],
            "src_feature_list": ["x", "y", "z", "intensity"],
        },
        "OCC": {
            "VOXEL_SIZE": [0.5, 2.0, 0.45],
            "DIST_KERN": [5, 9, 5], "HALF_X": True, "EMPT_SUR_THRESH": 1,
            "POINT_CLOUD_RANGE": [2.0, -40.0, -2.6, 48.0, 40.0, 1.0],
            "SUPPORT_SPHERE_RANGE": [2.0, -40.0, -16.6, 48.5, 40.0, 4.0, 2.0],
            "BOX_WEIGHT": 0.2, "RES_NUM_DIM": 3, "CODE_NUM_DIM": 2,
            "INTEN": 0.0, "DROPOUT_RATE": 0.0, "COORD_TYPE": "cylinder",
            "USE_ABSXYZ": True, "MAX_VFE": True, "USEOCC_PERCENTAGE": 1.1,
        },
        "DATA_AUGMENTOR": {
            "DISABLE_AUG_LIST": ["placeholder"],
            "AUG_CONFIG_LIST": [
                {"NAME": "gt_sampling", "USE_ROAD_PLANE": True,
                 "DB_INFO_PATH": ["kitti_dbinfos_train.pkl"],
                 "PREPARE": {"filter_by_min_points": ["Car:5"],
                             "filter_by_difficulty": [-1]},
                 "SAMPLE_GROUPS": ["Car:4"], "NUM_POINT_FEATURES": 4,
                 "DATABASE_WITH_FAKELIDAR": False,
                 "REMOVE_EXTRA_WIDTH": [0.0, 0.0, 0.0],
                 "LIMIT_WHOLE_SCENE": False},
                {"NAME": "add_multi_best_match",
                 "CAR_MLT_BM_ROOT": "bm_50maxdist_2num_car",
                 "CYC_MLT_BM_ROOT": "bm_5maxdist_2num_Cyclist",
                 "PED_MLT_BM_ROOT": "bm_5maxdist_2num_Pedestrian",
                 "NUM_POINT_FEATURES": 3},
                {"NAME": "random_world_flip", "ALONG_AXIS_LIST": ["x"]},
                {"NAME": "random_world_scaling", "WORLD_SCALE_RANGE": [0.95, 1.05]},
                {"NAME": "random_world_rotation",
                 "WORLD_ROT_ANGLE": [-0.78539816, 0.78539816], "SAVE_PRE_ROT": True},
            ],
        },
        "DATA_PROCESSOR": [
            {"NAME": "mask_points_and_boxes_outside_range", "REMOVE_OUTSIDE_BOXES": True},
            {"NAME": "shuffle_points", "SHUFFLE_ENABLED": {"train": True, "test": False}},
            {"NAME": "transform_points_to_sphere_voxels",
             "VOXEL_SIZE": [0.5, 2.0, 0.45], "MAX_POINTS_PER_VOXEL": 8,
             "MAX_NUMBER_OF_VOXELS": {"train": 3000, "test": 3000}},
            {"NAME": "det_transform_points_to_voxels",
             "VOXEL_SIZE": [0.1, 0.1, 0.1], "MAX_POINTS_PER_VOXEL": 5,
             "MAX_NUMBER_OF_VOXELS": {"train": 6000, "test": 6000}},
        ],
    })


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    make_raw_kitti(root)
    kitti_infos.create_kitti_infos(root, workers=2)
    bestmatch.create_best_match_db(root, class_names=("Car",), splits=("train",))
    return root


def test_infos_and_db(kitti_root):
    import pickle

    with open(kitti_root / "kitti_infos_train.pkl", "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 3
    anno = infos[0]["annos"]
    assert "gt_boxes_lidar" in anno and anno["gt_boxes_lidar"].shape[1] == 7
    # lidar boxes should land near the planted locations (x in 8..30)
    assert (anno["gt_boxes_lidar"][:, 0] > 5).all()
    assert (anno["num_points_in_gt"][:2] > 50).all()

    with open(kitti_root / "kitti_dbinfos_train.pkl", "rb") as f:
        db = pickle.load(f)
    assert len(db["Car"]) == 6
    bm_files = list((kitti_root / "bm_50maxdist_2num_car").glob("*.pkl"))
    assert len(bm_files) == 6


def test_getitem_train_and_collate(kitti_root):
    cfg = data_cfg(kitti_root)
    ds = KittiDataset(cfg, ["Car"], training=True, root_path=kitti_root)
    assert len(ds) == 3
    item = ds[0]
    for key in ("points", "occ_voxels", "occ_voxel_coords", "det_voxels",
                "det_voxel_coords", "gt_boxes", "bm_points", "rot_z"):
        assert key in item, key
    assert item["gt_boxes"].shape[1] == 8
    assert len(item["bm_points"]) > 0
    # occ voxel azimuth channel was un-rotated: stored uvd is world frame
    batch = ds.collate_batch([ds[0], ds[1]])
    assert batch["points"].shape == (2, 8192, 4)
    assert batch["gt_boxes"].shape == (2, 20, 8)
    assert batch["occ_voxels"].shape[0] == 2 * 3000
    assert batch["bm_points"].shape == (2, 4096, 3)
    assert batch["use_occ_prob"].all()


def test_getitem_eval(kitti_root):
    cfg = data_cfg(kitti_root)
    ds = KittiDataset(cfg, ["Car"], training=False, root_path=kitti_root)
    assert len(ds) == 1
    item = ds[0]
    batch = ds.collate_batch([item])
    assert batch["rot_z"][0] == 0.0

    # prediction decode path: fake perfect detections from gt
    import pickle

    with open(kitti_root / "kitti_infos_val.pkl", "rb") as f:
        info = pickle.load(f)[0]
    gt = info["annos"]["gt_boxes_lidar"]
    pred = [{
        "pred_boxes": gt,
        "pred_scores": np.full(len(gt), 0.9),
        "pred_labels": np.ones(len(gt), np.int64),
        "pred_valid": np.ones(len(gt), bool),
    }]
    annos = ds.generate_prediction_dicts(
        {"frame_id": [info["point_cloud"]["lidar_idx"]]}, pred, ["Car"]
    )
    assert len(annos[0]["name"]) == len(gt)
    result_str, result_dict, _pr_rc = ds.evaluation(annos, ["Car"])
    assert "Car_3d/moderate_R40" in result_dict


def test_build_dataloader_factory(kitti_root):
    """build_dataloader (reference btcdet/datasets/__init__.py:39) returns
    a working dataset/loader/sampler triple; ShardSampler shards evenly."""
    from btcdet_tpu.datasets import ShardSampler, build_dataloader

    cfg = data_cfg(kitti_root)
    ds, dl, sampler = build_dataloader(
        cfg, ["Car"], batch_size=2, dist=False, workers=0, training=True,
    )
    batch = next(iter(dl))
    assert batch["det_voxels"].shape[0] == 2 * cfg["DATA_PROCESSOR"][3]["MAX_NUMBER_OF_VOXELS"]["train"]
    assert sampler is None

    s0 = ShardSampler(10, num_shards=4, shard_id=0, shuffle=True, seed=1)
    s3 = ShardSampler(10, num_shards=4, shard_id=3, shuffle=True, seed=1)
    s0.set_epoch(2); s3.set_epoch(2)
    i0, i3 = list(s0), list(s3)
    assert len(i0) == len(i3) == 3  # padded to equal step count
    assert all(0 <= i < 10 for i in i0 + i3)


def test_gen_pnt_label(kitti_root):
    """gen_pnt_label marks voxel points inside (slack-scaled) gt boxes
    with the box class id (reference data_processor.py:193)."""
    from btcdet_tpu.datasets.processor import DataProcessor

    boxes = np.array([[5.0, 0.0, -1.0, 4.0, 2.0, 1.6, 0.3, 2.0]], np.float32)
    pts_in = np.array([[5.0, 0.0, -1.0, 0.5], [5.5, 0.2, -0.8, 0.2]], np.float32)
    pts_out = np.array([[20.0, 5.0, -1.0, 0.1]], np.float32)
    pts = np.concatenate([pts_in, pts_out])
    proc = DataProcessor(
        [EasyDict({"NAME": "transform_points_to_voxels", "VOXEL_SIZE": [0.2, 0.2, 0.4],
                   "MAX_POINTS_PER_VOXEL": 4, "MAX_NUMBER_OF_VOXELS": {"train": 64, "test": 64}}),
         EasyDict({"NAME": "gen_pnt_label"})],
        point_cloud_range=[0, -16, -3, 48, 16, 1], training=True,
    )
    d = proc.forward({"points": pts, "gt_boxes": boxes})
    lab = d["voxel_points_label"]
    vox = d["voxels"]
    # every nonzero label equals the class id 2 and tags an in-box point
    assert lab.max() == 2.0
    tagged = vox[lab > 0]
    assert len(tagged) == 2
    assert np.all(np.abs(tagged[:, 0] - 5.0) < 1.0)
