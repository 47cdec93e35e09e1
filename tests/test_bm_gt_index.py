"""Regression: the best-match querier must key real gt boxes by their
ORIGINAL label-file index (post-DontCare, pre-class-filter), not the
enumerate position after class filtering (VERDICT r1 missing #3;
reference `data_augmentor.py:182`, `database_sampler.py:114`,
`multi_best_match_querier.py:55-63`).

On real KITTI, Vans/Trucks can precede Cars in a label file: a Car at
label index 2 sitting at list position 0 after filtering must still load
`{image}_2.pkl`.
"""

import pickle

import numpy as np
import pytest

from btcdet_tpu.config import EasyDict
from btcdet_tpu.datasets.augmentor import DataAugmentor, MltBestMatchQuerier


def _write_bm(root, subdir, image_idx, gt_idx, marker):
    d = root / subdir
    d.mkdir(exist_ok=True)
    # canonical-frame points whose x encodes the gt index (the marker)
    pts = np.full((4, 3), float(marker), np.float32)
    with open(d / f"{image_idx}_{gt_idx}.pkl", "wb") as f:
        pickle.dump(pts, f)


@pytest.fixture()
def bm_root(tmp_path):
    # label file order: Van(0), Car(1), Car(2) -- only indices 1, 2 have
    # bm shapes (multifindbestfit only emits files for target classes)
    _write_bm(tmp_path, "bm_car", 7, 1, marker=100.0)
    _write_bm(tmp_path, "bm_car", 7, 2, marker=200.0)
    # pasted-box source object: frame 9, gt index 5
    _write_bm(tmp_path, "bm_car", 9, 5, marker=900.0)
    return tmp_path


def _base_dict():
    gt_boxes = np.array([
        [5.0, 0.0, -1.0, 5.0, 2.0, 2.2, 0.0],   # Van
        [10.0, 2.0, -1.0, 3.9, 1.6, 1.56, 0.0],  # Car (label idx 1)
        [20.0, -3.0, -1.0, 3.9, 1.6, 1.56, 0.0],  # Car (label idx 2)
    ], np.float32)
    return {
        "frame_id": "000007",
        "gt_boxes": gt_boxes,
        "gt_names": np.array(["Van", "Car", "Car"]),
        "gt_boxes_mask": np.array([False, True, True]),
        "points": np.zeros((10, 4), np.float32),
    }


def _querier_cfg():
    return EasyDict({"NAME": "add_multi_best_match",
                     "CAR_MLT_BM_ROOT": "bm_car",
                     "NUM_POINT_FEATURES": 3})


def _markers(data_dict, boxes):
    """Recover each loaded bm shape's marker (x - box_x per 4-point blob)."""
    bm = data_dict["bm_points"].reshape(-1, 4, 3)
    out = []
    for blob, box in zip(bm, boxes):
        out.append(round(float(blob[0, 0] - box[0])))
    return out


def test_real_boxes_use_original_label_index(bm_root):
    """No gt sampler in the queue: the Van is still present when the
    querier runs; Cars at positions 1/2 load pkl 1/2."""
    aug = DataAugmentor(
        bm_root,
        EasyDict({"AUG_CONFIG_LIST": [_querier_cfg()]}),
        class_names=["Car"],
    )
    d = aug.forward(_base_dict(), rng=np.random.RandomState(0))
    # Van skipped; two Car shapes loaded, keyed 1 and 2
    assert _markers(d, d["gt_boxes"][1:3]) == [100, 200]
    assert "gt_boxes_inds" not in d


def test_real_boxes_after_sampler_filter(bm_root):
    """The gt sampler applies gt_boxes_mask (dropping the Van) before the
    querier runs; surviving Cars sit at positions 0/1 but must still load
    pkl 1/2. Emulates `add_sampled_boxes_to_scene` filtering."""
    querier = MltBestMatchQuerier(bm_root, _querier_cfg(), ["Car"])
    d = _base_dict()
    # what DataAugmentor.forward + the sampler do before the querier:
    d["gt_boxes_inds"] = np.arange(len(d["gt_boxes_mask"]))
    mask = d.pop("gt_boxes_mask")
    d["gt_boxes"] = d["gt_boxes"][mask]
    d["gt_names"] = d["gt_names"][mask]
    d["gt_boxes_inds"] = d["gt_boxes_inds"][mask]
    # one pasted box from frame 9, source gt index 5
    d["gt_boxes"] = np.concatenate(
        [d["gt_boxes"], [[30.0, 5.0, -1.0, 3.9, 1.6, 1.56, 0.0]]]
    ).astype(np.float32)
    d["gt_names"] = np.concatenate([d["gt_names"], ["Car"]])
    d["aug_boxes_image_idx"] = np.array(["000009"])
    d["aug_boxes_gt_idx"] = np.array([5])

    d = querier(d)
    assert _markers(d, d["gt_boxes"]) == [100, 200, 900]


def test_sampler_filters_gt_boxes_inds(bm_root):
    """DataBaseSampler.add_sampled_boxes_to_scene keeps gt_boxes_inds
    aligned with the surviving real boxes."""
    from btcdet_tpu.datasets.augmentor import DataBaseSampler

    d = _base_dict()
    d["gt_boxes_inds"] = np.arange(3)
    sampler = DataBaseSampler.__new__(DataBaseSampler)  # skip db loading
    sampler.root_path = bm_root
    sampler.sampler_cfg = EasyDict({"NUM_POINT_FEATURES": 4})
    dummy = np.zeros((2, 4), np.float32)
    dummy.tofile(str(bm_root / "obj.bin"))
    info = {"path": "obj.bin", "box3d_lidar": np.zeros(7, np.float32),
            "image_idx": "000009", "gt_idx": 5, "name": "Car"}
    out = sampler.add_sampled_boxes_to_scene(
        d, np.zeros((1, 7), np.float32), [info]
    )
    np.testing.assert_array_equal(out["gt_boxes_inds"], [1, 2])
    np.testing.assert_array_equal(out["aug_boxes_gt_idx"], [5])
