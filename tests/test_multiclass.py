"""Multi-class anchor layout + assignment (3-class readiness)."""

import jax.numpy as jnp
import numpy as np
import pytest

from btcdet_tpu.models.dense_heads import anchor_head as AH
from btcdet_tpu.utils import box_coder as bc

pytestmark = pytest.mark.slow  # model-scale XLA compiles; smoke suite skips


def cfgs():
    return [
        {"class_name": "Car", "anchor_sizes": [[3.9, 1.6, 1.56]],
         "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.78],
         "align_center": False, "feature_map_stride": 8,
         "matched_threshold": 0.6, "unmatched_threshold": 0.45},
        {"class_name": "Pedestrian", "anchor_sizes": [[0.8, 0.6, 1.73]],
         "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-0.6],
         "align_center": False, "feature_map_stride": 8,
         "matched_threshold": 0.5, "unmatched_threshold": 0.35},
    ]


def test_anchor_interleaving():
    grid = (64, 64)  # nx, ny -> feature map 8x8
    anchors, anchor_class, per_loc = AH.generate_anchors((0, -10, -3, 20, 10, 1), grid, cfgs())
    assert per_loc == 4  # 2 classes x 2 rotations
    assert anchors.shape == (8 * 8 * 4, 7)
    # layout [y, x, class*rot]: first 4 anchors share the first location
    np.testing.assert_allclose(anchors[0, :2], anchors[3, :2])
    assert list(anchor_class[:4]) == [0, 0, 1, 1]
    # class dims correct
    assert anchors[0, 3] == 3.9 and anchors[2, 3] == 0.8


def test_multiclass_assignment():
    grid = (64, 64)
    anchors, anchor_class, _ = AH.generate_anchors((0, -10, -3, 20, 10, 1), grid, cfgs())
    a = jnp.asarray(anchors)
    coder = bc.ResidualCoder()

    # one car gt exactly on a car anchor; one ped gt on a ped anchor
    car_i = int(np.where((anchor_class == 0) & (np.abs(anchors[:, 6]) < 0.1))[0][20])
    ped_i = int(np.where((anchor_class == 1) & (np.abs(anchors[:, 6]) < 0.1))[0][30])
    gt = np.zeros((2, 7), np.float32)
    gt[0] = anchors[car_i]
    gt[1] = anchors[ped_i]
    gv_car = jnp.asarray([True, False])
    gv_ped = jnp.asarray([False, True])

    lab_c, regt_c, regm_c = AH.assign_targets_single_class(
        a, jnp.asarray(anchor_class == 0), jnp.asarray(gt), gv_car, 1,
        0.6, 0.45, coder, False,
    )
    lab_p, regt_p, regm_p = AH.assign_targets_single_class(
        a, jnp.asarray(anchor_class == 1), jnp.asarray(gt), gv_ped, 2,
        0.5, 0.35, coder, False,
    )
    lab_c, lab_p = np.asarray(lab_c), np.asarray(lab_p)
    assert lab_c[car_i] == 1
    assert lab_p[ped_i] == 2
    # car gt never labels ped anchors
    assert not np.any(lab_c[np.asarray(anchor_class) == 1] > 0)
    # exact-match anchor gets zero reg target
    np.testing.assert_allclose(np.asarray(regt_c[car_i]), 0.0, atol=1e-5)
