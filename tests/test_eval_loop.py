"""Full evaluation-loop integration: synthetic on-disk KITTI -> dataset ->
model eval forward -> post NMS -> KITTI-format decode -> official AP +
recall + occ diagnostics (the tools/test.py path, minus the CLI)."""

import jax
import numpy as np
import pytest

from btcdet_tpu.config import EasyDict
from btcdet_tpu.datasets import bestmatch
from btcdet_tpu.datasets.kitti import kitti_infos
from btcdet_tpu.datasets.kitti.kitti_dataset import KittiDataset
from btcdet_tpu.models import build_network
from btcdet_tpu.train import eval_utils

from test_kitti_pipeline import data_cfg as pipeline_data_cfg, make_raw_kitti
from test_model_e2e import mini_model_cfg

pytestmark = pytest.mark.slow  # model-scale XLA compiles; smoke suite skips


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_eval")
    make_raw_kitti(root)
    kitti_infos.create_kitti_infos(root, workers=2)
    bestmatch.create_best_match_db(root, class_names=("Car",), splits=("train",))
    return root


def test_eval_loop_end_to_end(kitti_root):
    dcfg = pipeline_data_cfg(kitti_root)
    mcfg = mini_model_cfg(with_occ=True)
    net = build_network(mcfg, dcfg, ["Car"])

    ds = KittiDataset(dcfg, ["Car"], training=False, root_path=kitti_root)
    batches = [ds.collate_batch([ds[i]]) for i in range(len(ds))]

    import jax.numpy as jnp

    example = {k: jnp.asarray(v) for k, v in batches[0].items() if k != "frame_id"}
    rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = jax.jit(lambda r, b: net.init(r, b, train=False))(rngs, example)

    result_str, result_dict, det_annos = eval_utils.eval_one_epoch(
        net, variables, batches, ds, mcfg.POST_PROCESSING, ["Car"],
        recall_thresh_list=(0.3, 0.5, 0.7),
    )
    # untrained model: AP near zero, but the whole chain must produce
    # well-formed results
    assert "Car_3d/moderate_R40" in result_dict
    assert np.isfinite(result_dict["Car_3d/moderate_R40"])
    assert result_dict["frames_per_sec"] > 0
    assert "occ_f1@0.5" in result_dict
    # per-occ-threshold box coverage diagnostic (reference
    # occ_post_processing): monotone non-increasing in the threshold
    covs = [result_dict[f"occ_box_cvrg@{t/10:.1f}"] for t in range(1, 10)]
    assert all(0.0 <= c <= 1.0 for c in covs)
    assert all(a >= b - 1e-9 for a, b in zip(covs, covs[1:]))
    assert len(det_annos) == len(ds)
    for anno in det_annos:
        assert set(anno) >= {"name", "bbox", "location", "dimensions",
                             "rotation_y", "score", "boxes_lidar"}
