"""Host-side occ-debug view collector (reference
`add_occ_template.visualize:290-422`, gated by OCC_PNT_UPDATE.VIS):
masks -> voxel-center clouds + BEV raster images, matching the
reference's cloud-dict key names so visualize_pc.py works unchanged."""

import numpy as np
import pytest

from btcdet_tpu.config import CfgBox
from btcdet_tpu.datasets.mini_config import mini_data_cfg
from btcdet_tpu.models.occ import occ_targets as T
from btcdet_tpu.utils import vis_utils

pytestmark = pytest.mark.slow  # model-scale XLA compiles; smoke suite skips


def make_inputs():
    spec = T.build_grid_spec(CfgBox(mini_data_cfg(with_occ=True)))
    nx, ny, nz = spec.grid_size
    B = 2
    rng = np.random.RandomState(0)
    masks = {}
    for k in ("general_cls_loss_mask", "fore_voxelwise_mask",
              "mirr_voxelwise_mask", "bm_voxelwise_mask", "pos_mask",
              "neg_mask", "occ_voxelwise_mask", "vcc_mask",
              "voxel_drop_mask"):
        masks[k] = rng.rand(B, nz, ny, nx) < 0.01
    masks["forebox_label"] = rng.rand(B, nz, ny, nx) < 0.01
    out = dict(masks)
    out["probs"] = rng.rand(B, nz, ny, nx).astype(np.float32)
    K = 32
    out["occ_points"] = rng.randn(B, K, 4).astype(np.float32)
    out["occ_points_mask"] = rng.rand(B, K) < 0.5
    batch = {
        "points": rng.randn(B, 64, 4).astype(np.float32),
        "gt_boxes": np.concatenate(
            [rng.randn(B, 3, 7), np.ones((B, 3, 1))], -1).astype(np.float32),
        "rot_z": np.asarray([0.0, 12.0], np.float32),
    }
    return spec, out, batch


def all_flags():
    return {k: True for k in (
        "CLS_LOSS", "OCC_VOX", "BM_VOX_VIEW", "FILTER_VIEW",
        "FORE_VOX_GT_VIEW", "OCC_FORE_VOX_GT_VIEW", "OCC_MIRR_VOX_GT_VIEW",
        "OCC_BM_VOX_GT_VIEW", "OCC_POS_VOX_GT_VIEW", "OCC_NEG_VOX_GT_VIEW",
        "PRED_FORE_VIEW", "ADD_PNT_VIEW", "DROP_VOX_VIEW", "BOX_VIEW",
        "OUTPUT_CLOUD")}


def test_all_views_emitted():
    spec, out, batch = make_inputs()
    tb, pc = vis_utils.collect_occ_vis_clouds(out, batch, spec, all_flags())
    assert {"fore_gt_center", "occ_fore_center", "occ_mirr_center",
            "occ_bm_center", "occ_pos_center", "occ_neg_center",
            "occ_center", "bmvoxel_center", "general_cls_loss_center",
            "filter_center", "drop_voxel_center", "proboccpoints",
            "boxvoxel_center", "addpnt_view", "gt_points", "gt_boxes"} <= set(pc)
    for k, v in pc.items():
        assert v.ndim == 2 and v.shape[1] in (3, 7), k
        assert np.isfinite(v).all(), k
    assert "forevox_gt_view_img" in tb and "addpnt_img" in tb
    assert "pred_fore_0.5_img" in tb
    for img in tb.values():
        assert img.dtype == np.uint8 and img.ndim == 3


def test_mask_count_and_cls_intersection():
    spec, out, batch = make_inputs()
    tb, pc = vis_utils.collect_occ_vis_clouds(out, batch, spec, all_flags())
    b = 0
    assert len(pc["occ_center"]) == int(out["occ_voxelwise_mask"][b].sum())
    # occluded fore view = fore mask clipped to the cls-loss region
    want = int((out["fore_voxelwise_mask"][b]
                & out["general_cls_loss_mask"][b]).sum())
    assert len(pc["occ_fore_center"]) == want
    # ADD_PNT_VIEW keeps only the valid occ points
    assert len(pc["addpnt_view"]) == int(out["occ_points_mask"][b].sum())


def test_rot_z_rotates_centers():
    spec, out, batch = make_inputs()
    _, pc0 = vis_utils.collect_occ_vis_clouds(out, batch, spec, all_flags(), frame=0)
    _, pc1 = vis_utils.collect_occ_vis_clouds(out, batch, spec, all_flags(), frame=1)
    # frame 1 has rot_z=12 deg: same mask geometry, rotated centers ->
    # same radii, different xy
    m = out["occ_voxelwise_mask"]
    out2 = dict(out)
    out2["occ_voxelwise_mask"] = np.stack([m[1], m[1]])
    _, pca = vis_utils.collect_occ_vis_clouds(out2, batch, spec, all_flags(), frame=0)
    _, pcb = vis_utils.collect_occ_vis_clouds(out2, batch, spec, all_flags(), frame=1)
    a, bb = pca["occ_center"], pcb["occ_center"]
    assert a.shape == bb.shape and len(a) > 0
    np.testing.assert_allclose(
        np.linalg.norm(a[:, :2], axis=-1),
        np.linalg.norm(bb[:, :2], axis=-1), rtol=1e-5)
    assert np.abs(a[:, :2] - bb[:, :2]).max() > 1e-3


def test_output_cloud_off_suppresses_pc():
    spec, out, batch = make_inputs()
    flags = all_flags()
    flags["OUTPUT_CLOUD"] = False
    tb, pc = vis_utils.collect_occ_vis_clouds(out, batch, spec, flags)
    assert pc == {}
    assert tb  # images still produced for tensorboard


def test_btcnet_exports_vis_masks_end_to_end():
    """The full-model train forward must carry every VIS mask out of the
    occ subnet (BtcNet VIS_MASK_KEYS) so the train-loop dump path sees
    real data — guards the plumbing, not just the collector."""
    import jax
    import jax.numpy as jnp
    from btcdet_tpu.datasets import make_synthetic_batch
    from btcdet_tpu.datasets.mini_config import mini_model_cfg
    from btcdet_tpu.models import build_network

    data_cfg = mini_data_cfg(with_occ=True)
    model_cfg = mini_model_cfg(with_occ=True)
    net = build_network(model_cfg, data_cfg, ["Car"])
    batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(
        CfgBox(data_cfg), batch_size=2, num_points=4096, num_gt=4).items()}
    rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = jax.jit(lambda r, b: net.init(r, b, train=True))(rngs, batch)
    out, _ = net.apply(
        variables, batch, train=True,
        rngs={"sampling": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        mutable=["batch_stats"],
    )
    for k in ("general_cls_loss_mask", "fore_voxelwise_mask", "pos_mask",
              "neg_mask", "occ_voxelwise_mask", "vcc_mask"):
        assert k in out, f"BtcNet train output missing VIS mask {k}"

    spec = T.build_grid_spec(CfgBox(data_cfg))
    out_np = jax.device_get(out)
    batch_np = jax.device_get(batch)
    tb, pc = vis_utils.collect_occ_vis_clouds(out_np, batch_np, spec, all_flags())
    # the observed-voxel-derived views must be non-empty on real data
    assert len(pc["general_cls_loss_center"]) > 0
    assert len(pc["occ_center"]) > 0
    assert pc["gt_points"].shape[0] > 0
