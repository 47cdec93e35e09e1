"""Execute the REFERENCE BtcNet full forward on CPU and record per-stage
outputs for the full-forward imported-weights golden chain
(VERDICT r4 next #1; consumed by tests/test_golden_full.py).

The reference model is built from its own flagship yaml shrunk to the
golden-mini geometry (btcdet_tpu.train.golden_synth.apply_golden_mini),
its native extensions replaced by EXECUTABLE CPU stand-ins
(tools/golden_exec_stubs.py: dense-emulated spconv, exact ball/shell
query, polygon-clip IoU/NMS), and its weights set to the deterministic
synthetic state dict both sides can regenerate (golden_synth). The
input batch comes from OUR synthetic pipeline (saved in our layout)
and is converted to the reference collate layout
(`/root/reference/btcdet/datasets/dataset.py:167-223`).

Run: python tools/gen_golden_full.py   (writes tests/fixtures/golden_full.npz)
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path(os.environ.get("BTCDET_REFERENCE", "/root/reference"))
OUT = REPO / "tests" / "fixtures" / "golden_full.npz"

sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import torch  # noqa: E402

import golden_exec_stubs as ges  # noqa: E402
from extract_reference_manifest import (  # noqa: E402
    _CpuOnly, _FakeDataset, install_stubs)


def install_exec_stubs():
    """Executable stubs FIRST (install_stubs setdefaults won't override)."""
    spconv, utils = ges.make_exec_spconv()
    sys.modules["spconv"] = spconv
    sys.modules["spconv.utils"] = utils
    sys.modules["btcdet.ops.pointnet2.pointnet2_stack.pointnet2_stack_cuda"] = (
        ges.make_exec_pointnet2_stack())
    sys.modules["btcdet.ops.iou3d_nms.iou3d_nms_cuda"] = ges.make_exec_iou3d()
    install_stubs()
    # legacy CUDA tensor constructors used by the wrappers
    # (iou3d_nms_utils.py:41, pointnet2_utils.py:33); TorchFunctionMode
    # does not intercept these
    torch.cuda.FloatTensor = lambda *s: (
        torch.zeros(*s) if not (len(s) == 1 and isinstance(s[0], torch.Size))
        else torch.zeros(s[0]))
    torch.cuda.IntTensor = lambda *s: torch.zeros(*s, dtype=torch.int32)
    torch.cuda.LongTensor = lambda *s: torch.zeros(*s, dtype=torch.int64)


def to_reference_batch(batch, batch_size):
    """Our padded synthetic batch -> the reference collate layout, as
    float32 torch tensors (load_data_to_gpu casts everything float,
    `/root/reference/btcdet/models/__init__.py:16-22`)."""
    ref = {"batch_size": batch_size, "is_train": False}

    pts = batch["points"]          # (B, P, 4)
    pm = batch["points_mask"]
    rows = []
    for b in range(batch_size):
        p = pts[b][pm[b]]
        rows.append(np.concatenate(
            [np.full((len(p), 1), b, np.float32), p], axis=1))
    ref["points"] = np.concatenate(rows, 0)

    def ragged(vox, coords, nump, key):
        valid = coords[:, 0] >= 0
        ref[key + "voxels" if key else "voxels"] = vox[valid]
        ref[(key + "voxel_coords") if key else "voxel_coords"] = (
            coords[valid].astype(np.float32))
        ref[(key + "voxel_num_points") if key else "voxel_num_points"] = (
            nump[valid].astype(np.float32))
        ref[("batch_det_voxel_num" if key else "batch_voxel_num")] = np.array(
            [(coords[valid][:, 0] == b).sum() for b in range(batch_size)],
            np.int64)

    # reference 'voxels' = occ (cylinder) grid; 'det_voxels' = cartesian
    ragged(batch["occ_voxels"], batch["occ_voxel_coords"],
           batch["occ_voxel_num_points"], "")
    ragged(batch["det_voxels"], batch["det_voxel_coords"],
           batch["det_voxel_num_points"], "det_")

    ref["gt_boxes"] = batch["gt_boxes"]
    ref["gt_boxes_num"] = [int((np.abs(g[:, 3:6]).sum(-1) > 0).sum())
                           for g in batch["gt_boxes"]]
    ref["box_mirr_flag"] = batch["box_mirr_flag"].astype(np.float32)

    bm = batch["bm_points"]        # (B, K, 3)
    bmm = batch["bm_points_mask"]
    rows = []
    for b in range(batch_size):
        p = bm[b][bmm[b]]
        rows.append(np.concatenate(
            [np.full((len(p), 1), b, np.float32), p.astype(np.float32)], 1))
    ref["bm_points"] = np.concatenate(rows, 0)

    ref["rot_z"] = batch["rot_z"].astype(np.float32)
    ref["use_lead_xyz"] = np.ones(batch_size, bool)
    ref["augment_box_num"] = np.zeros(batch_size, np.int64)
    ref["use_occ_prob"] = [True] * batch_size

    for k, v in list(ref.items()):
        if isinstance(v, np.ndarray) and v.dtype != bool and k != "augment_box_num":
            ref[k] = torch.from_numpy(np.ascontiguousarray(v)).float()
    return ref


def main():
    install_exec_stubs()
    sys.path.insert(0, str(REFERENCE))

    import jax
    jax.config.update("jax_platforms", "cpu")

    from btcdet_tpu.config import cfg_from_yaml_file as our_cfg_load
    from btcdet_tpu.datasets.synthetic import make_synthetic_batch
    from btcdet_tpu.train.golden_synth import (
        FIXED_CONSTANT_KEYS, apply_golden_mini, synth_state_dict)

    # our data config (for the synthetic batch) at golden-mini geometry
    our_cfg = our_cfg_load(str(REPO / "tools/cfgs/model_configs/btcdet_kitti_car.yaml"))
    apply_golden_mini(our_cfg, is_reference=False)

    B = 2
    batch = make_synthetic_batch(
        our_cfg.DATA_CONFIG, batch_size=B, num_points=4096, num_gt=4,
        seed=11, mode="test")

    # ---- reference model at the same geometry
    tools_dir = REFERENCE / "tools"
    cwd = os.getcwd()
    os.chdir(tools_dir)
    try:
        from btcdet.config import cfg, cfg_from_yaml_file
        cfg_from_yaml_file(
            str(tools_dir / "cfgs" / "model_configs" / "btcdet_kitti_car.yaml"),
            cfg)
        apply_golden_mini(cfg, is_reference=True)
        from btcdet.models import build_network
        ds = _FakeDataset(cfg, cfg.CLASS_NAMES)
        with _CpuOnly():
            model = build_network(model_cfg=cfg.MODEL,
                                  num_class=len(cfg.CLASS_NAMES), dataset=ds)
    finally:
        os.chdir(cwd)

    model.eval()

    # synthetic weights from the model's own names/shapes; must agree
    # with the committed manifest (the test side regenerates from it)
    sd_shapes = {k: list(v.shape) for k, v in model.state_dict().items()}
    manifest = json.load(open(REPO / "tests/fixtures/reference_state_dict_manifest.json"))
    assert sd_shapes == manifest, (
        "model state dict diverged from the committed manifest; re-run "
        "tools/extract_reference_manifest.py")
    synth = synth_state_dict(sd_shapes)
    full = {k: torch.from_numpy(synth[k]) if k in synth else v
            for k, v in model.state_dict().items()}
    for k in FIXED_CONSTANT_KEYS:
        assert k in full
    model.load_state_dict(full, strict=True)
    model.eval_count = 1  # dodge the eval_count%800==0 vis branch

    ref_batch = to_reference_batch(batch, B)

    caps = {}

    def dense_np(st):
        return st.dense().detach().numpy()

    # per-level occ backbone captures (localize deconv/conv import bugs)
    occ_bb = model.occ_modules.backbone_3d
    for lvl in ("conv1", "conv2", "conv3", "deconv4", "deconv5"):
        def mk_hook(name):
            def hook(mod, inp, out):
                caps[f"occ_bb_{name}"] = dense_np(out)
            return hook
        getattr(occ_bb, lvl).register_forward_hook(mk_hook(lvl))

    # ConvHead branch captures: SA pooled features + xc conv output
    rh = model.det_modules.roi_head
    def sa_hook(name):
        def hook(mod, inp, out):
            caps[name] = out[1].detach().numpy()  # (M, C) pooled features
        return hook
    if hasattr(rh, "SA_rawpoints"):
        rh.SA_rawpoints.register_forward_hook(sa_hook("roi_sa_raw"))
    if hasattr(rh, "SA_occpoints"):
        rh.SA_occpoints.register_forward_hook(sa_hook("roi_sa_occ"))
    for nm, lyr in zip(rh.conv_layer_names, rh.conv_layers):
        def xc_hook(name):
            def hook(mod, inp, out):
                caps[f"roi_xc_{name}"] = out.dense().detach().numpy()
            return hook
        lyr.register_forward_hook(xc_hook(nm))

    with torch.no_grad(), _CpuOnly():
        bd = ref_batch
        for mod in model.occ_module_list:
            bd = mod(bd)
            name = type(mod).__name__
            if name == "OccTargets3D":
                for mk in ("vcc_mask", "voxelwise_mask", "occ_voxelwise_mask",
                           "fore_voxelwise_mask", "bm_voxelwise_mask",
                           "occ_fore_cls_mask", "occ_mirr_cls_mask",
                           "occ_bm_cls_mask", "pos_mask",
                           "general_cls_loss_mask", "forebox_label",
                           "general_reg_loss_mask", "res_mtrx"):
                    if mk in bd and torch.is_tensor(bd[mk]):
                        caps["tgt_" + mk] = bd[mk].detach().numpy()
            elif name == "MeanVFE":
                caps["occ_vfe_features"] = bd["voxel_features"].detach().numpy()
            elif name == "VoxelBackBoneDeconv":
                caps["occ_backbone_dense"] = dense_np(bd["encoded_spconv_tensor"])
            elif name == "OccHead3D":
                caps["occ_prob"] = bd["batch_pred_occ_prob"].detach().numpy()
            elif name == "PassOccVox":
                caps["merged_voxel_coords"] = bd["voxel_coords"].detach().numpy()
                caps["merged_voxels"] = bd["voxels"].detach().numpy()
                caps["merged_voxel_num_points"] = bd["voxel_num_points"].detach().numpy()
                caps["added_occ_xyz"] = bd["added_occ_xyz"].detach().numpy()
                caps["added_occ_b"] = bd["added_occ_b_ind"].detach().numpy()
                caps["occ_pnts"] = bd["occ_pnts"].detach().numpy()
        for mod in model.det_module_list:
            bd = mod(bd)
            name = type(mod).__name__
            if name == "OccVFE":
                caps["det_vfe_features"] = bd["voxel_features"].detach().numpy()
                caps["det_occ_vfe_features"] = bd["occ_voxel_features"].detach().numpy()
            elif name == "VoxelBackBone8xOcc":
                caps["det_encoded_dense"] = dense_np(bd["encoded_spconv_tensor"])
                caps["x_combine_dense"] = dense_np(
                    bd["multi_scale_3d_features"]["x_combine"])
            elif name == "HeightCompression":
                caps["spatial_features"] = bd["spatial_features"].detach().numpy()
            elif name == "BaseBEVBackbone":
                caps["spatial_features_2d"] = bd["spatial_features_2d"].detach().numpy()
            elif name == "AnchorHeadSingle":
                caps["rpn_cls_preds"] = bd["batch_cls_preds"].detach().numpy()
                caps["rpn_box_preds"] = bd["batch_box_preds"].detach().numpy()
            elif name == "ConvHead":
                caps["rois"] = bd["rois"].detach().numpy()
                caps["roi_scores"] = bd["roi_scores"].detach().numpy()
                caps["rcnn_cls"] = bd["batch_cls_preds"].detach().numpy()
                caps["rcnn_box_preds"] = bd["batch_box_preds"].detach().numpy()

    arrays = {"in::" + k: np.asarray(v) for k, v in batch.items()}
    arrays.update({"ref::" + k: v for k, v in caps.items()})
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **arrays)
    print(f"wrote {OUT} ({OUT.stat().st_size/1024:.0f} KiB)")
    for k, v in caps.items():
        print(f"  ref::{k:28s} {v.shape} |mean|={np.abs(v).mean():.4g}")


if __name__ == "__main__":
    main()
