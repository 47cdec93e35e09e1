"""Capture golden input/output fixtures from the REFERENCE torch modules
(VERDICT r1 next #2): box coders (`btcdet/utils/box_coder_utils.py`),
AxisAlignedTargetAssigner + AnchorGenerator
(`btcdet/models/dense_heads/target_assigner/`), loss functions
(`btcdet/utils/loss_utils.py`), sin-difference / direction-bin encodings
(`anchor_head_template.py:140-162`), spherical coordinate transforms
(`btcdet/utils/coords_utils.py`), nearest-BEV IoU
(`btcdet/utils/box_utils.py:313`), and the sphere-occlusion cumsum
(`occ_targets_template.py:109-134`).

The reference code is EXECUTED (torch CPU, cuda redirected) on small
seeded inputs; nothing is copied. Outputs land in
tests/fixtures/golden_reference.json and are asserted against the JAX
implementations by tests/test_golden_reference.py.

Run: python tools/gen_golden_fixtures.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np
import torch

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))
sys.path.insert(0, str(REPO))

from extract_reference_manifest import REFERENCE, _CpuOnly, install_stubs  # noqa: E402

OUT = REPO / "tests" / "fixtures" / "golden_reference.json"


def _np(x):
    return np.asarray(x.detach().cpu().numpy() if torch.is_tensor(x) else x)


def _lst(x):
    return _np(x).tolist()


def box_coder_fixtures(rng):
    from btcdet.utils import box_coder_utils

    n = 14
    anchors = np.stack([
        rng.uniform(0, 40, n), rng.uniform(-20, 20, n), rng.uniform(-2, 0, n),
        rng.uniform(1.5, 4.5, n), rng.uniform(1.2, 2.0, n), rng.uniform(1.2, 1.9, n),
        rng.uniform(-np.pi, np.pi, n),
    ], axis=1).astype(np.float32)
    boxes = anchors + rng.uniform(-0.4, 0.4, (n, 7)).astype(np.float32)
    enc_in = rng.uniform(-0.5, 0.5, (n, 7)).astype(np.float32)
    enc_in8 = rng.uniform(-0.5, 0.5, (n, 8)).astype(np.float32)
    points = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    classes = rng.randint(1, 2, n).astype(np.int64)

    out = {
        "anchors": anchors.tolist(),
        "boxes": boxes.tolist(),
        "enc_in": enc_in.tolist(),
        "enc_in8": enc_in8.tolist(),
        "points": points.tolist(),
        "classes": classes.tolist(),
    }
    t = lambda a: torch.from_numpy(np.array(a, np.float32))

    for sincos in (False, True):
        c = box_coder_utils.ResidualCoder(encode_angle_by_sincos=sincos)
        enc = c.encode_torch(t(boxes), t(anchors))
        dec = c.decode_torch(t(enc_in if not sincos else
                               np.concatenate([enc_in, enc_in[:, :1]], 1)),
                             t(anchors))
        key = "residual_sincos" if sincos else "residual"
        out[f"{key}_enc"] = _lst(enc)
        out[f"{key}_dec"] = _lst(dec)

    c = box_coder_utils.AbsResidualCoder()
    out["abs_residual_enc"] = _lst(c.encode_torch(t(boxes), t(anchors)))
    out["abs_residual_dec"] = _lst(c.decode_torch(t(enc_in), t(anchors)))

    out["prev_residual_dec"] = _lst(
        box_coder_utils.PreviousResidualDecoder.decode_torch(t(enc_in), t(anchors)))
    out["prev_residual_roi_dec"] = _lst(
        box_coder_utils.PreviousResidualRoIDecoder.decode_torch(t(enc_in), t(anchors)))

    with _CpuOnly():
        c = box_coder_utils.PointResidualCoder(mean_size=[[3.9, 1.6, 1.56]])
        pe = c.encode_torch(t(boxes).clone(), t(points),
                            torch.from_numpy(classes))
        pd = c.decode_torch(t(enc_in8), t(points), torch.from_numpy(classes))
    out["point_residual_enc"] = _lst(pe)
    out["point_residual_dec"] = _lst(pd)
    return out


def assigner_fixtures(rng):
    """AnchorGenerator on a tiny grid + AxisAlignedTargetAssigner on
    padded gt (pos_fraction<0 deterministic path, match_height=False):
    the flagship Car setup at toy scale."""
    from easydict import EasyDict

    from btcdet.models.dense_heads.target_assigner.anchor_generator import (
        AnchorGenerator,
    )
    from btcdet.models.dense_heads.target_assigner.axis_aligned_target_assigner import (
        AxisAlignedTargetAssigner,
    )
    from btcdet.utils import box_coder_utils

    pcr = [0.0, -8.0, -3.0, 16.0, 8.0, 1.0]
    agc = [EasyDict({
        "class_name": "Car",
        "anchor_sizes": [[3.9, 1.6, 1.56]],
        "anchor_rotations": [0, 1.57],
        "anchor_bottom_heights": [-1.78],
        "align_center": False,
        "feature_map_stride": 1,
        "matched_threshold": 0.6,
        "unmatched_threshold": 0.45,
    })]
    grid = [8, 8]  # (nx, ny)
    gen = AnchorGenerator(anchor_range=pcr, anchor_generator_config=agc)
    with _CpuOnly():
        anchors_list, cnt = gen.generate_anchors([np.array(grid)])
    anchors6d = anchors_list[0]  # (Z, Y, X, S, R, 7)
    fmap_size = list(anchors6d.shape[:3])
    anchors_flat = anchors6d.view(-1, 7)

    B, M = 2, 5
    gt = np.zeros((B, M, 8), np.float32)
    for b in range(B):
        k = 3 if b == 0 else 2
        gt[b, :k, 0] = rng.uniform(2, 14, k)
        gt[b, :k, 1] = rng.uniform(-6, 6, k)
        gt[b, :k, 2] = rng.uniform(-1.8, -0.8, k)
        gt[b, :k, 3:6] = np.array([3.9, 1.6, 1.56]) * rng.uniform(0.9, 1.1, (k, 3))
        gt[b, :k, 6] = rng.uniform(-np.pi, np.pi, k)
        gt[b, :k, 7] = 1  # Car

    model_cfg = EasyDict({
        "ANCHOR_GENERATOR_CONFIG": agc,
        "TARGET_ASSIGNER_CONFIG": EasyDict({
            "POS_FRACTION": -1.0, "SAMPLE_SIZE": 512,
            "NORM_BY_NUM_EXAMPLES": False, "MATCH_HEIGHT": False,
            "NAME": "AxisAlignedTargetAssigner", "BOX_CODER": "ResidualCoder",
        }),
    })
    assigner = AxisAlignedTargetAssigner(
        model_cfg, ["Car"], box_coder_utils.ResidualCoder(), match_height=False)
    with _CpuOnly():
        tgt = assigner.assign_targets(
            [anchors6d], torch.from_numpy(gt))
    return {
        "anchors_view_shape": fmap_size,
        "anchors": _lst(anchors_flat),
        "gt_boxes": gt.tolist(),
        "matched_threshold": 0.6,
        "unmatched_threshold": 0.45,
        "box_cls_labels": _lst(tgt["box_cls_labels"]),
        "box_reg_targets": _lst(tgt["box_reg_targets"]),
        "reg_weights": _lst(tgt["reg_weights"]),
    }


def loss_fixtures(rng):
    from btcdet.utils import loss_utils

    B, N, C = 2, 24, 3
    logits = rng.randn(B, N, C).astype(np.float32)
    onehot = np.eye(C, dtype=np.float32)[rng.randint(0, C, (B, N))]
    weights = rng.uniform(0, 2, (B, N)).astype(np.float32)
    pred7 = rng.randn(B, N, 7).astype(np.float32)
    tgt7 = rng.randn(B, N, 7).astype(np.float32)
    code_w = [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 2.0]
    t = torch.from_numpy

    out = {
        "logits": logits.tolist(), "onehot": onehot.tolist(),
        "weights": weights.tolist(), "pred7": pred7.tolist(),
        "tgt7": tgt7.tolist(), "code_weights": code_w,
    }
    f = loss_utils.SigmoidFocalClassificationLoss(gamma=2.0, alpha=0.25)
    out["sigmoid_focal"] = _lst(f(t(logits), t(onehot), t(weights)))
    sl = loss_utils.WeightedSmoothL1Loss(code_weights=code_w)
    out["smooth_l1"] = _lst(sl(t(pred7), t(tgt7), t(weights)))
    ce = loss_utils.WeightedCrossEntropyLoss()
    out["cross_entropy"] = _lst(ce(t(logits), t(onehot), t(weights)))

    # softmax focal is used by the occ head with (N, C, ...) layout
    sm_logits = rng.randn(16, 4).astype(np.float32)
    sm_onehot = np.eye(4, dtype=np.float32)[rng.randint(0, 4, 16)]
    sm_w = rng.uniform(0, 2, (16, 1)).astype(np.float32)
    sf = loss_utils.SoftmaxFocalClassificationLoss(alpha=1.0, gamma=2.0)
    out["softmax_logits"] = sm_logits.tolist()
    out["softmax_onehot"] = sm_onehot.tolist()
    out["softmax_weights"] = sm_w.tolist()
    out["softmax_focal"] = _lst(sf(t(sm_logits), t(sm_onehot), t(sm_w)))

    corners_pred = rng.randn(6, 7).astype(np.float32)
    corners_gt = corners_pred + rng.uniform(-0.3, 0.3, (6, 7)).astype(np.float32)
    out["corner_pred"] = corners_pred.tolist()
    out["corner_gt"] = corners_gt.tolist()
    out["corner_loss"] = _lst(
        loss_utils.get_corner_loss_lidar(t(corners_pred), t(corners_gt)))
    return out


def head_encoding_fixtures(rng):
    from btcdet.models.dense_heads.anchor_head_template import AnchorHeadTemplate

    B, A = 2, 20
    boxes1 = rng.randn(B, A, 7).astype(np.float32)
    boxes2 = rng.randn(B, A, 7).astype(np.float32)
    anchors = rng.randn(B * A, 7).astype(np.float32)
    reg_targets = rng.randn(B, A, 7).astype(np.float32)
    t = torch.from_numpy
    b1, b2 = AnchorHeadTemplate.add_sin_difference(t(boxes1), t(boxes2))
    with _CpuOnly():
        dir_oh = AnchorHeadTemplate.get_direction_target(
            t(anchors), t(reg_targets), one_hot=True,
            dir_offset=0.78539, num_bins=2)
    return {
        "boxes1": boxes1.tolist(), "boxes2": boxes2.tolist(),
        "anchors": anchors.tolist(), "reg_targets": reg_targets.tolist(),
        "dir_offset": 0.78539, "num_bins": 2,
        "sin_diff_b1": _lst(b1), "sin_diff_b2": _lst(b2),
        "dir_onehot": _lst(dir_oh),
    }


def coords_fixtures(rng):
    from btcdet.utils import coords_utils

    pts = rng.uniform(-40, 40, (60, 3)).astype(np.float32)
    pts[:, 0] = np.abs(pts[:, 0]) + 1.0  # front hemisphere like KITTI FOV
    t = torch.from_numpy
    sph = coords_utils.cartesian_sphere_coords(t(pts))
    cyl = coords_utils.cartesian_cylinder_coords(t(pts))
    sph_np = _np(sph)
    back = coords_utils.sphere_uvd2absxyz(
        t(sph_np[:, 0]), t(sph_np[:, 1]), t(sph_np[:, 2]))
    return {
        "points": pts.tolist(),
        "sphere": _lst(sph),
        "cylinder": _lst(cyl),
        "sphere_roundtrip_xyz": _lst(back),
    }


def bev_iou_fixtures(rng):
    from btcdet.utils import box_utils

    a = np.stack([
        rng.uniform(0, 20, 10), rng.uniform(-10, 10, 10), rng.uniform(-2, 0, 10),
        rng.uniform(1.5, 4.5, 10), rng.uniform(1.2, 2.0, 10), rng.uniform(1.2, 1.9, 10),
        rng.uniform(-np.pi, np.pi, 10),
    ], axis=1).astype(np.float32)
    b = a[:6] + rng.uniform(-1.5, 1.5, (6, 7)).astype(np.float32)
    iou = box_utils.boxes3d_nearest_bev_iou(torch.from_numpy(a), torch.from_numpy(b))
    return {"boxes_a": a.tolist(), "boxes_b": b.tolist(), "iou": _lst(iou)}


def occ_occlusion_fixtures(rng):
    """`occ_from_sphere_ocp` default + BACK_TRACK branches on a random
    sphere-grid mask (occ_targets_template.py:109-134). The methods read
    only self.reverse_vis, so a minimal fake self suffices."""
    from btcdet.models.occ_pnt.occ_training_targets.occ_targets_template import (
        OccTargetsTemplate,
    )

    class _Fake:
        pass

    from easydict import EasyDict

    mask = (rng.random((2, 4, 6, 16)) < 0.15).astype(np.uint8)
    t = torch.from_numpy(mask)
    out = {"mask": mask.tolist(), "dist_kern": [3, 3, 3]}
    for rv in ("None", "BACK_TRACK", "VCC"):
        fake = _Fake()
        fake.reverse_vis = rv
        fake.data_cfg = EasyDict({"OCC": {"DIST_KERN": out["dist_kern"]}})
        occ = OccTargetsTemplate.occ_from_sphere_ocp(fake, None, t.clone())
        out[f"occluded_{rv}"] = _np(occ).astype(np.uint8).tolist()
    return out



CHAIN_OUT = REPO / "tests" / "fixtures" / "golden_chain.npz"


def dense_chain_fixtures(rng):
    """Multi-module CHAIN executed on the reference torch modules
    (VERDICT r2 next #8): BEV backbone (`base_bev_backbone.py:6-112`) ->
    anchor head (`anchor_head_single.py:7-82`) -> decoded proposals
    (`anchor_head_template.py:227`), with the torch state dict exported
    in reference naming -- so the JAX test validates
    ref_import.map_reference_state (weight transposes) AND the chained
    math together. Spatial grid is shrunk (det grid 64x64 -> 8x8 BEV)
    but every channel count is the flagship's, so all weight shapes
    match the real import path. The chain ends at decoded proposals:
    the reference's proposal NMS and rcnn-target subsampling call CUDA
    kernels / torch RNG that cannot execute on CPU torch (their
    semantics are golden-pinned per-module elsewhere)."""
    from easydict import EasyDict

    from btcdet.models.backbones_2d import BaseBEVBackbone
    from btcdet.models.dense_heads.anchor_head_single import AnchorHeadSingle

    bev_cfg = EasyDict({
        "LAYER_NUMS": [5, 5], "LAYER_STRIDES": [1, 2],
        "NUM_FILTERS": [128, 128], "UPSAMPLE_STRIDES": [1, 2],
        "NUM_UPSAMPLE_FILTERS": [128, 128],
    })
    head_cfg = EasyDict({
        "CLASS_AGNOSTIC": False,
        "USE_DIRECTION_CLASSIFIER": True,
        "DIR_OFFSET": 0.78539, "DIR_LIMIT_OFFSET": 0.0, "NUM_DIR_BINS": 2,
        "ANCHOR_GENERATOR_CONFIG": [{
            "class_name": "Car", "anchor_sizes": [[3.9, 1.6, 1.56]],
            "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.78],
            "align_center": False, "feature_map_stride": 8,
            "matched_threshold": 0.6, "unmatched_threshold": 0.45,
        }],
        "TARGET_ASSIGNER_CONFIG": EasyDict({
            "NAME": "AxisAlignedTargetAssigner", "POS_FRACTION": -1.0,
            "SAMPLE_SIZE": 512, "NORM_BY_NUM_EXAMPLES": False,
            "MATCH_HEIGHT": False, "BOX_CODER": "ResidualCoder",
        }),
        "LOSS_CONFIG": EasyDict({"LOSS_WEIGHTS": {
            "cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
            "code_weights": [1.0] * 7,
        }}),
    })
    grid = np.array([64, 64, 40])
    pc_range = np.array([0.0, -1.6, -3.0, 3.2, 1.6, 1.0])

    torch.manual_seed(7)
    bev = BaseBEVBackbone(bev_cfg, input_channels=256).eval()
    head = AnchorHeadSingle(
        head_cfg, input_channels=256, num_class=1, class_names=["Car"],
        grid_size=grid, point_cloud_range=pc_range,
        predict_boxes_when_training=False,
    ).eval()
    # non-degenerate weights: default init leaves conv_box ~N(0, 0.001)
    # and BN at identity; perturb BN stats so the BN math is exercised
    with torch.no_grad():
        for m in bev.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.1)

    x = torch.from_numpy(rng.randn(2, 256, 8, 8).astype(np.float32))
    dd = {"spatial_features": x, "batch_size": 2}
    with torch.no_grad():
        dd = bev(dd)
        dd = head(dd)

    sd = {}
    for k, v in bev.state_dict().items():
        sd["det_modules.backbone_2d." + k] = v.numpy()
    for k, v in head.state_dict().items():
        sd["det_modules.dense_head." + k] = v.numpy()
    arrays = {
        "input": x.numpy(),
        "spatial_features_2d": _np(dd["spatial_features_2d"]),
        "batch_cls_preds": _np(dd["batch_cls_preds"]),
        "batch_box_preds": _np(dd["batch_box_preds"]),
        "grid_size": grid, "pc_range": pc_range,
    }
    arrays.update({"sd::" + k: v for k, v in sd.items()})
    np.savez_compressed(CHAIN_OUT, **arrays)
    print(f"wrote {CHAIN_OUT} ({CHAIN_OUT.stat().st_size/1024:.0f} KiB)")


ROI_FC_OUT = REPO / "tests" / "fixtures" / "golden_roi_fc.npz"
OCC_HEAD_OUT = REPO / "tests" / "fixtures" / "golden_occ_head.npz"


def _build_reference_model():
    """Construct the FULL reference BtcNet on CPU (flagship yaml; CUDA
    extension modules stubbed — only dense-torch submodules execute)."""
    from extract_reference_manifest import _FakeDataset

    tools_dir = REFERENCE / "tools"
    cwd = os.getcwd()
    os.chdir(tools_dir)  # _BASE_CONFIG_ resolves relative to tools/
    try:
        from btcdet.config import cfg, cfg_from_yaml_file

        cfg_from_yaml_file(
            str(tools_dir / "cfgs" / "model_configs" / "btcdet_kitti_car.yaml"),
            cfg)
        from btcdet.models import build_network

        ds = _FakeDataset(cfg, cfg.CLASS_NAMES)
        return build_network(
            model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=ds)
    finally:
        os.chdir(cwd)


def _randomize(module, rng_seed: int):
    """Non-degenerate weights + perturbed BN stats so the chained math
    (incl. running-stat normalization) is actually exercised."""
    import torch.nn as tnn

    torch.manual_seed(rng_seed)
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, (tnn.Conv1d, tnn.Conv2d, tnn.Conv3d)):
                m.weight.normal_(0, 0.08)
                if m.bias is not None:
                    m.bias.normal_(0, 0.05)
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d, tnn.BatchNorm3d)):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.1)


def roi_fc_chain_fixtures(rng, model):
    """EXECUTE the reference ConvHead rcnn tail (VERDICT r3 next #10):
    pooled roi-grid features -> shared_fc_layer -> cls/reg Conv1d stacks
    (reference conv_head.py:372-379,474-477; all pure dense torch) ->
    generate_predicted_boxes decode (:427-455). The pooled input is
    saved in OUR (BN, G, C) grid-major layout and the reference is fed
    its own C-major view, so the fixture pins the t_fc_pooled interleave
    in ref_import as well as the FC/BN math and the roi decode."""
    rh = model.det_modules.roi_head
    _randomize(rh, 13)
    rh.eval()
    G = rh.grid_num
    c_in = rh.shared_fc_layer[0].weight.shape[1]
    assert c_in % G == 0, (c_in, G)
    C = c_in // G
    B, N = 2, 6
    pooled_gc = rng.randn(B * N, G, C).astype(np.float32)  # OUR layout
    # reference layout: (BN, G, C) -> view(BN, z,y,x, C) -> permute to
    # (BN, C, z,y,x) -> view(BN, C*G, 1)  (conv_head.py:374,379)
    pooled_cg = torch.from_numpy(
        pooled_gc.transpose(0, 2, 1).reshape(B * N, C * G, 1).copy())
    rois = np.concatenate([
        rng.uniform([0, -20, -2], [60, 20, 0], (B, N, 3)),
        rng.uniform([3.2, 1.4, 1.3], [4.5, 1.8, 1.8], (B, N, 3)),
        rng.uniform(-np.pi, np.pi, (B, N, 1)),
    ], axis=-1).astype(np.float32)
    with torch.no_grad():
        h = rh.shared_fc_layer(pooled_cg)
        rcnn_cls = rh.cls_layers(h).transpose(1, 2).contiguous().squeeze(1)
        rcnn_reg = rh.reg_layers(h).transpose(1, 2).contiguous().squeeze(1)
        batch_cls, batch_boxes = rh.generate_predicted_boxes(
            B, torch.from_numpy(rois), rcnn_cls, rcnn_reg)
    sd = {
        "det_modules.roi_head." + k: v.numpy()
        for k, v in rh.state_dict().items()
        if k.startswith(("shared_fc_layer", "cls_layers", "reg_layers"))
    }
    arrays = {
        "pooled": pooled_gc, "rois": rois,
        "rcnn_cls": _np(rcnn_cls), "rcnn_reg": _np(rcnn_reg),
        "batch_cls_preds": _np(batch_cls), "batch_box_preds": _np(batch_boxes),
    }
    arrays.update({"sd::" + k: v for k, v in sd.items()})
    np.savez_compressed(ROI_FC_OUT, **arrays)
    print(f"wrote {ROI_FC_OUT} ({ROI_FC_OUT.stat().st_size/1024:.0f} KiB)")


def occ_head_fixtures(rng, model):
    """Occ dense head golden chain (VERDICT r3 next #10). The reference
    OccHead3D conv_cls/conv_res are SubMConv3d (occ_head_3D.py:25-31);
    spconv cannot execute on CPU, but submanifold conv on a dense
    zero-padded grid restricted to active sites IS a dense conv masked
    to active sites, so torch.conv3d on the stubbed (kz,ky,kx,ci,co)
    weights executes the identical math — pinning the t_dense3d layout
    contract and our dense masked formulation at every active site."""
    import torch.nn.functional as F

    oh = model.occ_modules.occ_dense_head
    w_cls = rng.randn(*oh.conv_cls[0].weight.shape).astype(np.float32) * 0.1
    b_cls = rng.randn(oh.conv_cls[0].weight.shape[-1]).astype(np.float32) * 0.05
    sd = {"occ_modules.occ_dense_head.conv_cls.0.weight": w_cls,
          "occ_modules.occ_dense_head.conv_cls.0.bias": b_cls}
    has_res = hasattr(oh, "conv_res")
    if has_res:
        w_res = rng.randn(*oh.conv_res[0].weight.shape).astype(np.float32) * 0.1
        sd["occ_modules.occ_dense_head.conv_res.0.weight"] = w_res
    ci = w_cls.shape[3]
    Z, Y, X = 4, 8, 10
    mask = (rng.uniform(0, 1, (1, Z, Y, X)) < 0.3).astype(np.float32)
    x = rng.randn(1, Z, Y, X, ci).astype(np.float32) * mask[..., None]

    def subm(w, b):
        # stub layout (kz,ky,kx,ci,co) -> torch conv3d (co,ci,kz,ky,kx)
        wt = torch.from_numpy(np.ascontiguousarray(w.transpose(4, 3, 0, 1, 2)))
        xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 4, 1, 2, 3)))
        out = F.conv3d(xt, wt, torch.from_numpy(b) if b is not None else None,
                       padding=1)
        return _np(out).transpose(0, 2, 3, 4, 1) * mask[..., None]

    arrays = {"x": x, "mask": mask, "out_cls": subm(w_cls, b_cls)}
    if has_res:
        arrays["out_res"] = subm(w_res, None)
    arrays.update({"sd::" + k: v for k, v in sd.items()})
    np.savez_compressed(OCC_HEAD_OUT, **arrays)
    print(f"wrote {OCC_HEAD_OUT} ({OCC_HEAD_OUT.stat().st_size/1024:.0f} KiB)")


def main():
    install_stubs()
    sys.path.insert(0, str(REPO / "tools"))
    sys.path.insert(0, str(REFERENCE))
    torch.manual_seed(0)
    rng = np.random.RandomState(42)
    with _CpuOnly():
        fx = {
            "box_coder": box_coder_fixtures(rng),
            "assigner": assigner_fixtures(rng),
            "losses": loss_fixtures(rng),
            "head_encodings": head_encoding_fixtures(rng),
            "coords": coords_fixtures(rng),
            "bev_iou": bev_iou_fixtures(rng),
            "occ_occlusion": occ_occlusion_fixtures(rng),
        }
        dense_chain_fixtures(rng)
        model = _build_reference_model()
        roi_fc_chain_fixtures(rng, model)
        occ_head_fixtures(rng, model)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(fx))
    print(f"wrote {OUT} ({OUT.stat().st_size/1024:.0f} KiB)")


if __name__ == "__main__":
    main()
