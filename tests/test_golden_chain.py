"""Chained golden test against the EXECUTED reference (VERDICT r2 next
#8): BEV backbone -> anchor head -> decoded proposals, with the torch
weights imported through ref_import.map_reference_state -- validating
the weight-mapping transposes and the chained dense-path math together.
Fixture: tests/fixtures/golden_chain.npz (tools/gen_golden_fixtures.py
dense_chain_fixtures; reference base_bev_backbone.py:6-112,
anchor_head_single.py:7-82, anchor_head_template.py:227)."""

from pathlib import Path

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

FIXTURE = Path(__file__).parent / "fixtures" / "golden_chain.npz"


class _DenseChain(nn.Module):
    """BEV pyramid + anchor head under the flax names the importer maps
    reference keys onto (det_backbone_2d / det_dense_head)."""

    anchors: np.ndarray
    anchor_class: np.ndarray
    per_loc: int

    @nn.compact
    def __call__(self, x):
        from btcdet_tpu.models import backbones_2d
        from btcdet_tpu.models.dense_heads import anchor_head

        feat = backbones_2d.BaseBEVBackbone(
            layer_nums=(5, 5), layer_strides=(1, 2), num_filters=(128, 128),
            upsample_strides=(1, 2), num_upsample_filters=(128, 128),
            compute_dtype=None,  # golden comparison in f32
            name="det_backbone_2d",
        )(x, train=False)
        out = anchor_head.AnchorHeadSingle(
            num_class=1, anchors=self.anchors, anchor_class=self.anchor_class,
            num_anchors_per_location=self.per_loc,
            name="det_dense_head",
        )(feat, train=False)
        out["spatial_features_2d"] = feat
        return out


def test_dense_chain_matches_reference():
    from btcdet_tpu.config import cfg_from_yaml_file
    from btcdet_tpu.models.dense_heads import anchor_head
    from btcdet_tpu.train import ref_import

    fx = np.load(FIXTURE)
    grid = fx["grid_size"]
    pc_range = fx["pc_range"]
    anchor_cfg = [dict(
        class_name="Car", anchor_sizes=[[3.9, 1.6, 1.56]],
        anchor_rotations=[0, 1.57], anchor_bottom_heights=[-1.78],
        align_center=False, feature_map_stride=8,
        matched_threshold=0.6, unmatched_threshold=0.45,
    )]
    anchors, anchor_class, per_loc = anchor_head.generate_anchors(
        pc_range, grid, anchor_cfg)
    net = _DenseChain(anchors=anchors, anchor_class=anchor_class, per_loc=per_loc)

    # NCHW -> NHWC, then reorder the BEV channel interleave to OUR
    # height-compression layout: reference .view(B, C*D, H, W) is C-major
    # (c*D+d), our HC folds z-major (d*C+c) — ref_import now permutes the
    # first conv's input axis to match (map_reference_state b0/k0 rule),
    # so the golden input must arrive in our layout too
    xin = fx["input"]
    B0, CD, H0, W0 = xin.shape
    C0 = 128
    D0 = CD // C0
    xin = xin.reshape(B0, C0, D0, H0, W0).transpose(0, 2, 1, 3, 4).reshape(
        B0, CD, H0, W0)
    x = jnp.asarray(xin.transpose(0, 2, 3, 1))  # NCHW -> NHWC
    variables = net.init(jax.random.PRNGKey(0), x)

    sd = {k[4:]: fx[k] for k in fx.files if k.startswith("sd::")}
    new_vars, report = ref_import.map_reference_state(
        sd, {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})},
        n_per_block=(5, 5))
    assert report["unmapped_ref"] == [], report["unmapped_ref"][:10]
    assert report["shape_mismatch"] == [], report["shape_mismatch"][:10]
    assert report["uncovered_flax"] == [], report["uncovered_flax"][:10]

    out = net.apply(
        {"params": new_vars["params"],
         "batch_stats": new_vars.get("batch_stats", {})}, x)

    got_feat = np.asarray(out["spatial_features_2d"], np.float32)
    ref_feat = fx["spatial_features_2d"].transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got_feat, ref_feat, rtol=2e-3, atol=2e-4)

    # reference batch_cls_preds: (B, A, C); batch_box_preds: (B, A, 7)
    np.testing.assert_allclose(
        np.asarray(out["cls_preds"], np.float32), fx["batch_cls_preds"],
        rtol=2e-3, atol=2e-4)
    got_boxes = np.asarray(out["batch_box_preds"], np.float32)
    ref_boxes = fx["batch_box_preds"]
    # heading: compare modulo 2pi
    np.testing.assert_allclose(got_boxes[..., :6], ref_boxes[..., :6],
                               rtol=2e-3, atol=2e-4)
    dh = np.abs(got_boxes[..., 6] - ref_boxes[..., 6]) % (2 * np.pi)
    dh = np.minimum(dh, 2 * np.pi - dh)
    assert dh.max() < 1e-3, dh.max()


ROI_FC_FIXTURE = Path(__file__).parent / "fixtures" / "golden_roi_fc.npz"
OCC_HEAD_FIXTURE = Path(__file__).parent / "fixtures" / "golden_occ_head.npz"


class _RoiFCTail(nn.Module):
    """EXACTLY the rcnn FC tail of ConvHead (same layer names, same
    grid-major flatten, same BN settings — conv_head.py:197-227); the
    test asserts the name set against a real ConvHead init so drift in
    the model is caught. Runs in f32 (the model's bf16 compute_dtype is
    a measured parity risk, docs/PARITY_RISKS.md, not golden-matched)."""

    num_class: int = 1
    code_size: int = 7

    @nn.compact
    def __call__(self, pooled):  # (BN, G, C) grid-major
        from btcdet_tpu.models.roi_heads.conv_head import _BN1d

        BN = pooled.shape[0]
        h = pooled.reshape(BN, -1)
        mask = jnp.ones((BN,), bool)
        for i, c in enumerate((256, 128)):
            h = nn.Dense(c, use_bias=False, name=f"shared_fc_{i}")(h)
            h = _BN1d(momentum=0.1, epsilon=1e-5,
                      name=f"shared_bn_{i}")(h, mask, False)
            h = nn.relu(h)

        def head(x, fcs, out_dim, nm):
            for i, c in enumerate(fcs):
                x = nn.Dense(c, use_bias=False, name=f"{nm}_{i}")(x)
                x = _BN1d(momentum=0.1, epsilon=1e-5,
                          name=f"{nm}_bn_{i}")(x, mask, False)
                x = nn.relu(x)
            return nn.Dense(out_dim, name=f"{nm}_out")(x)

        return (head(h, (128, 64), self.num_class, "cls"),
                head(h, (128, 64), self.code_size * self.num_class, "reg"))


class _RoiFCOuter(nn.Module):
    @nn.compact
    def __call__(self, pooled):
        return _RoiFCTail(name="det_roi_head")(pooled)


def test_roi_fc_chain_matches_reference():
    """Executed-reference golden chain for the ConvHead rcnn tail
    (VERDICT r3 next #10): pins the t_fc_pooled C-major/grid-major
    interleave, the FC/BN(eps 1e-5) math, and the roi decode."""
    from btcdet_tpu.models.roi_heads.conv_head import ConvHead
    from btcdet_tpu.train import ref_import

    fx = np.load(ROI_FC_FIXTURE)
    pooled = jnp.asarray(fx["pooled"])  # (BN, G, C) our layout
    net = _RoiFCOuter()
    variables = net.init(jax.random.PRNGKey(0), pooled)

    sd = {k[4:]: fx[k] for k in fx.files if k.startswith("sd::")}
    new_vars, report = ref_import.map_reference_state(
        sd, {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})})
    assert report["unmapped_ref"] == [], report["unmapped_ref"][:10]
    assert report["shape_mismatch"] == [], report["shape_mismatch"][:10]
    assert report["uncovered_flax"] == [], report["uncovered_flax"][:10]

    rcnn_cls, rcnn_reg = net.apply(new_vars, pooled)
    np.testing.assert_allclose(
        np.asarray(rcnn_cls, np.float32), fx["rcnn_cls"], rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(rcnn_reg, np.float32), fx["rcnn_reg"], rtol=2e-3, atol=2e-4)

    # decode through the model's method (config-only, no flax state)
    B, N = 2, 6
    head = ConvHead(num_class=1)
    cls_preds, boxes = head.generate_predicted_boxes(
        jnp.asarray(fx["rois"]), jnp.asarray(fx["rcnn_cls"]),
        jnp.asarray(fx["rcnn_reg"]))
    np.testing.assert_allclose(
        np.asarray(cls_preds, np.float32).reshape(B, N, -1),
        fx["batch_cls_preds"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(boxes, np.float32), fx["batch_box_preds"],
        rtol=1e-4, atol=1e-4)

    # guard against drift: every tail layer name used above must exist
    # in the real ConvHead's param tree (tiny raw-points-only init)
    real = ConvHead(num_class=1, features_source=("raw_points",))
    rois0 = jnp.asarray(fx["rois"][:1, :2])
    rv = jnp.ones((1, 2), bool)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 3)) * 10
    pv = net.init  # silence lint
    real_vars = real.init(
        {"params": jax.random.PRNGKey(2)}, rois0, rv,
        points_xyz=pts, points_feat=jnp.ones((1, 64, 1)),
        points_mask=jnp.ones((1, 64), bool), train=False)
    real_names = set(real_vars["params"].keys())
    tail_names = set(variables["params"]["det_roi_head"].keys())
    missing = tail_names - real_names
    assert not missing, f"tail layer names drifted from ConvHead: {missing}"


class _OccHeadConv(nn.Module):
    """conv_cls / conv_res exactly as occ_subnet declares them (3x3x3
    dense convs over the NHWC-dense occ feature, names matching
    ref_import's ("occ_subnet", conv_*) targets)."""

    co_cls: int
    co_res: int

    @nn.compact
    def __call__(self, x):
        cls = nn.Conv(self.co_cls, (3, 3, 3), padding=1, name="conv_cls")(x)
        res = (nn.Conv(self.co_res, (3, 3, 3), padding=1, use_bias=False,
                       name="conv_res")(x) if self.co_res else None)
        return cls, res


class _OccHeadOuter(nn.Module):
    co_cls: int
    co_res: int

    @nn.compact
    def __call__(self, x):
        return _OccHeadConv(self.co_cls, self.co_res, name="occ_subnet")(x)


def test_occ_head_matches_reference():
    """Occ dense-head golden chain (VERDICT r3 next #10): the reference
    SubMConv3d (occ_head_3D.py:25-31) executed as dense torch conv3d
    masked to active sites — pins t_dense3d's (kz,ky,kx,ci,co) layout
    contract and our dense formulation at every active site."""
    from btcdet_tpu.train import ref_import

    fx = np.load(OCC_HEAD_FIXTURE)
    x = jnp.asarray(fx["x"])
    mask = fx["mask"][..., None]
    co_cls = fx["out_cls"].shape[-1]
    co_res = fx["out_res"].shape[-1] if "out_res" in fx.files else 0
    net = _OccHeadOuter(co_cls, co_res)
    variables = net.init(jax.random.PRNGKey(0), x)

    sd = {k[4:]: fx[k] for k in fx.files if k.startswith("sd::")}
    new_vars, report = ref_import.map_reference_state(
        sd, {"params": variables["params"], "batch_stats": {}})
    assert report["unmapped_ref"] == [], report["unmapped_ref"]
    assert report["shape_mismatch"] == [], report["shape_mismatch"]
    assert report["uncovered_flax"] == [], report["uncovered_flax"]

    cls, res = net.apply({"params": new_vars["params"]}, x)
    np.testing.assert_allclose(
        np.asarray(cls, np.float32) * mask, fx["out_cls"],
        rtol=1e-4, atol=1e-5)
    if co_res:
        np.testing.assert_allclose(
            np.asarray(res, np.float32) * mask, fx["out_res"],
            rtol=1e-4, atol=1e-5)
