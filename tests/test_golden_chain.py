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

    x = jnp.asarray(fx["input"].transpose(0, 2, 3, 1))  # NCHW -> NHWC
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
