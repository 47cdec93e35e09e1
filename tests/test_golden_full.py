"""FULL-FORWARD imported-weights golden chain vs the EXECUTED reference
(VERDICT r4 next #1).

tools/gen_golden_full.py ran the reference BtcNet eval forward on CPU
(dense-emulated spconv, exact ball query, polygon-clip NMS) at the
golden-mini geometry with deterministic synthetic weights, capturing
per-stage outputs into tests/fixtures/golden_full.npz. Here the SAME
weights (regenerated from the committed manifest via golden_synth) are
imported through `ref_import.map_reference_state` into OUR full model,
the SAME batch is run through OUR forward, and every stage is compared:
occ probability grid, merged det voxel set, BEV features, RPN preds,
proposal rois, and rcnn outputs. This is the deepest real-data-parity
proxy available without KITTI data or a reference checkpoint: it pins
the import mapping AND the chained numerics of every weight tensor the
manifest maps.
"""

import os
from pathlib import Path

import numpy as np
import pytest

FIXTURE = Path(__file__).parent / "fixtures" / "golden_full.npz"
MANIFEST = Path(__file__).parent / "fixtures" / "reference_state_dict_manifest.json"

pytestmark = pytest.mark.slow  # full-model CPU compile, ~minutes


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    # f32 end-to-end: golden comparison, not a perf run
    os.environ["BTCDET_F32"] = "1"
    import json

    import jax
    import jax.numpy as jnp

    from btcdet_tpu.config import cfg_from_yaml_file
    from btcdet_tpu.models import build_network
    from btcdet_tpu.train import ref_import
    from btcdet_tpu.train.golden_synth import apply_golden_mini, synth_state_dict

    fx = np.load(FIXTURE)
    batch = {k[4:]: fx[k] for k in fx.files if k.startswith("in::")}
    ref = {k[5:]: fx[k] for k in fx.files if k.startswith("ref::")}

    repo = Path(__file__).parent.parent
    cfg = cfg_from_yaml_file(repo / "tools/cfgs/model_configs/btcdet_kitti_car.yaml")
    apply_golden_mini(cfg, is_reference=False)
    cfg.MODEL.ROI_HEAD.COMPUTE_DTYPE = "f32"
    cfg.MODEL.ROI_HEAD.APPROX_QUERY = False  # exact = reference CUDA semantics

    net = build_network(cfg.MODEL, cfg.DATA_CONFIG, ["Car"])
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = jax.jit(lambda r, b: net.init(r, b, train=False))(rngs, jb)

    manifest = json.load(open(MANIFEST))
    sd = synth_state_dict(manifest)
    new_vars, report = ref_import.map_reference_state(
        sd, {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})})
    assert report["unmapped_ref"] == [], report["unmapped_ref"][:10]
    assert report["shape_mismatch"] == [], report["shape_mismatch"][:10]
    assert report["uncovered_flax"] == [], report["uncovered_flax"][:10]

    vv = {"params": new_vars["params"],
          "batch_stats": new_vars.get("batch_stats", {})}
    out, inter = net.apply(
        vv, jb, train=False,
        capture_intermediates=lambda mdl, name: name == "__call__",
        mutable=["intermediates"],
    )
    return fx, batch, ref, out, inter, net, vv, jb


def _occ_inter(inter):
    """occ_subnet __call__ output dict from the captured intermediates."""
    node = inter["intermediates"]["occ_subnet"]["__call__"][0]
    return node


def test_manifest_covers_fixture_weights(golden):
    # every ref:: array exists and is finite — fixture sanity
    fx, batch, ref, out, inter, net, vv, jb = golden
    for k, v in ref.items():
        assert np.isfinite(v).all(), k


def test_occ_prob_grid_matches(golden):
    fx, batch, ref, out, inter, net, vv, jb = golden
    ours = np.asarray(out["occ_probs"], np.float32)  # (B, nz, ny, nx)
    want = ref["occ_prob"]
    assert ours.shape == want.shape, (ours.shape, want.shape)
    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-3)


def test_merged_det_voxel_set_matches(golden):
    """PassOccVox: the merged det voxel table must agree as a SET of
    (b,z,y,x) coords (padding layouts differ by design)."""
    fx, batch, ref, out, inter, net, vv, jb = golden
    occ_out = _occ_inter(inter)
    coords = np.asarray(occ_out["det_voxel_coords"])
    valid = coords[:, 0] >= 0
    ours = set(map(tuple, coords[valid].tolist()))
    want = set(map(tuple, ref["merged_voxel_coords"].astype(np.int64).tolist()))
    missing = want - ours
    extra = ours - want
    assert not missing and not extra, (
        f"merged voxel set differs: missing {len(missing)} extra {len(extra)}; "
        f"examples missing={list(missing)[:5]} extra={list(extra)[:5]}")


def test_bev_features_match(golden):
    fx, batch, ref, out, inter, net, vv, jb = golden
    ours = np.asarray(out["spatial_features"], np.float32)  # (B, H, W, D*C) z-major
    rf = ref["spatial_features"]                            # (B, C*D, H, W) c-major
    B, CD, H, W = rf.shape
    C = 128
    D = CD // C
    want = rf.reshape(B, C, D, H, W).transpose(0, 3, 4, 2, 1).reshape(B, H, W, D * C)
    assert ours.shape == want.shape, (ours.shape, want.shape)
    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-3)


def test_bev_pyramid_matches(golden):
    fx, batch, ref, out, inter, net, vv, jb = golden
    ours = np.asarray(out["spatial_features_2d"], np.float32)  # NHWC
    want = ref["spatial_features_2d"].transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, want, rtol=5e-3, atol=5e-3)


def test_rpn_preds_match(golden):
    fx, batch, ref, out, inter, net, vv, jb = golden
    np.testing.assert_allclose(
        np.asarray(out["rpn_cls_preds"], np.float32), ref["rpn_cls_preds"],
        rtol=5e-3, atol=5e-3)
    got = np.asarray(out["rpn_box_preds"], np.float32)
    want = ref["rpn_box_preds"]
    np.testing.assert_allclose(got[..., :6], want[..., :6], rtol=5e-3, atol=5e-3)
    dh = np.abs(got[..., 6] - want[..., 6]) % (2 * np.pi)
    assert np.minimum(dh, 2 * np.pi - dh).max() < 5e-3


def test_proposals_match(golden):
    fx, batch, ref, out, inter, net, vv, jb = golden
    ours = np.asarray(out["rois"], np.float32)
    valid = np.asarray(out["roi_valid"])
    want = ref["rois"]
    scores_ref = ref["roi_scores"]
    for b in range(want.shape[0]):
        n_ref = int((np.abs(want[b]).sum(-1) > 0).sum())
        n_our = int(valid[b].sum())
        assert n_our == n_ref, (b, n_our, n_ref)
        np.testing.assert_allclose(
            ours[b, :n_our, :6], want[b, :n_ref, :6], rtol=5e-3, atol=5e-3)


def test_roi_branch_features_match(golden):
    """Per-branch ConvHead pooled features vs the executed reference:
    SA raw and x_combine are EXACT-row matches; the SA occ branch allows
    a small fraction of rows to differ — the occ-point list is selected
    by a top-512 prob cutoff and ~2e-3 prob tolerance near the cutoff
    swaps membership/order of a handful of points, which flips
    first-K-in-order neighbor sets for over-full balls (measured 56/1728
    rows at this fixture)."""
    import jax

    fx, batch, ref, out, inter, net, vv, jb = golden
    out2, inter2 = net.apply(
        vv, jb, train=False,
        capture_intermediates=lambda mdl, name: True,
        mutable=["intermediates"])
    rh = inter2["intermediates"]["det_roi_head"]

    o = np.asarray(rh["sa_rawpoints"][0], np.float32).reshape(-1, 64)
    rowmax = np.abs(o - ref["roi_sa_raw"]).max(1)
    assert (rowmax > 1e-3).sum() == 0, (rowmax > 1e-3).sum()

    o = np.asarray(rh["xc_pool"][0], np.float32).reshape(-1, 128)
    rowmax = np.abs(o - ref["roi_xc_x_combine"].reshape(o.shape)).max(1)
    assert (rowmax > 1e-3).sum() == 0, (rowmax > 1e-3).sum()

    o = np.asarray(rh["sa_occpoints"][0], np.float32).reshape(-1, 48)
    rowmax = np.abs(o - ref["roi_sa_occ"]).max(1)
    frac = float((rowmax > 1e-3).mean())
    assert frac < 0.08, f"sa_occ rows differing: {frac:.3f}"


def test_rcnn_outputs_with_injected_occ_points_match(golden):
    """EXACT rcnn tail: feed our ConvHead the REFERENCE's occ point list
    (same points, same order — removes the top-512-cutoff chaining noise
    isolated above) and the reference rois; every ConvHead weight is then
    exercised under bit-matched inputs."""
    import jax
    import jax.numpy as jnp

    fx, batch, ref, out, inter, net, vv, jb = golden
    occ_out = inter["intermediates"]["occ_subnet"]["__call__"][0]
    # x_combine from the chained forward (already golden-matched)
    out2, inter2 = net.apply(
        vv, jb, train=False,
        capture_intermediates=lambda mdl, name: True,
        mutable=["intermediates"])
    bb = inter2["intermediates"]["det_backbone_3d"]["__call__"][0]

    B = 2
    rb = ref["added_occ_b"].astype(np.int64)
    K = max((rb == b).sum() for b in range(B))
    occ_pts = np.zeros((B, K, 4), np.float32)
    occ_m = np.zeros((B, K), bool)
    for b in range(B):
        p = ref["occ_pnts"][rb == b]
        occ_pts[b, :len(p)] = p
        occ_m[b, :len(p)] = True

    rois = jnp.asarray(ref["rois"])
    rvalid = jnp.ones(rois.shape[:2], bool)

    def m_roi(m, *a, **k):
        return m.roi_head(*a, **k)

    rcnn_cls, rcnn_reg = net.apply(
        vv, rois, rvalid, method=m_roi,
        points_xyz=jb["points"][..., :3], points_feat=jb["points"][..., 3:],
        points_mask=jb["points_mask"],
        occ_xyz=jnp.asarray(occ_pts[..., :3]),
        occ_feat=jnp.asarray(occ_pts[..., 3:4]),
        occ_mask=jnp.asarray(occ_m),
        x_combine=bb["x_combine"], train=False,
        rngs={"dropout": jax.random.PRNGKey(3)})
    import btcdet_tpu.models.roi_heads.conv_head as _ch  # noqa
    head = net.roi_head if hasattr(net, "roi_head") else None
    cls_preds = np.asarray(rcnn_cls, np.float32).reshape(B, -1, 1)
    np.testing.assert_allclose(cls_preds, ref["rcnn_cls"], rtol=2e-3, atol=2e-3)


def test_rcnn_outputs_match(golden):
    """Fully-chained rcnn outputs: quantile-bounded — the sa_occ cutoff
    noise (isolated above) perturbs a few rois' pooled features, so a
    small tail is allowed while the bulk must match tightly."""
    fx, batch, ref, out, inter, net, vv, jb = golden
    valid = np.asarray(out["roi_valid"])
    got_cls = np.asarray(out["batch_cls_preds"], np.float32)
    got_box = np.asarray(out["batch_box_preds"], np.float32)
    dc = np.abs(got_cls - ref["rcnn_cls"])[valid]
    db = np.abs(got_box[..., :6] - ref["rcnn_box_preds"][..., :6])[valid]
    assert np.quantile(dc, 0.9) < 1e-2, np.quantile(dc, 0.9)
    assert dc.max() < 0.2, dc.max()
    assert np.quantile(db, 0.9) < 2e-2, np.quantile(db, 0.9)
    assert db.max() < 1.0, db.max()
