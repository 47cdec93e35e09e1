"""End-to-end model tests on a scaled-down config (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from btcdet_tpu.config import EasyDict
from btcdet_tpu.datasets import make_synthetic_batch
from btcdet_tpu.models import build_network
from btcdet_tpu.models.detectors.btcnet import post_processing
from btcdet_tpu.datasets.mini_config import mini_data_cfg, mini_model_cfg

pytestmark = pytest.mark.slow  # model-scale XLA compiles; smoke suite skips


def to_jnp(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.fixture(scope="module")
def det_setup():
    data_cfg = mini_data_cfg(with_occ=False)
    model_cfg = mini_model_cfg(with_occ=False)
    net = build_network(model_cfg, data_cfg, ["Car"])
    batch = to_jnp(make_synthetic_batch(data_cfg, batch_size=2, num_points=4096, num_gt=4))
    rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = net.init(rngs, batch, train=True)
    return net, batch, variables, model_cfg


def test_det_train_forward(det_setup):
    net, batch, variables, _ = det_setup
    out, _ = net.apply(
        variables, batch, train=True,
        rngs={"sampling": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        mutable=["batch_stats"],
    )
    loss = float(out["loss"])
    assert np.isfinite(loss) and loss > 0
    for k in ("rpn_loss", "rcnn_loss"):
        assert k in out["loss_dict"], out["loss_dict"].keys()
        assert np.isfinite(float(out["loss_dict"][k]))


def test_det_grads_flow(det_setup):
    net, batch, variables, _ = det_setup
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        out, _ = net.apply(
            {"params": p, **other}, batch, train=True,
            rngs={"sampling": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
            mutable=["batch_stats"],
        )
        return out["loss"]

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(grads)
    gnorms = [float(jnp.abs(g).max()) for g in flat]
    assert all(np.isfinite(g) for g in gnorms)
    assert sum(g > 0 for g in gnorms) > len(gnorms) * 0.5, "most params should get grads"


def test_det_eval_and_postprocess(det_setup):
    net, batch, variables, model_cfg = det_setup
    out = net.apply(variables, batch, train=False)
    assert "batch_box_preds" in out
    post = post_processing(out, model_cfg.POST_PROCESSING, 1)
    assert post["pred_boxes"].shape[0] == 2
    assert np.isfinite(np.asarray(post["pred_scores"])).all()


def test_occ_full_model():
    data_cfg = mini_data_cfg(with_occ=True)
    model_cfg = mini_model_cfg(with_occ=True)
    net = build_network(model_cfg, data_cfg, ["Car"])
    batch = to_jnp(make_synthetic_batch(data_cfg, batch_size=2, num_points=4096, num_gt=4))
    rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = net.init(rngs, batch, train=True)
    out, _ = net.apply(
        variables, batch, train=True,
        rngs={"sampling": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        mutable=["batch_stats"],
    )
    assert np.isfinite(float(out["loss"]))
    assert "occ_loss" in out["loss_dict"]
    assert np.isfinite(float(out["loss_dict"]["occ_loss"]))
    # eval path
    out_e = net.apply(variables, batch, train=False)
    assert np.isfinite(np.asarray(out_e["batch_box_preds"])).all()


def test_clamp_dropout_useocc_gate():
    """CLAMP intensity, occ voxel dropout, and the USEOCC_PERCENTAGE
    bernoulli gate (reference `btcnet.py:16-41`,
    `occ_targets_template.py:305-328`) all active at train."""
    data_cfg = mini_data_cfg(with_occ=True)
    data_cfg["CLAMP"] = "tanh"
    data_cfg["OCC"]["DROPOUT_RATE"] = 0.5
    data_cfg["OCC"]["USEOCC_PERCENTAGE"] = 0.0  # gate always off
    model_cfg = mini_model_cfg(with_occ=True)
    net = build_network(model_cfg, data_cfg, ["Car"])
    batch = to_jnp(make_synthetic_batch(data_cfg, batch_size=2, num_points=4096, num_gt=4))
    batch.pop("use_occ_prob", None)  # let the model draw the gate
    rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = net.init(rngs, batch, train=True)
    out, _ = net.apply(
        variables, batch, train=True,
        rngs={"sampling": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        mutable=["batch_stats"],
    )
    assert np.isfinite(float(out["loss"]))
    # percentage 0.0 -> every frame's gate is False -> no occ points pass
    assert not bool(np.asarray(out["occ_points_mask"]).any())
    # dropout active: loss stays finite across rng draws
    out2, _ = net.apply(
        variables, batch, train=True,
        rngs={"sampling": jax.random.PRNGKey(5), "dropout": jax.random.PRNGKey(6)},
        mutable=["batch_stats"],
    )
    assert np.isfinite(float(out2["loss"]))


def test_fused_vfe_matches_materialized_model():
    """The fused merge+VFE path (OCC_PNT_UPDATE.FUSED_VFE, default on)
    must reproduce the materialized merge -> OccVFE model outputs: same
    boxes to f32 reassociation tolerance (ops/voxelizer.py
    merge_points_into_voxel_features)."""
    data_cfg = mini_data_cfg(with_occ=True)
    batch = None
    outs = {}
    for fused in (True, False):
        model_cfg = mini_model_cfg(with_occ=True)
        model_cfg["OCC"]["OCC_PNT_UPDATE"]["FUSED_VFE"] = fused
        net = build_network(model_cfg, data_cfg, ["Car"])
        if batch is None:
            batch = to_jnp(make_synthetic_batch(
                data_cfg, batch_size=2, num_points=4096, num_gt=4))
        rngs = {"params": jax.random.PRNGKey(0),
                "sampling": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2)}
        variables = net.init(rngs, batch, train=False)
        outs[fused] = net.apply(variables, batch, train=False)
    a, b = outs[True], outs[False]
    np.testing.assert_allclose(
        np.asarray(a["rpn_box_preds"]), np.asarray(b["rpn_box_preds"]),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(a["batch_box_preds"]), np.asarray(b["batch_box_preds"]),
        rtol=2e-3, atol=2e-3)


def test_tiered_backbone_matches_full_width(monkeypatch):
    """Eval forward with the tiered det-backbone input (btcnet
    `_tiered_backbone`: nn.cond prefix widths cap/4, cap/2, full) must
    equal the untiered forward bitwise — the prefix slice only drops
    all-padding rows of the key-sorted merged table."""
    from btcdet_tpu.models.detectors import btcnet as btcnet_mod

    data_cfg = mini_data_cfg(with_occ=True)
    model_cfg = mini_model_cfg(with_occ=True)
    net = build_network(model_cfg, data_cfg, ["Car"])
    batch = to_jnp(make_synthetic_batch(data_cfg, batch_size=2, num_points=4096, num_gt=4))
    rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = net.init(rngs, batch, train=False)

    out_full = net.apply(variables, batch, train=False)
    monkeypatch.setattr(btcnet_mod, "TIER_MIN_CAPACITY", 1)
    out_tier = net.apply(variables, batch, train=False)
    for k in ("encoded_features", "batch_box_preds", "rpn_cls_preds"):
        np.testing.assert_array_equal(
            np.asarray(out_full[k]), np.asarray(out_tier[k]), err_msg=k)


def test_level_tiered_backbone_matches_full_width(monkeypatch):
    """Eval forward with the PER-LEVEL width tier (backbones_3d
    `_width_tiered`: L2/L3 subm tails run on the smallest static prefix
    covering nnz, padded back to cap) must equal the untiered forward
    bitwise (VERDICT r4 next #6)."""
    from btcdet_tpu.models import backbones_3d as bb3d

    data_cfg = mini_data_cfg(with_occ=True)
    model_cfg = mini_model_cfg(with_occ=True)
    net = build_network(model_cfg, data_cfg, ["Car"])
    batch = to_jnp(make_synthetic_batch(data_cfg, batch_size=2, num_points=4096, num_gt=4))
    rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = net.init(rngs, batch, train=False)

    monkeypatch.setattr(bb3d, "LEVEL_TIER_MIN_CAPACITY", 10**9)
    out_full = net.apply(variables, batch, train=False)
    monkeypatch.setattr(bb3d, "LEVEL_TIER_MIN_CAPACITY", 1)
    out_tier = net.apply(variables, batch, train=False)
    for k in ("encoded_features", "batch_box_preds", "rpn_cls_preds"):
        np.testing.assert_array_equal(
            np.asarray(out_full[k]), np.asarray(out_tier[k]), err_msg=k)


def test_occ_point_tiered_chain_matches_full_width(monkeypatch):
    """Eval forward with the occ POINT-side width tier (occ_subnet
    `point_chain` under lax.cond: targets + occlusion scatter + VFE run
    on a per-frame voxel-table prefix covering nnz) must equal the
    untiered forward bitwise — every chain output is a dense grid and
    padding rows no-op in every scatter (round 5, occ byte diet)."""
    from btcdet_tpu.models.occ import occ_subnet as occ_mod

    data_cfg = mini_data_cfg(with_occ=True)
    model_cfg = mini_model_cfg(with_occ=True)
    net = build_network(model_cfg, data_cfg, ["Car"])
    batch = to_jnp(make_synthetic_batch(data_cfg, batch_size=2, num_points=4096, num_gt=4))
    rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = net.init(rngs, batch, train=False)

    monkeypatch.setattr(occ_mod, "OCC_POINT_TIER_MIN_CAPACITY", 10**9)
    out_full = net.apply(variables, batch, train=False)
    monkeypatch.setattr(occ_mod, "OCC_POINT_TIER_MIN_CAPACITY", 1)
    out_tier = net.apply(variables, batch, train=False)
    for k in ("encoded_features", "batch_box_preds", "rpn_cls_preds",
              "occ_points", "occ_points_mask"):
        np.testing.assert_array_equal(
            np.asarray(out_full[k]), np.asarray(out_tier[k]), err_msg=k)
