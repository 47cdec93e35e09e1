"""Degenerate-input robustness: empty scenes and capacity overflow.

The static-shape design means padding rows flow through every stage;
these tests pin that an all-padding frame and an over-capacity frame
both produce finite outputs (no 0/0 from empty masks, no OOB from
capped voxel sets). Mirrors the reference's implicit guarantees (its
dynamic shapes simply shrink; ours must mask correctly)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from btcdet_tpu.datasets import make_synthetic_batch
from btcdet_tpu.datasets.mini_config import mini_data_cfg, mini_model_cfg
from btcdet_tpu.models import build_network
from btcdet_tpu.models.detectors.btcnet import post_processing

pytestmark = pytest.mark.slow  # model-scale XLA compiles; smoke suite skips


def to_jnp(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.fixture(scope="module")
def occ_setup():
    data_cfg = mini_data_cfg(with_occ=True)
    model_cfg = mini_model_cfg(with_occ=True)
    net = build_network(model_cfg, data_cfg, ["Car"])
    batch = to_jnp(make_synthetic_batch(data_cfg, batch_size=1, num_points=4096, num_gt=4))
    rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = net.init(rngs, batch, train=True)
    return net, batch, variables, model_cfg


def empty_like(batch):
    """All-padding frame: no points, no voxels, no gt."""
    out = dict(batch)
    out["points"] = jnp.zeros_like(batch["points"])
    out["points_mask"] = jnp.zeros_like(batch["points_mask"])
    out["gt_boxes"] = jnp.zeros_like(batch["gt_boxes"])
    if "bm_points_mask" in batch:
        out["bm_points"] = jnp.zeros_like(batch["bm_points"])
        out["bm_points_mask"] = jnp.zeros_like(batch["bm_points_mask"])
    for prefix in ("det_", "occ_"):
        vc = f"{prefix}voxel_coords"
        if vc in batch:
            out[vc] = jnp.full_like(batch[vc], -1)
            out[f"{prefix}voxels"] = jnp.zeros_like(batch[f"{prefix}voxels"])
            out[f"{prefix}voxel_num_points"] = jnp.zeros_like(
                batch[f"{prefix}voxel_num_points"])
    for k in ("voxels", "voxel_coords", "voxel_num_points"):
        if k in batch:
            out[k] = (jnp.full_like(batch[k], -1) if k == "voxel_coords"
                      else jnp.zeros_like(batch[k]))
    return out


def assert_finite_tree(d, path=""):
    for k, v in d.items():
        if isinstance(v, dict):
            assert_finite_tree(v, path + k + ".")
        elif hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating):
            assert np.isfinite(np.asarray(v, np.float32)).all(), path + k


def test_empty_scene_eval(occ_setup):
    net, batch, variables, model_cfg = occ_setup
    out = net.apply(variables, empty_like(batch), train=False)
    assert_finite_tree({k: v for k, v in out.items() if v is not None})
    post = post_processing(out, model_cfg.POST_PROCESSING, 1)
    assert np.isfinite(np.asarray(post["pred_scores"])).all()
    assert np.isfinite(np.asarray(post["pred_boxes"])).all()


def test_empty_scene_train_loss_finite(occ_setup):
    net, batch, variables, _ = occ_setup
    out, _ = net.apply(
        variables, empty_like(batch), train=True,
        rngs={"sampling": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        mutable=["batch_stats"],
    )
    assert np.isfinite(float(out["loss"]))


def test_capacity_overflow_eval(occ_setup):
    """4x more points than the caps: the voxelizer drops by key order
    and the model must stay finite."""
    net, _, variables, model_cfg = occ_setup
    data_cfg = mini_data_cfg(with_occ=True)
    big = to_jnp(make_synthetic_batch(
        data_cfg, batch_size=1, num_points=16384, num_gt=4))
    out = net.apply(variables, big, train=False)
    post = post_processing(out, model_cfg.POST_PROCESSING, 1)
    assert np.isfinite(np.asarray(post["pred_scores"])).all()
    assert np.isfinite(np.asarray(post["pred_boxes"])).all()
