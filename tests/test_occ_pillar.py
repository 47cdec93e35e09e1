"""Pillar occ variants: OccTargetsPillar (2D BEV predict area, reference
`occ_training_targets/occ_targets_pillar.py:14`) and OccHead2D (full-z-column
prediction from 2D convs, reference `occ_dense_heads/occ_head_2D.py:23-31`).
The reference pillar path is bit-rotted (template/pillar signatures
disagree); these tests pin the working TPU-native equivalent.

Drives OccSubnet directly (not full BtcNet) to keep CPU runtime small.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from btcdet_tpu.config import CfgBox
from btcdet_tpu.datasets import make_synthetic_batch
from btcdet_tpu.datasets.mini_config import mini_data_cfg, mini_model_cfg
from btcdet_tpu.models.occ import occ_subnet, occ_targets as T

pytestmark = pytest.mark.slow  # model-scale XLA compiles; smoke suite skips


def make_subnet(model_cfg, data_cfg):
    det_vox = None
    for proc in data_cfg.DATA_PROCESSOR:
        if proc.NAME in ("det_transform_points_to_voxels", "transform_points_to_voxels"):
            det_vox = tuple(proc.VOXEL_SIZE)
    return occ_subnet.OccSubnet(
        model_cfg=CfgBox(model_cfg.OCC),
        data_cfg=data_cfg,
        point_cloud_range=tuple(data_cfg.POINT_CLOUD_RANGE),
        det_voxel_size=det_vox,
    )


def run_subnet(model_cfg, data_cfg, train=True):
    data_cfg = CfgBox(data_cfg)
    model_cfg = CfgBox(model_cfg)
    net = make_subnet(model_cfg, data_cfg)
    batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(
        data_cfg, batch_size=1, num_points=1024, num_gt=2).items()}
    rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = net.init(rngs, batch, train=train)
    out, _ = net.apply(
        variables, batch, train=train,
        rngs={"sampling": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        mutable=["batch_stats"],
    )
    return net, variables, batch, out


def base_cfgs():
    return mini_data_cfg(with_occ=True), mini_model_cfg(with_occ=True)


def test_occ_head_2d_train():
    data_cfg, model_cfg = base_cfgs()
    model_cfg["OCC"]["OCC_DENSE_HEAD"]["NAME"] = "OccHead2D"
    net, variables, batch, out = run_subnet(model_cfg, data_cfg)
    assert np.isfinite(float(out["loss"]))
    probs = np.asarray(out["probs"])
    assert probs.ndim == 4 and np.isfinite(probs).all()
    assert (probs >= 0).all() and (probs <= 1).all()
    # occupancy points still flow to the det bridge
    assert out["occ_points"].shape[-1] == 4


def test_occ_head_2d_prior_init_sparse():
    """pi=0.01 cls bias init must hold through the 2D head's channel
    unfolding: untrained occupied prob stays low everywhere."""
    data_cfg, model_cfg = base_cfgs()
    model_cfg["OCC"]["OCC_DENSE_HEAD"]["NAME"] = "OccHead2D"
    net, variables, batch, out = run_subnet(model_cfg, data_cfg, train=False)
    probs = np.asarray(out["probs"])
    assert float(probs.max()) < 0.3


def test_occ_targets_pillar_predict_area_is_column():
    data_cfg, model_cfg = base_cfgs()
    model_cfg["OCC"]["TARGETS"]["NAME"] = "OccTargetsPillar"
    net, variables, batch, out = run_subnet(model_cfg, data_cfg)
    assert np.isfinite(float(out["loss"]))
    vcc = np.asarray(out["vcc_mask"])  # (B, nz, ny, nx)
    assert vcc.any()
    # pillar predict area is z-uniform: each BEV column all-on or all-off
    col = vcc.any(axis=1)
    assert (vcc == col[:, None]).all()
    # and is a superset of the 3D predict area built from the same
    # observed mask
    spec = T.build_grid_spec(CfgBox(data_cfg))
    vcc3 = np.asarray(T.dilate_predict_area(
        jnp.asarray(out["voxelwise_mask"]), spec.dist_kern, spec.concede_x))
    assert (vcc | ~vcc3).all()


def test_unknown_names_rejected():
    data_cfg, model_cfg = base_cfgs()
    model_cfg["OCC"]["TARGETS"]["NAME"] = "NoSuchTargets"
    with pytest.raises(KeyError):
        run_subnet(model_cfg, data_cfg)
    data_cfg, model_cfg = base_cfgs()
    model_cfg["OCC"]["OCC_DENSE_HEAD"]["NAME"] = "NoSuchHead"
    with pytest.raises(KeyError):
        run_subnet(model_cfg, data_cfg)
