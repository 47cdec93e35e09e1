"""Reference-checkpoint import (VERDICT r1 next #2).

Part 1 -- coverage: every tensor in the reference flagship state dict
(tests/fixtures/reference_state_dict_manifest.json, extracted from the
actual reference model by tools/extract_reference_manifest.py) must map
onto the flax tree with the correct transposed shape, and every flax
parameter must be covered.

Part 2 -- orientation: each kernel transform is numerically pinned
against torch CPU ops (torch is the reference's runtime), so a flipped
or transposed import would fail loudly here.
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from btcdet_tpu.train import ref_import

pytestmark = pytest.mark.slow  # builds the flagship tree (eval_shape only)

FIXTURE = Path(__file__).parent / "fixtures" / "reference_state_dict_manifest.json"


@pytest.fixture(scope="module")
def flagship_variables():
    from btcdet_tpu.config import cfg_from_yaml_file
    from btcdet_tpu.datasets import make_synthetic_batch
    from btcdet_tpu.models import build_network

    cfg = cfg_from_yaml_file("tools/cfgs/model_configs/btcdet_kitti_car.yaml")
    net = build_network(cfg.MODEL, cfg.DATA_CONFIG, cfg.CLASS_NAMES)
    batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(
        cfg.DATA_CONFIG, batch_size=1, num_points=2048, num_gt=3,
        mode="train").items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    # eval_shape: full tree structure without running the model
    tree = jax.eval_shape(lambda r, b: net.init(r, b, train=True), rngs, batch)
    # materialize zeros so transforms can write real arrays
    return jax.tree_util.tree_map(lambda s: np.zeros(s.shape, np.float32), tree)


def test_full_manifest_roundtrip(flagship_variables):
    manifest = json.load(open(FIXTURE))
    sd = {k: np.random.RandomState(abs(hash(k)) % 2**31).randn(
        *s).astype(np.float32) if s else np.zeros((), np.float32)
        for k, s in manifest.items()}
    variables = {"params": flagship_variables["params"],
                 "batch_stats": flagship_variables.get("batch_stats", {})}
    new_vars, report = ref_import.map_reference_state(sd, variables)
    assert report["unmapped_ref"] == [], report["unmapped_ref"][:20]
    assert report["shape_mismatch"] == [], report["shape_mismatch"][:20]
    assert report["uncovered_flax"] == [], report["uncovered_flax"][:20]
    # mapped everything except the documented drops
    n_dropped = len(report["dropped"])
    assert report["mapped"] + n_dropped == len(manifest)
    # spot-check one value actually landed (transposed)
    w_ref = sd["det_modules.dense_head.conv_cls.weight"]  # (2, 256, 1, 1)
    w_new = new_vars["params"]["det_dense_head"]["Conv_0"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(w_new), w_ref.transpose(2, 3, 1, 0), rtol=0, atol=0)


# ------------------------------------------------------ orientation goldens

def test_conv2d_orientation():
    import flax.linen as nn
    rng = np.random.RandomState(0)
    x = rng.randn(1, 8, 9, 3).astype(np.float32)
    w = rng.randn(5, 3, 3, 3).astype(np.float32)  # torch (co, ci, kh, kw)
    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
        padding=1).numpy().transpose(0, 2, 3, 1)
    out = nn.Conv(5, (3, 3), padding=1, use_bias=False).apply(
        {"params": {"kernel": jnp.asarray(ref_import.t_conv2d(w))}},
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_convT2d_orientation():
    import flax.linen as nn
    rng = np.random.RandomState(1)
    x = rng.randn(1, 5, 6, 3).astype(np.float32)
    w = rng.randn(3, 4, 2, 2).astype(np.float32)  # torch (ci, co, kh, kw)
    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
        stride=2).numpy().transpose(0, 2, 3, 1)
    out = nn.ConvTranspose(4, (2, 2), strides=(2, 2), use_bias=False).apply(
        {"params": {"kernel": jnp.asarray(ref_import.t_convT2d(w))}},
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_dense3d_orientation():
    """spconv/flax (kz,ky,kx,ci,co) equals torch conv3d after permute."""
    import flax.linen as nn
    rng = np.random.RandomState(2)
    x = rng.randn(1, 5, 6, 7, 3).astype(np.float32)
    w_sp = rng.randn(3, 3, 3, 3, 4).astype(np.float32)  # spconv layout
    w_torch = w_sp.transpose(4, 3, 0, 1, 2)  # (co, ci, kz, ky, kx)
    ref = torch.nn.functional.conv3d(
        torch.from_numpy(x.transpose(0, 4, 1, 2, 3)),
        torch.from_numpy(w_torch), padding=1).numpy().transpose(0, 2, 3, 4, 1)
    out = nn.Conv(4, (3, 3, 3), padding=1, use_bias=False).apply(
        {"params": {"kernel": jnp.asarray(ref_import.t_dense3d(w_sp))}},
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_deconv3d_orientation():
    """spconv deconv (== torch ConvTranspose3d) -> flax needs spatial flip."""
    import flax.linen as nn
    rng = np.random.RandomState(3)
    x = rng.randn(1, 4, 5, 6, 3).astype(np.float32)
    w_sp = rng.randn(3, 3, 3, 3, 4).astype(np.float32)  # (k..., ci, co)
    w_torch = w_sp.transpose(3, 4, 0, 1, 2)  # (ci, co, k...)
    ref = torch.nn.functional.conv_transpose3d(
        torch.from_numpy(x.transpose(0, 4, 1, 2, 3)),
        torch.from_numpy(w_torch), stride=2, padding=1,
    ).numpy().transpose(0, 2, 3, 4, 1)
    out = nn.ConvTranspose(4, (3, 3, 3), strides=(2, 2, 2),
                           padding=[(1, 1)] * 3, use_bias=False).apply(
        {"params": {"kernel": jnp.asarray(ref_import.t_deconv3d(w_sp))}},
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_sparse_engine_matches_torch_conv3d():
    """Our sparse engine with an imported spconv kernel must equal torch
    conv3d on a fully-active grid (pins tap enumeration order)."""
    from btcdet_tpu.ops import sparse

    rng = np.random.RandomState(4)
    nz, ny, nx, ci, co = 4, 5, 6, 3, 4
    dense = rng.randn(1, nz, ny, nx, ci).astype(np.float32)
    coords = np.array([(0, z, y, x) for z in range(nz) for y in range(ny)
                       for x in range(nx)], np.int32)
    feats = dense[0].reshape(-1, ci)
    st = sparse.from_coords(jnp.asarray(feats), jnp.asarray(coords),
                            (nz, ny, nx), 1)
    w_sp = rng.randn(3, 3, 3, ci, co).astype(np.float32)
    w_torch = w_sp.transpose(4, 3, 0, 1, 2)
    ref = torch.nn.functional.conv3d(
        torch.from_numpy(dense.transpose(0, 4, 1, 2, 3)),
        torch.from_numpy(w_torch), padding=1).numpy().transpose(0, 2, 3, 4, 1)

    mod = sparse.SubMConv3d(out_channels=co, kernel_size=3)
    params = mod.init(jax.random.PRNGKey(0), st, {})
    params = jax.tree_util.tree_map(lambda _: None, params)  # shape check only
    out = mod.apply({"params": {"kernel": jnp.asarray(
        ref_import.t_sparse3d(w_sp))}}, st, {})
    got = np.asarray(out.dense())[0]
    np.testing.assert_allclose(got, ref[0], atol=1e-3)


def test_fc_orientation():
    rng = np.random.RandomState(5)
    x = rng.randn(7, 6).astype(np.float32)
    w = rng.randn(9, 6, 1).astype(np.float32)  # torch Conv1d (co, ci, 1)
    ref = torch.nn.functional.conv1d(
        torch.from_numpy(x[None].transpose(0, 2, 1)), torch.from_numpy(w)
    ).numpy()[0].T
    got = x @ ref_import.t_fc(w)
    np.testing.assert_allclose(got, ref, atol=1e-4)
