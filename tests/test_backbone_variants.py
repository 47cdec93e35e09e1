"""Every det-backbone variant the reference supports must construct,
forward, and differentiate (VERDICT r1 weak #1 / next #5): each
OUT_FEAT_TYPE (`res_combine`, reference `spconv_backbone.py:905-918`),
each OCC_CONV_TYPE downsampler (`build_occ_{maxpool,fix,weight,avgpool}_net`
`:793-866`), and the OCC_ATT attention branch (`apply_att:876`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from btcdet_tpu.models import backbones_3d
from btcdet_tpu.ops import sparse

GRID = (41, 16, 16)  # (nz, ny, nx): z must follow the 41->21->11->5->2 chain
CAP = 64
IN_CH = 6  # 4 point features + 2 occ code channels
OCC_CODE = 2


def _make_st(seed=0):
    rng = np.random.RandomState(seed)
    nz, ny, nx = GRID
    n = 48
    coords = np.stack([
        np.zeros(n, np.int32),
        rng.randint(0, nz, n), rng.randint(0, ny, n), rng.randint(0, nx, n),
    ], axis=1).astype(np.int32)
    coords = np.unique(coords, axis=0)
    pad = CAP - len(coords)
    coords = np.concatenate([coords, np.full((pad, 4), -1, np.int32)])
    feats = rng.randn(CAP, IN_CH).astype(np.float32)
    st = sparse.from_coords(jnp.asarray(feats), jnp.asarray(coords), GRID, 1)
    return st


def _run(bb, train=False):
    st = _make_st()
    occ_code = st.features[:, -OCC_CODE:]
    variables = bb.init(
        {"params": jax.random.PRNGKey(0)}, st, occ_code, train=False
    )

    def loss_fn(params):
        out = bb.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            st, occ_code, train=train,
            mutable=["batch_stats"] if train else False,
        )
        out = out[0] if train else out
        total = jnp.sum(out["encoded"].features ** 2)
        if out["x_combine"] is not None:
            total = total + jnp.sum(out["x_combine"].features ** 2)
        return total

    val, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    return val


@pytest.mark.parametrize("comb", ["None", "combine", "big_combine", "big_bev_combine"])
def test_out_feat_type(comb):
    bb = backbones_3d.VoxelBackBone8xOcc(
        input_channels=IN_CH, occ_code_num=OCC_CODE,
        occ_conv_type=("identity", "maxpool"),
        occ_conv_exec=(False, True),
        out_feat_type=("None",) * 4 + (comb,),
        channels=(4, 4, 4, 4, 8),
    )
    _run(bb)


# "identity" is only legal at level 0 (the reference's builder loop starts
# at i=1 and has no build_occ_identity_net, `spconv_backbone.py:650-651`);
# every deeper level must name a real downsampler.
@pytest.mark.parametrize("t", ["maxpool", "fix", "weight", "avgpool"])
def test_occ_conv_type(t):
    types = ("identity",) + (t,) * 3
    bb = backbones_3d.VoxelBackBone8xOcc(
        input_channels=IN_CH, occ_code_num=OCC_CODE,
        occ_conv_type=types,
        occ_conv_exec=(True, True, True, True),
        out_feat_type=("None",) * 4 + ("big_bev_combine",),
        channels=(4, 4, 4, 4, 8),
    )
    _run(bb)


def test_occ_att():
    bb = backbones_3d.VoxelBackBone8xOcc(
        input_channels=IN_CH, occ_code_num=OCC_CODE,
        occ_conv_type=("identity", "maxpool"),
        occ_conv_exec=(True, True),
        out_feat_type=("None",) * 4 + ("big_bev_combine",),
        out_att=(True, True, False, False),
        channels=(4, 4, 4, 4, 8),
    )
    _run(bb)


def test_train_mode_with_batch_stats():
    bb = backbones_3d.VoxelBackBone8xOcc(
        input_channels=IN_CH, occ_code_num=OCC_CODE,
        occ_conv_type=("identity", "maxpool"),
        occ_conv_exec=(False, True),
        out_feat_type=("None",) * 4 + ("combine",),
        channels=(4, 4, 4, 4, 8),
        level_caps=(CAP, CAP, CAP, CAP, CAP),
    )
    _run(bb, train=True)
