"""Occ dense-backbone variants: shapes, mask semantics, gradients.

Covers the registry parity classes (reference `spconv_backbone.py`
VoxelBackBoneDeconvRes :226-381 / VoxelBackBoneInverseRes :385-527)
alongside the shipped VoxelBackBoneDeconv.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from btcdet_tpu.models import backbones_3d as B

pytestmark = pytest.mark.slow  # model-scale XLA compiles; smoke suite skips


# odd spatial dims: the stride-2 down/up round trip is exact for odd
# sizes (like the flagship 9 x 157 x 209 grid); even dims lose their
# last row to the documented crop/pad fringe
SHAPES = (5, 29, 41)  # (nz, ny, nx)


def make_inputs(seed=0, B_=1, C=4):
    rng = np.random.RandomState(seed)
    nz, ny, nx = SHAPES
    x = rng.randn(B_, nz, ny, nx, C).astype(np.float32)
    mask = rng.rand(B_, nz, ny, nx) < 0.1
    x = x * mask[..., None]
    return jnp.asarray(x), jnp.asarray(mask)


@pytest.mark.parametrize("cls,y_shift", [
    (B.VoxelBackBoneDeconv, 0),
    (B.VoxelBackBoneDeconv, 2),
    (B.VoxelBackBoneDeconvRes, 0),
    (B.VoxelBackBoneDeconvRes, 2),
    (B.VoxelBackBoneInverseRes, 0),
    (B.VoxelBackBoneInverseRes, 2),
])
def test_variant_forward(cls, y_shift):
    x, mask = make_inputs()
    net = cls(input_channels=4, channels=(8, 8, 16), y_shift=y_shift)
    v = net.init(jax.random.PRNGKey(0), x, mask, True)
    out, m = net.apply(v, x, mask, False,
                       mutable=False)
    nz, ny, nx = SHAPES
    assert out.shape[:4] == (1, nz, ny, nx)
    assert m.shape == (1, nz, ny, nx)
    o = np.asarray(out, np.float32)
    assert np.isfinite(o).all()
    # inactive output sites are exactly zero
    assert float(np.abs(o[~np.asarray(m)]).max() if (~np.asarray(m)).any() else 0.0) == 0.0
    # output mask contains the input active set (convs only dilate)
    assert bool(np.all(~np.asarray(mask) | np.asarray(m)))


def test_inverse_res_restores_level1_mask():
    x, mask = make_inputs(seed=1)
    net = B.VoxelBackBoneInverseRes(input_channels=4, channels=(8, 8, 16))
    v = net.init(jax.random.PRNGKey(0), x, mask, True)
    _, m = net.apply(v, x, mask, False, mutable=False)
    # inverse decoder masks back to the level-1 active set = the input
    # set dilated by the regular (non-submanifold) conv1
    lvl1 = B._dilate_mask(mask, (3, 3, 3), (1, 1, 1), (1, 1, 1))
    np.testing.assert_array_equal(np.asarray(m), np.asarray(lvl1))


def test_res_variant_gradients():
    x, mask = make_inputs(seed=2)
    net = B.VoxelBackBoneDeconvRes(input_channels=4, channels=(8, 8, 16))
    v = net.init(jax.random.PRNGKey(0), x, mask, True)

    def loss(params):
        (out, _), _ = net.apply(
            {**v, "params": params}, x, mask, True,
            mutable=["batch_stats"],
        )
        return (out.astype(jnp.float32) ** 2).mean()

    g = jax.grad(loss)(v["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l, np.float32)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
