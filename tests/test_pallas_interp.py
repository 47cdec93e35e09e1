"""Fused trilinear sampler vs common.trilinear_interpolate_dense
(interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from btcdet_tpu.ops import pallas_interp as PI
from btcdet_tpu.utils import common


def make_case(seed=0, B=2, D=5, H=40, W=48, C=64, R=6, S=576):
    rng = np.random.RandomState(seed)
    dense = rng.randn(B, D, H, W, C).astype(np.float32)
    roi_b = rng.randint(0, B, R).astype(np.int32)
    centers = np.stack([
        rng.rand(R) * (H - 10) + 5, rng.rand(R) * (W - 10) + 5], -1
    ).astype(np.float32)
    # samples near their roi center (within the 32-cell window), plus a
    # few pushed outside the volume to exercise zero semantics
    offs = (rng.rand(R, S, 3) - 0.5) * np.asarray([2 * (D + 2), 14, 14])
    zyx = np.concatenate([
        (rng.rand(R, S, 1) * (D + 2) - 1),          # z covers out-of-range
        centers[:, None, :] + offs[..., 1:],
    ], axis=-1).astype(np.float32)
    valid = rng.rand(R, S) < 0.9
    return (jnp.asarray(dense), jnp.asarray(zyx), jnp.asarray(centers),
            jnp.asarray(roi_b), jnp.asarray(valid))


def reference(dense, zyx, roi_b, valid):
    R, S, _ = zyx.shape
    db = dense.astype(jnp.bfloat16).astype(jnp.float32)
    outs = []
    for r in range(R):
        o = common.trilinear_interpolate_dense(db[int(roi_b[r])], zyx[r])
        outs.append(o)
    out = jnp.stack(outs)
    return jnp.where(valid[..., None], out, 0.0)


def test_matches_reference():
    dense, zyx, centers, roi_b, valid = make_case()
    out = PI.trilinear_pool(dense, zyx, centers, roi_b, valid,
                            tile=288, interpret=True)
    ref = reference(dense, zyx, roi_b, valid)
    volp = PI.prep_volume(dense)
    miss = int(PI.window_miss_count(zyx, centers, roi_b, valid,
                                    volp.shape[1], volp.shape[2]))
    assert miss == 0, miss
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)


def test_gradients_match_reference():
    dense, zyx, centers, roi_b, valid = make_case(seed=2, R=3, S=288)

    def pal_loss(d):
        out = PI.trilinear_pool_ad(d, zyx, centers, roi_b, valid, 288)
        return (out ** 2).sum()

    def ref_loss(d):
        out = PI._xla_reference_pool(d, zyx, roi_b, valid)
        return (out ** 2).sum()

    # run the pallas primal through the interpreter on CPU
    orig = PI._interp_call
    try:
        PI._interp_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
        g_pal = jax.grad(pal_loss)(dense)
    finally:
        PI._interp_call = orig
    g_ref = jax.grad(ref_loss)(dense)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               atol=0.2, rtol=0.05)


def test_window_miss_counts_far_samples():
    dense, zyx, centers, roi_b, valid = make_case(seed=1, H=96, W=96)
    # in-volume but ~35 cells past the 32-cell window -> counted misses
    far = zyx.at[:, :8, 1].set(centers[:, None, 0] + 35.0)
    volp = PI.prep_volume(dense)
    miss = int(PI.window_miss_count(far, centers, roi_b, valid,
                                    volp.shape[1], volp.shape[2]))
    assert miss > 0
