"""Chamfer distance op (reference `btcdet/ops/chamfer_distance/` CUDA
kernel): squared nearest-neighbor distances both ways, inf at masked
points."""

import jax.numpy as jnp
import numpy as np

from btcdet_tpu.ops.chamfer import chamfer_distance


def brute(a, b):
    d = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    return d.min(1), d.min(0)


def test_matches_bruteforce():
    rng = np.random.RandomState(0)
    B, N, M = 3, 64, 48
    a = rng.randn(B, N, 3).astype(np.float32)
    b = rng.randn(B, M, 3).astype(np.float32)
    d1, d2 = chamfer_distance(jnp.asarray(a), jnp.asarray(b))
    for i in range(B):
        r1, r2 = brute(a[i], b[i])
        np.testing.assert_allclose(np.asarray(d1[i]), r1, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(d2[i]), r2, rtol=1e-4, atol=1e-5)


def test_masks():
    rng = np.random.RandomState(1)
    B, N, M = 2, 32, 24
    a = rng.randn(B, N, 3).astype(np.float32)
    b = rng.randn(B, M, 3).astype(np.float32)
    m1 = rng.rand(B, N) < 0.7
    m2 = rng.rand(B, M) < 0.7
    d1, d2 = chamfer_distance(jnp.asarray(a), jnp.asarray(b),
                              jnp.asarray(m1), jnp.asarray(m2))
    d1, d2 = np.asarray(d1), np.asarray(d2)
    # masked points give inf; live points measure only against live ones
    assert np.isinf(d1[~m1]).all() and np.isinf(d2[~m2]).all()
    for i in range(B):
        r1, _ = brute(a[i][m1[i]], b[i][m2[i]])
        np.testing.assert_allclose(d1[i][m1[i]], r1, rtol=1e-4, atol=1e-5)


def test_numpy_and_jax_paths_agree():
    rng = np.random.RandomState(2)
    a = rng.randn(1, 16, 3).astype(np.float32)
    b = rng.randn(1, 20, 3).astype(np.float32)
    dn = chamfer_distance(a, b)
    dj = chamfer_distance(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(dj[0]), dn[0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dj[1]), dn[1], rtol=1e-5)
