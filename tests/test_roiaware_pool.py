import jax.numpy as jnp
import numpy as np

from btcdet_tpu.ops import roiaware_pool


def test_roiaware_pool_max():
    rois = np.array([[0, 0, 0, 2.0, 2.0, 2.0, 0.0]], np.float32)
    pts = np.array([
        [-0.9, -0.9, -0.9],   # cell (0,0,0)
        [0.9, 0.9, 0.9],      # cell (1,1,1) for out 2x2x2
        [5.0, 5.0, 5.0],      # outside
    ], np.float32)
    feats = np.array([[1.0], [2.0], [9.0]], np.float32)
    mask = np.ones(3, bool)
    out = roiaware_pool.roiaware_pool3d(
        jnp.asarray(rois), jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(mask),
        out_size=(2, 2, 2), pool_method="max",
    )
    out = np.asarray(out[0, ..., 0])
    assert out[0, 0, 0] == 1.0
    assert out[1, 1, 1] == 2.0
    assert out.sum() == 3.0  # all other cells empty


def test_roiaware_pool_rotation():
    # point at +x; roi rotated 90deg -> point lands on local -y side
    rois = np.array([[0, 0, 0, 4.0, 2.0, 2.0, np.pi / 2]], np.float32)
    pts = np.array([[0.0, 1.5, 0.0]], np.float32)  # inside rotated box
    feats = np.ones((1, 1), np.float32)
    out = roiaware_pool.roiaware_pool3d(
        jnp.asarray(rois), jnp.asarray(pts), jnp.asarray(feats),
        jnp.ones(1, dtype=bool), out_size=(2, 2, 2),
    )
    assert np.asarray(out).sum() == 1.0


def test_roipoint_pool3d():
    rois = np.array([
        [0, 0, 0, 2.0, 2.0, 2.0, 0.0],
        [50, 50, 50, 2.0, 2.0, 2.0, 0.0],  # empty
    ], np.float32)
    pts = np.random.RandomState(0).uniform(-0.8, 0.8, (20, 3)).astype(np.float32)
    feats = np.arange(20, dtype=np.float32)[:, None]
    out, empty = roiaware_pool.roipoint_pool3d(
        jnp.asarray(rois), jnp.asarray(pts), jnp.asarray(feats),
        jnp.ones(20, dtype=bool), num_sampled_points=8,
    )
    assert out.shape == (2, 8, 4)
    assert not bool(empty[0]) and bool(empty[1])
    assert np.abs(np.asarray(out[1])).sum() == 0.0
