import numpy as np

from btcdet_tpu.ops import voxelizer


RANGE = (0.0, -2.0, -1.0, 4.0, 2.0, 1.0)
VSIZE = (0.5, 0.5, 0.5)


def brute_force(points, max_points, max_voxels):
    """Simple dict-based voxelizer in key order (matches drop semantics)."""
    nx, ny, nz = voxelizer.compute_grid_size(RANGE, VSIZE)
    vox = {}
    for p in points:
        c = np.floor((p[:3] - np.array(RANGE[:3])) / np.array(VSIZE)).astype(int)
        if not (0 <= c[0] < nx and 0 <= c[1] < ny and 0 <= c[2] < nz):
            continue
        key = (c[2] * ny + c[1]) * nx + c[0]
        vox.setdefault(key, []).append(p)
    out = {}
    for key in sorted(vox)[:max_voxels]:
        out[key] = vox[key][:max_points]
    return out


def check_result(voxels, coords, num_points, ref):
    nx, ny, nz = voxelizer.compute_grid_size(RANGE, VSIZE)
    got = {}
    for i in range(len(coords)):
        if coords[i, 0] < 0:
            continue
        key = (coords[i, 0] * ny + coords[i, 1]) * nx + coords[i, 2]
        got[int(key)] = np.asarray(voxels[i][: num_points[i]])
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(got[k], np.array(ref[k]), rtol=1e-6)


def test_voxelize_np_matches_bruteforce():
    rng = np.random.RandomState(0)
    points = rng.uniform(-1, 5, size=(200, 4)).astype(np.float32)
    voxels, coords, num_points = voxelizer.voxelize_np(points, RANGE, VSIZE, 3, 64)
    check_result(voxels, coords, num_points, brute_force(points, 3, 64))


def test_voxelize_jit_matches_np():
    rng = np.random.RandomState(1)
    points = rng.uniform(-1, 5, size=(256, 4)).astype(np.float32)
    valid = np.ones((256,), dtype=bool)
    valid[200:] = False

    res = voxelizer.voxelize(
        points, valid,
        point_cloud_range=RANGE, voxel_size=VSIZE, max_points=4, max_voxels=64,
    )
    v_np, c_np, n_np = voxelizer.voxelize_np(points[:200], RANGE, VSIZE, 4, 64)
    np.testing.assert_array_equal(np.asarray(res.coords), c_np)
    np.testing.assert_array_equal(np.asarray(res.num_points), n_np)
    np.testing.assert_allclose(np.asarray(res.voxels), v_np, rtol=1e-6)
    assert int(res.num_voxels) == int((c_np[:, 0] >= 0).sum())


def test_voxelize_keys_sorted():
    rng = np.random.RandomState(2)
    points = rng.uniform(-1, 5, size=(100, 4)).astype(np.float32)
    res = voxelizer.voxelize(
        points, np.ones(100, bool),
        point_cloud_range=RANGE, voxel_size=VSIZE, max_points=2, max_voxels=32,
    )
    coords = np.asarray(res.coords)
    nx, ny, nz = voxelizer.compute_grid_size(RANGE, VSIZE)
    valid = coords[:, 0] >= 0
    keys = (coords[valid, 0] * ny + coords[valid, 1]) * nx + coords[valid, 2]
    assert np.all(np.diff(keys) > 0)
    # padding at the end only
    assert not valid[: valid.sum()].__invert__().any()
