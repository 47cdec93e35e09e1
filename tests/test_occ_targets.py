"""Occupancy target-generation semantics (SURVEY §4: occlusion cumsum vs
naive ray march, dilation, mirror geometry, scatter-mean residuals)."""

import jax.numpy as jnp
import numpy as np

from btcdet_tpu.config import EasyDict
from btcdet_tpu.models.occ import occ_targets as T


def make_spec():
    data_cfg = EasyDict({
        "POINT_CLOUD_RANGE": [0, -8.0, -3.0, 16.0, 8.0, 1.0],
        "OCC": {
            "VOXEL_SIZE": [0.5, 2.0, 0.45],
            "DIST_KERN": [3, 3, 3],
            "HALF_X": True,
            "EMPT_SUR_THRESH": 9,  # disable empty-beam filling for clarity
            "POINT_CLOUD_RANGE": [2.0, -40.0, -2.6, 16.0, 40.0, 1.0],
            "SUPPORT_SPHERE_RANGE": [2.0, -40.0, -16.6, 16.5, 40.0, 4.0, 2.0],
            "COORD_TYPE": "cylinder",
        },
    })
    return T.build_grid_spec(data_cfg)


def test_dilation_matches_bruteforce():
    mask = np.zeros((1, 4, 6, 8), bool)
    mask[0, 2, 3, 4] = True
    out = np.asarray(T.dilate_predict_area(jnp.asarray(mask), (3, 3, 3), concede_x=1))
    ref = np.zeros_like(mask)
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (0, 1, 2):  # start = -1 + concede_x(1) = 0
                z, y, x = 2 + dz, 3 + dy, 4 + dx
                ref[0, z, y, x] = True
    np.testing.assert_array_equal(out, ref)


def numpy_occlusion_reference(spec, pts):
    """Naive ray-march reference: mark sphere cells at >= the first
    occupied dist cell of each (azi, elev) beam, then re-project each
    occluded sphere-cell CORNER into the occ grid (reference semantics,
    `occ_targets_template.py:136-155`)."""
    snx, sny, snz = spec.sphere_grid_size
    sr = np.asarray(spec.sphere_range[:6])
    svs = np.asarray(spec.sphere_voxel_size)
    sph_pts = np.stack([
        np.linalg.norm(pts, axis=1),
        np.arctan2(-pts[:, 1], pts[:, 0]) * 180 / np.pi,
        np.arctan2(pts[:, 2], np.linalg.norm(pts[:, :2], axis=1)) * 180 / np.pi,
    ], axis=1)
    smask = np.zeros((snz, sny, snx), bool)
    for p in sph_pts:
        if np.all(p >= sr[:3]) and np.all(p <= sr[3:6]):
            c = np.clip(
                np.floor((p - sr[:3]) / svs).astype(int), 0,
                [snx - 1, sny - 1, snz - 1],
            )
            smask[c[2], c[1], c[0]] = True
    occluded = np.cumsum(smask, axis=2) > 0  # along dist
    nx, ny, nz = spec.grid_size
    out = np.zeros((nz, ny, nx), bool)
    smap = spec.sphere_to_grid_map.reshape(snz, sny, snx)
    for idx in np.argwhere(occluded):
        lin = smap[idx[0], idx[1], idx[2]]
        if lin >= 0:
            out.reshape(-1)[lin] = True
    return out


def test_occlusion_matches_numpy_reference():
    spec = make_spec()
    rng = np.random.RandomState(0)
    pts = np.stack([
        rng.uniform(3, 14, 30), rng.uniform(-4, 4, 30), rng.uniform(-2, 0.5, 30)
    ], axis=1).astype(np.float32)
    occ = np.asarray(T.occlusion_mask(
        spec, jnp.asarray(pts), jnp.ones(30, bool), jnp.zeros(30, jnp.int32),
        jnp.zeros(30, jnp.float32), 1,
    ))[0]
    ref = numpy_occlusion_reference(spec, pts)
    np.testing.assert_array_equal(occ, ref)
    assert ref.sum() > 0  # non-trivial


def test_mirror_points():
    box = np.array([[5.0, 0.0, 0.0, 4.0, 2.0, 2.0, 0.0, 1.0]], np.float32)
    pts = np.array([[5.5, 0.6, 0.2], [20.0, 0.0, 0.0]], np.float32)
    fore, mirr, mval = T.mirror_points_in_boxes(
        jnp.asarray(pts), jnp.ones(2, bool), jnp.asarray(box),
        jnp.asarray([True]), jnp.asarray([1.0]),
    )
    assert bool(fore[0]) and not bool(fore[1])
    np.testing.assert_allclose(np.asarray(mirr[0]), [5.5, -0.6, 0.2], atol=1e-5)
    assert bool(mval[0]) and not bool(mval[1])


def test_mirror_rotated_box():
    yaw = np.pi / 2
    box = np.array([[0.0, 0.0, 0.0, 4.0, 2.0, 2.0, yaw, 1.0]], np.float32)
    # local +y direction in world = (-1, 0); point at world (-0.6, 1.0)
    pts = np.array([[-0.6, 1.0, 0.0]], np.float32)
    fore, mirr, mval = T.mirror_points_in_boxes(
        jnp.asarray(pts), jnp.ones(1, bool), jnp.asarray(box),
        jnp.asarray([True]), jnp.asarray([1.0]),
    )
    assert bool(mval[0])
    np.testing.assert_allclose(np.asarray(mirr[0]), [0.6, 1.0, 0.0], atol=1e-5)


def test_scatter_mean_res():
    grid = (4, 3, 2)  # nx, ny, nz
    centers = np.zeros((2, 3, 4, 3), np.float32)  # (nz, ny, nx, 3)
    coords = np.array([[0, 1, 2, 3], [0, 1, 2, 3]], np.int32)  # same voxel twice
    pts = np.array([[1.0, 2.0, 3.0], [3.0, 4.0, 5.0]], np.float32)
    res = np.asarray(T.scatter_mean_res(
        jnp.asarray(pts), jnp.asarray(coords), jnp.ones(2, bool),
        jnp.asarray(centers)[None], 1, grid,
    ))
    np.testing.assert_allclose(res[0, 1, 2, 3], [2.0, 3.0, 4.0], atol=1e-6)
    assert np.abs(res).sum() == np.abs(res[0, 1, 2, 3]).sum()


def test_reproj_matmul_matches_scatter():
    """The azimuth-factorized one-hot-matmul reprojection must equal the
    scatter-or through the full sphere->occ map, and the triangular-
    matmul running-OR must equal a plain cumsum."""
    import jax.numpy as jnp

    from btcdet_tpu.config import cfg_from_yaml_file

    cfg = cfg_from_yaml_file("tools/cfgs/model_configs/btcdet_kitti_car.yaml")
    spec = T.build_grid_spec(cfg.DATA_CONFIG)
    assert spec.sphere_reproj_2d is not None, "flagship grids share azimuth binning"

    rng = np.random.RandomState(0)
    B = 2
    pts = np.stack([
        rng.uniform(3, 68, 5000), rng.uniform(-38, 38, 5000),
        rng.uniform(-2.4, 0.5, 5000),
    ], 1).astype(np.float32)
    pv = rng.rand(5000) > 0.2
    pb = rng.randint(0, B, 5000).astype(np.int32)
    rz = np.zeros((B,), np.float32)

    fast = T.occlusion_mask(spec, jnp.asarray(pts), jnp.asarray(pv),
                            jnp.asarray(pb), jnp.asarray(rz), B)
    spec_fb = spec._replace(sphere_reproj_2d=None)
    slow = T.occlusion_mask(spec_fb, jnp.asarray(pts), jnp.asarray(pv),
                            jnp.asarray(pb), jnp.asarray(rz), B)
    assert np.array_equal(np.asarray(fast), np.asarray(slow))
    assert np.asarray(fast).sum() > 0


def test_blocked_matches_batched_loop():
    """Blocked (vmap-per-frame) fore/mirror/in-gt must equal the generic
    frame-loop versions when the flat list is per-frame contiguous
    blocks (the collate contract)."""
    rng = np.random.RandomState(3)
    B, M, G = 3, 64, 4
    pts = rng.uniform(-8, 8, (B * M, 3)).astype(np.float32)
    valid = rng.rand(B * M) < 0.8
    pb = np.repeat(np.arange(B, dtype=np.int32), M)
    gt = np.zeros((B, G, 8), np.float32)
    gt[..., :3] = rng.uniform(-6, 6, (B, G, 3))
    gt[..., 3:6] = rng.uniform(2, 5, (B, G, 3))
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (B, G))
    gt[..., 7] = (rng.rand(B, G) < 0.8).astype(np.float32)
    gv = gt[..., 7] > 1e-2
    mirr = (rng.rand(B, G) < 0.7).astype(np.float32)

    j = jnp.asarray
    f1, mp1, mv1 = T.mirror_points_in_boxes_batched(
        j(pts), j(valid), j(pb), j(gt), j(gv), j(mirr), B)
    f2, mp2, mv2 = T.mirror_points_in_boxes_blocked(
        j(pts), j(valid), j(gt), j(gv), j(mirr), B)
    assert (np.asarray(f1) == np.asarray(f2)).all()
    assert (np.asarray(mv1) == np.asarray(mv2)).all()
    mv = np.asarray(mv1)
    assert np.allclose(np.asarray(mp1)[mv], np.asarray(mp2)[mv], atol=1e-5)

    g1 = T.points_in_gt_batched(j(pts), j(valid), j(pb), j(gt), j(gv), B)
    g2 = T.points_in_gt_blocked(j(pts), j(valid), j(gt), j(gv), B)
    assert (np.asarray(g1) == np.asarray(g2)).all()
