"""DB_PROJ occupancy densification (reference `add_occ_template.py:45`
`db_proj_func`, called at `pass_occ_vox.py:42-43`): each occ point is
expanded onto a sub-det-cell lattice, keeping only candidates that map
back into the source occ voxel, so one coarse occ voxel fills every det
cell it covers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from btcdet_tpu.config import CfgBox
from btcdet_tpu.datasets import make_synthetic_batch
from btcdet_tpu.datasets.mini_config import mini_data_cfg, mini_model_cfg
from btcdet_tpu.models.occ import occ_subnet
from btcdet_tpu.utils import coords as coord_utils

from test_occ_pillar import run_subnet

pytestmark = pytest.mark.slow  # model-scale XLA compiles; smoke suite skips


def test_db_proj_expand_geometry_cartesian():
    """Kept candidates (a) lie in the det grid, (b) map back into the
    source occ voxel, (c) include the original point, and (d) cover more
    det cells than the single source point when occ >> det voxels."""
    det_lo = (0.0, -4.0, -1.0)
    det_vs = (0.1, 0.1, 0.1)
    det_grid = (80, 80, 20)
    occ_lo = det_lo
    occ_vs = (0.8, 0.8, 0.4)  # one occ voxel covers 8x8x4 det cells

    rng = np.random.RandomState(0)
    B, K = 2, 16
    xyz = np.stack([
        rng.uniform(0.5, 7.5, (B, K)),
        rng.uniform(-3.5, 3.5, (B, K)),
        rng.uniform(-0.9, 0.9, (B, K)),
    ], -1).astype(np.float32)
    valid = rng.rand(B, K) < 0.8
    src_cell = np.floor((xyz - np.asarray(occ_lo)) / np.asarray(occ_vs)).astype(np.int32)
    rot_z = np.zeros((B,), np.float32)

    pts, keep = occ_subnet.db_proj_expand(
        jnp.asarray(xyz), jnp.zeros((B, K, 1)), jnp.asarray(valid),
        jnp.asarray(src_cell), jnp.asarray(rot_z),
        det_lo=det_lo, det_vs=det_vs, det_grid=det_grid,
        occ_lo=occ_lo, occ_vs=occ_vs, coord_type="cartesian",
        expand=(2.0, 4.0, 4.0), stride=(1.0, 1.0, 1.0),
    )
    pts, keep = np.asarray(pts), np.asarray(keep)
    E = keep.shape[1] // K
    assert E == 5 * 9 * 9

    for b in range(B):
        kept = pts[b, keep[b], :3]
        # (a) in det range
        assert (kept >= np.asarray(det_lo)).all()
        hi = np.asarray(det_lo) + np.asarray(det_grid) * np.asarray(det_vs)
        assert (kept <= hi).all()
        # (b) each kept candidate maps back into its source occ voxel
        src_rep = np.repeat(src_cell[b], E, axis=0)[keep[b]]
        back = np.floor((kept - np.asarray(occ_lo)) / np.asarray(occ_vs)).astype(np.int32)
        np.testing.assert_array_equal(back, src_rep)
        # (c) every valid source point contributes its own det cell center
        kk = keep[b].reshape(K, E)
        pp = pts[b, :, :3].reshape(K, E, 3)
        for k in range(K):
            if not valid[b, k]:
                assert not kk[k].any()
                continue
            c0 = np.floor((xyz[b, k] - np.asarray(det_lo)) / np.asarray(det_vs))
            center = (c0 + 0.5) * np.asarray(det_vs) + np.asarray(det_lo)
            d = np.abs(pp[k][kk[k]] - center).sum(-1)
            assert (d < 1e-4).any()
            # (d) densification: several det cells per occ voxel
            assert kk[k].sum() > 1


def test_db_proj_expand_rot_z_cylinder():
    """With a cylinder occ grid and nonzero rot_z, the world->sensor
    azimuth correction must be applied before the pick test (reference
    db_proj_func `occ_coords_loc[..., 1] += rot_z`)."""
    det_lo = (0.0, -8.0, -1.0)
    det_vs = (0.1, 0.1, 0.1)
    det_grid = (160, 160, 20)
    occ_lo = (2.0, -40.0, -1.0)   # (r, az_deg, z)
    occ_vs = (0.5, 2.0, 0.4)

    B, K = 2, 8
    rng = np.random.RandomState(1)
    rot_z = np.asarray([0.0, 17.0], np.float32)
    # sensor-frame points, then world frame = rotate azimuth by -rot_z
    sens = np.stack([
        rng.uniform(3.0, 10.0, (B, K)),       # r
        rng.uniform(-30.0, 30.0, (B, K)),     # az deg
        rng.uniform(-0.8, 0.8, (B, K)),       # z
    ], -1).astype(np.float32)
    src_cell = np.floor((sens - np.asarray(occ_lo)) / np.asarray(occ_vs)).astype(np.int32)
    # world-frame azimuth = sensor azimuth - rot_z, with the codebase's
    # azi = atan2(-y, x) convention (coords.absxyz_to_cylinder)
    az_world = np.deg2rad(sens[..., 1] - rot_z[:, None])
    xyz = np.stack([
        sens[..., 0] * np.cos(az_world),
        -sens[..., 0] * np.sin(az_world),
        sens[..., 2],
    ], -1).astype(np.float32)
    valid = np.ones((B, K), bool)

    pts, keep = occ_subnet.db_proj_expand(
        jnp.asarray(xyz), jnp.zeros((B, K, 1)), jnp.asarray(valid),
        jnp.asarray(src_cell), jnp.asarray(rot_z),
        det_lo=det_lo, det_vs=det_vs, det_grid=det_grid,
        occ_lo=occ_lo, occ_vs=occ_vs, coord_type="cylinder",
    )
    pts, keep = np.asarray(pts), np.asarray(keep)
    assert keep.any(), "expansion should keep at least the source cells"
    for b in range(B):
        kept = pts[b, keep[b], :3]
        E = keep.shape[1] // K
        src_rep = np.repeat(src_cell[b], E, axis=0)[keep[b]]
        # world -> sensor: azimuth += rot_z, then occ binning
        r = np.linalg.norm(kept[:, :2], axis=-1)
        az = np.rad2deg(np.arctan2(-kept[:, 1], kept[:, 0])) + rot_z[b]
        cyl = np.stack([r, az, kept[:, 2]], -1)
        back = np.floor((cyl - np.asarray(occ_lo)) / np.asarray(occ_vs)).astype(np.int32)
        np.testing.assert_array_equal(back, src_rep)


def test_db_proj_subnet_end_to_end():
    """OccSubnet with OCC_PNT_UPDATE.DB_PROJ merges MORE voxel rows than
    without (densification), and everything stays finite."""
    data_cfg, model_cfg = mini_data_cfg(with_occ=True), mini_model_cfg(with_occ=True)
    _, _, _, out_off = run_subnet(model_cfg, data_cfg, train=True)

    model_cfg["OCC"]["OCC_PNT_UPDATE"]["DB_PROJ"] = True
    _, _, _, out_on = run_subnet(model_cfg, data_cfg, train=True)

    assert np.isfinite(float(out_on["loss"]))
    assert np.isfinite(np.asarray(out_on["det_voxels"])).all()
    n_on = int((np.asarray(out_on["det_voxel_num_points"]) > 0).sum())
    n_off = int((np.asarray(out_off["det_voxel_num_points"]) > 0).sum())
    assert n_on >= n_off
    # occ_points (the ConvHead SA source) must NOT be expanded
    # (reference sets batch_dict["occ_pnts"] before db_proj_func)
    assert out_on["occ_points"].shape == out_off["occ_points"].shape


def test_real_drop_det_points_unit():
    """REAL_DROP (reference add_occ_template.py:172-184,193): det points
    inside dropped occ voxels are removed and each voxel row stays
    prefix-compacted."""
    occ_lo = (0.0, -4.0, -1.0)
    occ_vs = (1.0, 1.0, 1.0)
    occ_grid = (8, 8, 2)
    B, N, Pd, C = 1, 3, 4, 5
    det_vox = np.zeros((B, N, Pd, C), np.float32)
    # row 0: 3 points, middle one in the dropped occ cell (cell x=2,y=4+1=5? ->
    # cell is floor((p - lo)/vs)); dropped cell chosen as (x=2, y=5, z=0)
    det_vox[0, 0, 0, :3] = (0.5, -3.5, -0.5)   # cell (0, 0, 0) kept
    det_vox[0, 0, 1, :3] = (2.5, 1.5, -0.5)    # cell (2, 5, 0) DROPPED
    det_vox[0, 0, 2, :3] = (1.5, -2.5, -0.5)   # cell (1, 1, 0) kept
    # row 1: both points dropped
    det_vox[0, 1, 0, :3] = (2.1, 1.1, -0.9)
    det_vox[0, 1, 1, :3] = (2.9, 1.9, -0.1)
    # row 2: untouched
    det_vox[0, 2, 0, :3] = (4.5, 2.5, 0.5)
    det_vox[..., 3:] = 7.0
    det_num = np.asarray([[3, 2, 1]], np.int32)
    drop = np.zeros((B, 2, 8, 8), bool)
    drop[0, 0, 5, 2] = True
    rot_z = np.zeros((B,), np.float32)

    vox, num = occ_subnet.real_drop_det_points(
        jnp.asarray(det_vox), jnp.asarray(det_num), jnp.asarray(drop),
        jnp.asarray(rot_z), occ_lo=occ_lo, occ_vs=occ_vs,
        occ_grid=occ_grid, coord_type="cartesian")
    vox, num = np.asarray(vox), np.asarray(num)
    np.testing.assert_array_equal(num, [[2, 0, 1]])
    # row 0 compacted: the two kept points first, then zeros
    np.testing.assert_allclose(vox[0, 0, 0, :3], (0.5, -3.5, -0.5))
    np.testing.assert_allclose(vox[0, 0, 1, :3], (1.5, -2.5, -0.5))
    assert (vox[0, 0, 2:] == 0).all()
    assert (vox[0, 1] == 0).all()            # fully dropped row zeroed
    np.testing.assert_allclose(vox[0, 2, 0, :3], (4.5, 2.5, 0.5))


def test_real_drop_subnet_reduces_det_points():
    """With heavy occ dropout + REAL_DROP, the merged det voxel set holds
    fewer raw points than with REAL_DROP off."""
    data_cfg, model_cfg = mini_data_cfg(with_occ=True), mini_model_cfg(with_occ=True)
    data_cfg["OCC"]["DROPOUT_RATE"] = 0.9
    data_cfg["OCC"]["REAL_DROP"] = False
    _, _, _, out_off = run_subnet(model_cfg, data_cfg, train=True)
    data_cfg["OCC"]["REAL_DROP"] = True
    _, _, _, out_on = run_subnet(model_cfg, data_cfg, train=True)
    n_on = int(np.asarray(out_on["det_voxel_num_points"]).sum())
    n_off = int(np.asarray(out_off["det_voxel_num_points"]).sum())
    assert n_on < n_off
    assert np.isfinite(float(out_on["loss"]))


def test_remain_percentage_zero_drops_all_occ_points():
    """PARAMS.REMAIN_PERCENTAGE train-time random occ-point subsampling
    (reference add_occ_template.py:110-117): a (0, 0) rate range keeps
    nothing, so PassOccVox adds no points."""
    data_cfg, model_cfg = mini_data_cfg(with_occ=True), mini_model_cfg(with_occ=True)
    model_cfg["OCC"]["PARAMS"]["REMAIN_PERCENTAGE"] = [0.0, 0.0]
    _, _, _, out = run_subnet(model_cfg, data_cfg, train=True)
    assert int(np.asarray(out["occ_points_mask"]).sum()) == 0
    assert np.isfinite(float(out["loss"]))
