"""Occupancy training-target generation (reference
`btcdet/models/occ_pnt/occ_training_targets/{occ_targets_template.py,
occ_targets_3d.py}`), fully dense TPU formulation.

All masks live on the dense occ grid `[B, nz, ny, nx]` (cylinder coords,
sensor frame). The reference's scatter/nonzero pipeline becomes dense
boolean algebra + a precomputed static sphere->cylinder cell map:

  voxelwise   observed voxels (scatter of occ voxel coords)
  vcc         "predict area": DIST_KERN dilation of voxelwise, shifted
              forward in range when HALF_X (reference
              `create_predict_area3d:432` with concede_x)
  occluded    cumulative-sum occlusion along the range axis of an
              auxiliary *sphere* support grid (`occ_from_sphere_ocp:110`,
              cumsum > 0.9), re-projected into the cylinder grid through
              a STATIC cell-correspondence map (both grids live in the
              un-rotated sensor frame, so the map is batch-independent;
              the reference recomputes it per step via nonzero+scatter,
              `occ_from_cylin_ocp:136-155`)
  fore/mirr   per-point box membership; mirrored points are reflected
              across each box's local y axis (`point_box_utils.py:252-306`)
  bm          best-match (approximate complete shape) points inside gts
  residuals   per-voxel scatter-mean of contributing points minus the
              voxel center (`occ_targets_3d.get_mean_res:122`)
  loss maps   weighted cls/reg maps (`prepare_cls_loss_map:330`,
              `prepare_reg_loss_map:383`)

rot_z convention (degrees, from the world-rotation augmentation): point
azimuth_world + rot_z = azimuth_sensor; stored voxel point uvd channels
are world-frame cylinder coords (`data_processor.py:148-150`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import common, coords


class OccGridSpec(NamedTuple):
    """Static geometry of the occ pipeline, precomputed host-side."""

    coord_type: str
    grid_size: tuple          # (nx, ny, nz) occ grid
    voxel_size: tuple         # occ voxel size (u, v, d)
    point_cloud_range: tuple  # occ range in occ coords (6,)
    det_point_cloud_range: tuple
    dist_kern: tuple          # (kz, ky, kx)
    concede_x: int
    empt_sur_thresh: int
    sphere_grid_size: tuple   # (snx, sny, snz)
    sphere_voxel_size: tuple
    sphere_range: tuple
    sphere_to_grid_map: np.ndarray   # (snz*sny*snx,) int32 -> occ cell or -1
    voxel_centers_xyz: np.ndarray    # (nz, ny, nx, 3) cartesian centers (sensor frame)
    # azimuth-invariant 2D reprojection map (snz*snx,) int32 -> cz*nx+cx
    # or -1; present when the sphere and occ grids share the azimuth
    # binning, which turns the sphere->occ scatter into a per-azimuth
    # one-hot MATMUL (measured 20ms scatter -> <1ms MXU)
    sphere_reproj_2d: np.ndarray | None = None
    # occlusion-direction ablation (reference MODEL.OCC.PARAMS.REVERSE_VIS,
    # `occ_targets_template.py:67,111-134`): NOTHING | BACK_TRACK | VCC
    reverse_vis: str = "NOTHING"


def build_grid_spec(data_cfg) -> OccGridSpec:
    occ = data_cfg.OCC
    coord_type = occ.COORD_TYPE
    pcr = np.asarray(occ.POINT_CLOUD_RANGE, np.float64)
    vs = np.asarray(occ.VOXEL_SIZE, np.float64)
    grid = np.round((pcr[3:6] - pcr[0:3]) / vs).astype(np.int64)
    nx, ny, nz = int(grid[0]), int(grid[1]), int(grid[2])

    sr = np.asarray(occ.SUPPORT_SPHERE_RANGE, np.float64)
    svs = np.array([vs[0], vs[1], sr[6]])
    if occ.get("SUPPORT_SPHERE_VOXEL_SIZE", None) is not None:
        svs = np.array([occ.SUPPORT_SPHERE_VOXEL_SIZE[0], occ.SUPPORT_SPHERE_VOXEL_SIZE[1], sr[6]])
    sgrid = ((sr[3:6] - sr[0:3]) / svs).astype(np.int64)
    snx, sny, snz = int(sgrid[0]), int(sgrid[1]), int(sgrid[2])

    # static sphere-cell -> occ-cell map: sphere cell CORNER (reference uses
    # ind * voxel + origin, occ_targets_template.py:147) -> cartesian ->
    # occ coords -> occ cell (in-range test then clamp)
    iz, iy, ix = np.meshgrid(np.arange(snz), np.arange(sny), np.arange(snx), indexing="ij")
    su = sr[0] + ix.astype(np.float64) * svs[0]
    sv = sr[1] + iy.astype(np.float64) * svs[1]
    sd = sr[2] + iz.astype(np.float64) * svs[2]
    cart = coords.sphere_to_absxyz(su.ravel(), sv.ravel(), sd.ravel())  # (S, 3)
    cart = np.asarray(cart)
    if coord_type == "cylinder":
        occ_pts = coords.absxyz_to_cylinder(cart)
    elif coord_type == "cartesian":
        occ_pts = cart
    else:  # sphere occ grid uses the identity map (same grid family)
        occ_pts = coords.absxyz_to_sphere(cart)
    in_range = np.all((occ_pts[:, :3] >= pcr[None, :3]) & (occ_pts[:, :3] <= pcr[None, 3:6]), axis=1)
    cell = np.floor((occ_pts[:, :3] - pcr[None, :3]) / vs[None]).astype(np.int64)
    cell = np.clip(cell, 0, np.array([nx - 1, ny - 1, nz - 1])[None])
    lin = (cell[:, 2] * ny + cell[:, 1]) * nx + cell[:, 0]
    sphere_map = np.where(in_range, lin, -1).astype(np.int32)

    # For cylinder occ grids sharing the sphere grid's azimuth binning
    # (origin, step AND range equal -- true for the shipped configs),
    # azimuth factors out of the sphere->occ map analytically: cylinder
    # r' = r cos(el) and z = r sin(el) depend only on (el, r), and the
    # azimuth bin passes through unchanged. Build the (el, r) -> (z, r')
    # map at azimuth 0 and synthesize the full map from it. This removes
    # the reference's float jitter at azimuth bin boundaries (corner
    # roundtrip through trig lands ~1ulp below the boundary for ~1/6 of
    # cells, shifting them one azimuth bin) and lets the reprojection run
    # as a per-azimuth one-hot matmul.
    az_shared = (
        coord_type == "cylinder"
        and abs(sr[1] - pcr[1]) < 1e-9 and abs(sr[4] - pcr[4]) < 1e-9
        and abs(svs[1] - vs[1]) < 1e-9 and sny == ny
    )
    sphere_reproj_2d = None
    if az_shared:
        iz2, ix2 = np.meshgrid(np.arange(snz), np.arange(snx), indexing="ij")
        su2 = sr[0] + ix2.astype(np.float64) * svs[0]
        sd2 = sr[2] + iz2.astype(np.float64) * svs[2]
        cart2 = np.asarray(coords.sphere_to_absxyz(
            su2.ravel(), np.zeros(su2.size), sd2.ravel()))
        occ2 = np.asarray(coords.absxyz_to_cylinder(cart2))
        inr2 = (
            (occ2[:, 0] >= pcr[0]) & (occ2[:, 0] <= pcr[3])
            & (occ2[:, 2] >= pcr[2]) & (occ2[:, 2] <= pcr[5])
        )
        cr = np.clip(np.floor((occ2[:, 0] - pcr[0]) / vs[0]).astype(np.int64), 0, nx - 1)
        cz2 = np.clip(np.floor((occ2[:, 2] - pcr[2]) / vs[2]).astype(np.int64), 0, nz - 1)
        map2d = np.where(inr2, cz2 * nx + cr, -1).astype(np.int32)  # (snz*snx,)
        sphere_reproj_2d = map2d
        # synthesize the full 3D map from the factorization so the
        # fallback scatter path and the matmul path agree exactly
        m2 = map2d.reshape(snz, snx)
        z_t = m2 // nx
        r_t = m2 - z_t * nx
        full = (
            z_t[:, None, :] * (ny * nx)
            + np.arange(sny)[None, :, None] * nx
            + r_t[:, None, :]
        )
        sphere_map = np.where(
            m2[:, None, :] >= 0, full, -1
        ).reshape(-1).astype(np.int32)

    # cartesian centers of occ cells (sensor frame)
    czi, cyi, cxi = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx), indexing="ij")
    cu = pcr[0] + (cxi + 0.5) * vs[0]
    cv = pcr[1] + (cyi + 0.5) * vs[1]
    cd = pcr[2] + (czi + 0.5) * vs[2]
    centers = np.asarray(coords.occ_uvd_to_absxyz(
        cu.ravel(), cv.ravel(), cd.ravel(), coord_type
    )).reshape(nz, ny, nx, 3).astype(np.float32)

    dk = tuple(int(d) for d in occ.DIST_KERN)  # (kz, ky, kx)
    concede = dk[2] // 2 if occ.get("HALF_X", False) else 0
    concede = int(occ.get("CONCEDE_X", concede))

    return OccGridSpec(
        coord_type=coord_type,
        grid_size=(nx, ny, nz),
        voxel_size=tuple(float(v) for v in vs),
        point_cloud_range=tuple(float(v) for v in pcr),
        det_point_cloud_range=tuple(float(v) for v in data_cfg.POINT_CLOUD_RANGE),
        dist_kern=dk,
        concede_x=concede,
        empt_sur_thresh=int(occ.get("EMPT_SUR_THRESH", 9)),
        sphere_grid_size=(snx, sny, snz),
        sphere_voxel_size=tuple(float(v) for v in svs),
        sphere_range=tuple(float(v) for v in sr),
        sphere_to_grid_map=sphere_map,
        voxel_centers_xyz=centers,
        sphere_reproj_2d=sphere_reproj_2d,
        reverse_vis=str(occ.get("REVERSE_VIS", "NOTHING")),
    )


# ------------------------------------------------------------ primitives


def scatter_mask(coords_bzyx, valid, batch_size: int, grid):
    """(N, 4) (b, z, y, x) -> dense bool [B, nz, ny, nx]."""
    nx, ny, nz = grid
    ncell = nz * ny * nx
    lin = (coords_bzyx[:, 1] * ny + coords_bzyx[:, 2]) * nx + coords_bzyx[:, 3]
    idx = jnp.where(valid, coords_bzyx[:, 0] * ncell + lin, batch_size * ncell)
    out = jnp.zeros((batch_size * ncell + 1,), bool).at[idx].set(
        jnp.where(valid, True, False)
    )
    return out[:-1].reshape(batch_size, nz, ny, nx)


def scatter_mean_res(points_xyz, coords_bzyx, valid, centers_xyz, batch_size: int, grid):
    """Per-voxel mean of contributing points minus voxel center
    (reference `get_mean_res`). Returns [B, nz, ny, nx, 3]."""
    nx, ny, nz = grid
    ncell = nz * ny * nx
    lin = (coords_bzyx[:, 1] * ny + coords_bzyx[:, 2]) * nx + coords_bzyx[:, 3]
    idx = jnp.where(valid, coords_bzyx[:, 0] * ncell + lin, batch_size * ncell)
    acc = jnp.zeros((batch_size * ncell + 1, 3), jnp.float32).at[idx].add(
        jnp.where(valid[:, None], points_xyz, 0.0)
    )
    cnt = jnp.zeros((batch_size * ncell + 1,), jnp.float32).at[idx].add(
        valid.astype(jnp.float32)
    )
    mean = acc[:-1] / jnp.maximum(cnt[:-1, None], 1.0)
    mean = mean.reshape(batch_size, nz, ny, nx, 3)
    has = (cnt[:-1] > 0).reshape(batch_size, nz, ny, nx)
    # centers may be per-batch (B, nz, ny, nx, 3) or shared (nz, ny, nx, 3)
    if centers_xyz.ndim == 4:
        centers_xyz = centers_xyz[None]
    res = mean - centers_xyz
    return jnp.where(has[..., None], res, 0.0)


def dilate_predict_area(mask, dist_kern, concede_x: int):
    """vcc mask (reference `create_predict_area3d`): each active voxel
    marks a [kz, ky, kx] neighborhood starting at offset
    (-kz//2, -ky//2, -kx//2 + concede_x)."""
    kz, ky, kx = dist_kern
    starts = (-(kz // 2), -(ky // 2), -(kx // 2) + concede_x)
    pads = [(s + k - 1, -s) for s, k in zip(starts, (kz, ky, kx))]
    m = mask[..., None].astype(jnp.float32)
    out = jax.lax.reduce_window(
        m, -jnp.inf, jax.lax.max,
        window_dimensions=(1, kz, ky, kx, 1),
        window_strides=(1, 1, 1, 1, 1),
        padding=((0, 0), *pads, (0, 0)),
    )
    return out[..., 0] > 0


def points_to_grid_coords(occ_pts, spec: OccGridSpec):
    """Occ-coord points -> (cell_xyz (N, 3) int32, in_range (N,)) with the
    reference's in-range-then-clamp semantics (`point2coords_inrange`)."""
    pcr = jnp.asarray(spec.point_cloud_range, jnp.float32)
    vs = jnp.asarray(spec.voxel_size, jnp.float32)
    nx, ny, nz = spec.grid_size
    inr = jnp.all((occ_pts[:, :3] >= pcr[:3]) & (occ_pts[:, :3] <= pcr[3:6]), axis=1)
    cell = jnp.floor((occ_pts[:, :3] - pcr[:3]) / vs).astype(jnp.int32)
    cell = jnp.clip(cell, 0, jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.int32))
    return cell, inr


def world_to_occ_coords(points_xyz, rot_z_deg, spec: OccGridSpec):
    """World-frame cartesian points -> sensor-frame occ coords.
    rot_z_deg: per-point degrees."""
    if spec.coord_type == "cartesian":
        return common.rotate_points_along_z(
            points_xyz[:, None, :], -rot_z_deg * (np.pi / 180.0)
        )[:, 0]
    oc = coords.cartesian_to_occ(points_xyz, spec.coord_type)
    return oc.at[:, 1].add(rot_z_deg)


def occlusion_mask(
    spec: OccGridSpec, points_xyz, points_valid, points_b, rot_z, batch_size: int
):
    """Sphere-support-grid occlusion (reference `occ_from_cylin_ocp` /
    `occ_from_sphere_ocp` default branch + EMPT_SUR_THRESH handling).

    points_xyz: (N, 3) world-frame cartesian points.
    Returns bool [B, nz, ny, nx].
    """
    snx, sny, snz = spec.sphere_grid_size
    sr = jnp.asarray(spec.sphere_range[:6], jnp.float32)
    svs = jnp.asarray(spec.sphere_voxel_size, jnp.float32)

    sph = coords.absxyz_to_sphere(points_xyz)
    sph = sph.at[:, 1].add(rot_z[points_b])
    inr = jnp.all((sph[:, :3] >= sr[:3]) & (sph[:, :3] <= sr[3:6]), axis=1) & points_valid
    cell = jnp.floor((sph[:, :3] - sr[:3]) / svs).astype(jnp.int32)
    cell = jnp.clip(cell, 0, jnp.asarray([snx - 1, sny - 1, snz - 1], jnp.int32))
    scell = snz * sny * snx
    lin = (cell[:, 2] * sny + cell[:, 1]) * snx + cell[:, 0]
    idx = jnp.where(inr, points_b * scell + lin, batch_size * scell)
    smask = jnp.zeros((batch_size * scell + 1,), jnp.float32).at[idx].max(
        jnp.where(inr, 1.0, 0.0)
    )[:-1].reshape(batch_size, snz, sny, snx)

    if spec.empt_sur_thresh < 9 and spec.reverse_vis not in ("VCC", "BACK_TRACK"):
        # empty beams surrounded by > thresh occupied neighbors count as
        # occupied at range 0 (reference `get_empty_mask:186`; the VCC /
        # BACK_TRACK reference branches skip it, `occ_targets_template.py
        # :111-126`)
        counts2d = smask.sum(axis=3)  # (B, snz, sny)
        neigh = jax.lax.reduce_window(
            counts2d[..., None], 0.0, jax.lax.add,
            window_dimensions=(1, 3, 3, 1), window_strides=(1, 1, 1, 1),
            padding=((0, 0), (1, 1), (1, 1), (0, 0)),
        )[..., 0]
        empty_occ = (counts2d == 0) & (neigh > spec.empt_sur_thresh)
        smask = smask.at[:, :, :, 0].set(empty_occ.astype(jnp.float32))

    # running reductions along the range axis as matmuls with banded
    # matrices: XLA's cumsum along the minor (lane) axis lowers poorly
    # (~6ms for this 1.6M grid); (B*snz*sny, snx) @ band rides the MXU
    def _range_matmul(m, band):
        return jax.lax.dot_general(
            m.reshape(-1, snx), band,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(m.shape)

    triu = jnp.triu(jnp.ones((snx, snx), jnp.float32))
    if spec.reverse_vis == "BACK_TRACK":
        # reference `occ_targets_template.py:123-126`: beyond the LAST
        # return (reverse cumsum == 0) or at/behind the first return
        rev = _range_matmul(smask, jnp.tril(jnp.ones((snx, snx), jnp.float32)))
        occluded_sphere = (rev < 0.9) | (_range_matmul(smask, triu) > 0.9)
    elif spec.reverse_vis == "VCC":
        # reference `:111-122`: the stride//2 cells in FRONT of each
        # return are visible (range index clamped at 0); everything
        # else, returns included, is occluded
        h = (spec.dist_kern[2] + 1) // 2
        jj = jnp.arange(snx)[:, None]
        ii = jnp.arange(snx)[None, :]
        band = (((jj - ii >= 1) & (jj - ii <= h)) | ((ii == 0) & (jj <= h)))
        vis = _range_matmul(smask, band.astype(jnp.float32))
        occluded_sphere = (vis < 0.5) | (smask > 0.5)
    else:
        occluded_sphere = _range_matmul(smask, triu) > 0.9

    if spec.coord_type == "sphere":
        return occluded_sphere

    nx, ny, nz = spec.grid_size
    if spec.sphere_reproj_2d is not None:
        # azimuth-preserving map: per-azimuth one-hot matmul
        # (el, r) -> (z, r'); measured 20ms scatter -> <1ms on MXU
        m2d = jax.nn.one_hot(
            jnp.asarray(spec.sphere_reproj_2d), nz * nx, dtype=jnp.bfloat16
        )  # (snz*snx, nz*nx); -1 rows are all-zero
        # (B, snz, sny, snx) -> (B, sny, snz*snx)
        s = occluded_sphere.transpose(0, 2, 1, 3).reshape(batch_size * sny, snz * snx)
        hits = jax.lax.dot_general(
            s.astype(jnp.bfloat16), m2d,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B*sny, nz*nx)
        out = (hits > 0.5).reshape(batch_size, sny, nz, nx)
        return out.transpose(0, 2, 1, 3)  # (B, nz, ny, nx); sny == ny

    # fallback: scatter-or through the full static map
    ncell = nz * ny * nx
    smap = jnp.asarray(spec.sphere_to_grid_map)
    tgt = jnp.where(smap >= 0, smap, ncell)
    out = jnp.zeros((batch_size, ncell + 1), bool)
    out = out.at[jnp.arange(batch_size)[:, None], tgt[None, :]].max(
        occluded_sphere.reshape(batch_size, -1)
    )
    return out[:, :-1].reshape(batch_size, nz, ny, nx)


def z_filter(spec: OccGridSpec, occluded, voxelwise):
    """Reference `filter_occ:249`: keep occluded voxels above the
    per-range-column minimum observed z and inside the det z range."""
    centers_z = jnp.asarray(spec.voxel_centers_xyz[..., 2])  # (nz, ny, nx)
    B = voxelwise.shape[0]
    masked_z = jnp.where(voxelwise, centers_z[None], centers_z[None] + 100.0)
    col_min = masked_z.reshape(B, -1, masked_z.shape[-1]).min(axis=1)  # (B, nx)
    col_min = col_min - (col_min > 20.0) * 200.0
    col_min = jnp.clip(col_min, spec.det_point_cloud_range[2], None)
    above = centers_z[None] > col_min[:, None, None, :]
    below = centers_z[None] < spec.det_point_cloud_range[5]
    return occluded & above & below


def mirror_points_in_boxes_batched(
    points_xyz, valid, points_b, gt_boxes, gt_valid, mirr_flag, batch_size: int
):
    """Flat point list with per-point batch index vs batched boxes
    (reference `torch_points_and_sym_in_box_3d_batch`). Loops over the
    (small, static) batch size, masking points by frame."""
    fore = jnp.zeros(points_xyz.shape[:1], bool)
    mirr_pts = jnp.zeros_like(points_xyz)
    mirr_val = jnp.zeros(points_xyz.shape[:1], bool)
    for b in range(batch_size):
        sel = valid & (points_b == b)
        f, mp, mv = mirror_points_in_boxes(
            points_xyz, sel, gt_boxes[b], gt_valid[b], mirr_flag[b]
        )
        fore = fore | (f & sel)
        mirr_pts = jnp.where((mv & sel)[:, None], mp, mirr_pts)
        mirr_val = mirr_val | (mv & sel)
    return fore, mirr_pts, mirr_val


def mirror_points_in_boxes_blocked(
    points_xyz, valid, gt_boxes, gt_valid, mirr_flag, batch_size: int
):
    """Like `mirror_points_in_boxes_batched` but for the (universal here)
    layout where the flat point list is per-frame contiguous fixed-size
    blocks (collate concatenates capacity-padded per-frame voxel tables).
    vmap over frames: O(B * points * boxes) instead of the generic loop's
    O(B^2 * points * boxes) — the occ targets stage stopped amortizing
    with batch size because of that quadratic term."""
    n = points_xyz.shape[0]
    m = n // batch_size
    p = points_xyz.reshape(batch_size, m, 3)
    v = valid.reshape(batch_size, m)
    fore, mp, mv = jax.vmap(mirror_points_in_boxes)(
        p, v, gt_boxes, gt_valid, mirr_flag
    )
    return fore.reshape(n), mp.reshape(n, 3), mv.reshape(n)


def points_in_gt_blocked(points_xyz, valid, gt_boxes, gt_valid, batch_size: int):
    """Blocked-layout in-any-gt-box test (see
    `mirror_points_in_boxes_blocked` for the layout contract)."""
    from ...utils import box_utils

    n = points_xyz.shape[0]
    m = n // batch_size
    p = points_xyz.reshape(batch_size, m, 3)
    v = valid.reshape(batch_size, m)

    def one(p_f, v_f, gt_f, gv_f):
        hit = box_utils.points_in_boxes_mask(p_f, gt_f[:, :7])
        return jnp.any(hit & gv_f[None, :], axis=1) & v_f

    return jax.vmap(one)(p, v, gt_boxes, gt_valid).reshape(n)


def points_in_gt_batched(points_xyz, valid, points_b, gt_boxes, gt_valid, batch_size: int):
    """Flat point list in-any-gt-box test (reference
    `torch_points_in_box_3d_label_batch`)."""
    from ...utils import box_utils

    out = jnp.zeros(points_xyz.shape[:1], bool)
    for b in range(batch_size):
        sel = valid & (points_b == b)
        m = box_utils.points_in_boxes_mask(points_xyz, gt_boxes[b][:, :7])
        hit = jnp.any(m & gt_valid[b][None, :], axis=1)
        out = out | (hit & sel)
    return out


def mirror_points_in_boxes(points_xyz, valid, gt_boxes, gt_valid, mirr_flag):
    """Per frame: (N, 3) points vs (G, 8) boxes. Returns
    (fore_mask (N,), mirr_pts (N, 3), mirr_valid (N,)) -- each point
    mirrors across the local y axis of the FIRST box containing it with
    mirr_flag (reference allows multi-box duplication; first-box is an
    adequate static-shape approximation since boxes rarely overlap)."""
    from ...utils import box_utils

    inb = box_utils.points_in_boxes_mask(points_xyz, gt_boxes[:, :7])  # (N, G)
    inb = inb & gt_valid[None, :] & valid[:, None]
    fore = jnp.any(inb, axis=1)
    inb_mirr = inb & (mirr_flag[None, :] > 0.5)
    has_mirr = jnp.any(inb_mirr, axis=1)
    bidx = jnp.argmax(inb_mirr, axis=1)
    box = gt_boxes[bidx]
    # to box frame, flip local y, back to world
    d = points_xyz - box[:, 0:3]
    c, s = jnp.cos(-box[:, 6]), jnp.sin(-box[:, 6])
    lx = d[:, 0] * c - d[:, 1] * s
    ly = d[:, 0] * s + d[:, 1] * c
    lz = d[:, 2]
    ly = -ly
    c2, s2 = jnp.cos(box[:, 6]), jnp.sin(box[:, 6])
    wx = lx * c2 - ly * s2 + box[:, 0]
    wy = lx * s2 + ly * c2 + box[:, 1]
    wz = lz + box[:, 2]
    return fore, jnp.stack([wx, wy, wz], axis=-1), has_mirr
