"""Occupancy subnet: targets -> VFE -> dense backbone -> head -> PassOccVox
(reference module topology `detector3d_template.py:32`:
occ_targets -> vfe -> backbone_3d -> occ_dense_head -> occ_pnt_update).

See `occ_targets.py` for the dense target formulation. The backbone is
the dense `VoxelBackBoneDeconv`; the head (reference `occ_head_3D.py`)
is a 3x3x3 conv producing softmax occupancy logits (+ residuals when
REG), masked to `general_cls_loss_mask` for the published probability
(`occ_head_3D.forward`). PassOccVox (reference `pass_occ_vox.py`)
thresholds + top-K-caps the probabilities into occupancy points and
merges them with the raw det voxel set by re-voxelizing the union at
static capacity (`combine_gt_occ_voxel_point:262` semantics).

Note the reference's EVAL_OCC_THRESH quirk (`add_occ_template.py:100-104`):
the selection mask always uses the TRAIN threshold; only the point cap
switches at eval. Replicated deliberately (SURVEY.md §7.2b).
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import voxelizer
from ...utils import common, coords, loss_utils
from .. import backbones_3d, vfe
from . import occ_targets as T

# Tiered width for the fused merge's occ-point table (see
# `_pass_occ_vox`): skipped below this K so train (K=2048) and small
# test configs run the single full-width path. Tests monkeypatch it.
MERGE_TIER_MIN = 8192

# Tiered PER-FRAME width for the occ-voxel point chain (targets +
# occlusion scatter + VFE; see `OccSubnet.__call__`): its cost scales
# with the static voxel cap while real KITTI FOV occupancy runs well
# under the 40k eval cap. Skipped below this per-frame cap so train
# (20k, near-full) and tiny test configs pay no branch compile. Tests
# monkeypatch it.
OCC_POINT_TIER_MIN_CAPACITY = 24_000


def db_proj_expand(xyz, tail, valid, src_cell, rot_z, *,
                   det_lo, det_vs, det_grid, occ_lo, occ_vs, coord_type,
                   expand=(1.0, 5.0, 3.0), stride=(1.0, 2.5, 1.5)):
    """DB_PROJ densification (reference `add_occ_template.py:45`
    `db_proj_func`, invoked at `pass_occ_vox.py:42-43` with the
    expand/stride defaults used here). Each occ point is expanded onto a
    sub-det-cell lattice around its det cell; a candidate survives only
    if its location still maps back into the SOURCE occ voxel -- so one
    (much larger) occ voxel densifies every det cell it covers instead
    of contributing a single center point.

    xyz: (B, K, 3) world-frame occ point locations; tail: (B, K, Ct)
    feature tail copied onto every kept candidate; valid: (B, K);
    src_cell: (B, K, 3) int occ cell (x, y, z); rot_z: (B,) degrees.
    expand/stride are (z, y, x) like the reference. Returns
    ((B, K*E, 3+Ct) points, (B, K*E) valid).
    """
    offs = [np.arange(-e, e + 1, s, dtype=np.float32)
            for e, s in zip(expand, stride)]
    oz, oy, ox = np.meshgrid(*offs, indexing="ij")
    off = jnp.asarray(np.stack([ox, oy, oz], -1).reshape(1, 1, -1, 3))
    E = off.shape[2]
    B, K = valid.shape

    det_lo = jnp.asarray(det_lo, jnp.float32)
    det_vs = jnp.asarray(det_vs, jnp.float32)
    gs = jnp.asarray(det_grid, jnp.float32)
    # det cell of the (residual-shifted) point, clamped like the
    # reference's trans_voxel_grid
    c0 = jnp.clip(jnp.floor((xyz - det_lo) / det_vs), 0, gs - 1)
    cand = c0[:, :, None, :] + off                    # (B, K, E, 3) float
    loc = (cand + 0.5) * det_vs + det_lo              # candidate world xyz
    inr = jnp.all((cand >= 0) & (cand <= gs - 1), axis=-1)

    occ_loc = coords.cartesian_to_occ(loc.reshape(B, -1, 3), coord_type)
    if coord_type == "cartesian":
        occ_loc = common.rotate_points_along_z(
            occ_loc, -rot_z * (np.pi / 180.0))
    else:
        occ_loc = occ_loc.at[..., 1].add(rot_z[:, None])  # world -> sensor
    occ_lo = jnp.asarray(occ_lo, jnp.float32)
    occ_vs = jnp.asarray(occ_vs, jnp.float32)
    ocell = jnp.floor((occ_loc - occ_lo) / occ_vs).astype(jnp.int32)
    pick = jnp.all(ocell.reshape(B, K, E, 3) == src_cell[:, :, None, :], -1)
    keep = pick & inr & valid[:, :, None]

    pts = jnp.concatenate(
        [loc, jnp.broadcast_to(tail[:, :, None, :], (B, K, E, tail.shape[-1]))],
        axis=-1)
    pts = jnp.where(keep[..., None], pts, 0.0)
    return pts.reshape(B, K * E, -1), keep.reshape(B, K * E)


def real_drop_det_points(det_vox, det_num, drop_mask, rot_z, *,
                         occ_lo, occ_vs, occ_grid, coord_type):
    """REAL_DROP (reference `add_occ_template.py:38,172-184` +
    `drop_points_with_drop_mask:193`): when occ-voxel dropout is active,
    det points falling inside DROPPED occ voxels are removed from the
    raw det set too, so the det subnet genuinely does not see them (and
    the occ subnet must learn to fill them). Static shapes forbid
    deleting voxel-table rows, so a row whose points are all dropped
    keeps its (now empty) site with zero features -- the VFE's masked
    mean yields a zero feature there instead of the reference's absent
    site.

    det_vox: (B, N, P, C) world-frame voxel point slots; det_num: (B, N);
    drop_mask: (B, nz, ny, nx) bool dropped occ cells; rot_z: (B,) deg.
    Returns (det_vox, det_num) with each row prefix-compacted.
    """
    B, N, Pd, C = det_vox.shape
    nx, ny, nz = occ_grid
    xyz = det_vox[..., :3].reshape(B, N * Pd, 3)
    occ_loc = coords.cartesian_to_occ(xyz, coord_type)
    if coord_type == "cartesian":
        occ_loc = common.rotate_points_along_z(occ_loc, -rot_z * (np.pi / 180.0))
    else:
        occ_loc = occ_loc.at[..., 1].add(rot_z[:, None])  # world -> sensor
    cell = jnp.floor(
        (occ_loc - jnp.asarray(occ_lo, jnp.float32))
        / jnp.asarray(occ_vs, jnp.float32)).astype(jnp.int32)
    inr = jnp.all((cell >= 0) & (cell < jnp.asarray([nx, ny, nz])), axis=-1)
    lin = (cell[..., 2] * ny + cell[..., 1]) * nx + cell[..., 0]
    flat = drop_mask.reshape(B, -1)
    dropped = jnp.take_along_axis(flat, jnp.where(inr, lin, 0), axis=1) & inr

    slot = jnp.arange(Pd, dtype=jnp.int32)
    live = slot[None, None] < det_num[..., None]          # (B, N, Pd)
    keep = live & ~dropped.reshape(B, N, Pd)
    # prefix-compact each row (downstream assumes slots [0, num) filled)
    order = jnp.argsort(~keep, axis=-1, stable=True)
    det_vox = jnp.take_along_axis(det_vox, order[..., None], axis=2)
    keep_s = jnp.take_along_axis(keep, order, axis=2)
    det_vox = jnp.where(keep_s[..., None], det_vox, 0.0)
    return det_vox, keep.sum(-1).astype(det_num.dtype)


class OccSubnet(nn.Module):
    model_cfg: Any   # MODEL.OCC subtree
    data_cfg: Any    # DATA_CONFIG subtree (with OCC block)
    point_cloud_range: tuple  # det range
    det_voxel_size: tuple = (0.05, 0.05, 0.1)
    det_max_points_merged: int = 8
    axis_name: str | None = None
    # >0 = emit fused merge+OccVFE features (`det_voxel_features` /
    # `det_occ_code`, value = num_raw_features) instead of the
    # materialized merged point table; set by the detector when its VFE
    # is OccVFE (models/detectors/btcnet.py)
    fused_vfe_nrf: int = 0

    def setup(self):
        self.spec = T.build_grid_spec(self.data_cfg)
        occ_d = self.data_cfg.OCC
        p = self.model_cfg.PARAMS
        self.occ_thresh = float(p.OCC_THRESH)
        self.eval_occ_thresh = float(p.get("EVAL_OCC_THRESH", p.OCC_THRESH))
        self.max_occ_pnts = int(p.MAX_NUM_OCC_PNTS)
        self.eval_max_occ_pnts = int(p.get("EVAL_MAX_NUM_OCC_PNTS", p.MAX_NUM_OCC_PNTS))
        self.reg = bool(p.get("REG", False))
        self.res_num_dim = int(occ_d.get("RES_NUM_DIM", 3))
        self.code_num_dim = int(occ_d.get("CODE_NUM_DIM", 2))
        self.default_inten = float(occ_d.get("INTEN", 0.0) or 0.0)
        self.box_weight = float(occ_d.get("BOX_WEIGHT", 1.0))
        self.use_absxyz = occ_d.get("USE_ABSXYZ", "original")
        self.maxprob_vfe = bool(occ_d.get("MAX_VFE", False))
        self.dropout_rate = float(occ_d.get("DROPOUT_RATE", 0.0) or 0.0)
        # REAL_DROP defaults ON when unset (reference add_occ_template.py:38
        # `... is None or self.data_cfg.OCC.REAL_DROP`); only active while
        # dropout actually drops voxels
        rd = occ_d.get("REAL_DROP", None)
        self.real_drop = True if rd is None else bool(rd)
        self.pass_grad = bool(self.model_cfg.OCC_PNT_UPDATE.get("PASS_GRAD", False))
        self.db_proj = bool(self.model_cfg.OCC_PNT_UPDATE.get("DB_PROJ", False))
        # train-time random occ-point subsampling rate range (r1, r2)
        # (reference add_occ_template.py:43,110-117 + get_rand_range:90)
        rp = self.model_cfg.PARAMS.get("REMAIN_PERCENTAGE", None)
        self.remain_percentage = None if rp is None else (float(rp[0]), float(rp[1]))

        lw = self.model_cfg.OCC_DENSE_HEAD.LOSS_CONFIG.LOSS_WEIGHTS
        self.w = {k: float(v) for k, v in lw.items() if not isinstance(v, (list, tuple))}
        self.is_softmax = self.model_cfg.OCC_DENSE_HEAD.LOSS_CONFIG.get("CLS_LOSS_TYPE", "") == "softmax"

        # registry-name selection (reference `occ_training_targets/__init__.py`
        # / `occ_dense_heads/__init__.py`): OccTargetsPillar switches the
        # predict-area dilation to 2D BEV (reference `occ_targets_pillar.py:14`
        # create_predict_area -> create_predict_area2d); OccHead2D predicts
        # the full z column per BEV pixel with 2D convs (reference
        # `occ_head_2D.py:23-31`). The reference's pillar path is bit-rotted
        # (template/pillar signatures disagree); this is the working
        # TPU-native equivalent of its intent.
        self.targets_name = self.model_cfg.get("TARGETS", {}).get("NAME", "OccTargets3D")
        if self.targets_name not in ("OccTargets3D", "OccTargetsPillar"):
            raise KeyError(f"unknown occ TARGETS.NAME {self.targets_name!r}")
        self.head_name = self.model_cfg.OCC_DENSE_HEAD.get("NAME", "OccHead3D")
        if self.head_name not in ("OccHead3D", "OccHead2D"):
            raise KeyError(f"unknown OCC_DENSE_HEAD.NAME {self.head_name!r}")

        # OCC-side VFE is ALWAYS the plain mean: the reference routes
        # MAX_VFE only to the det-side VFE (`build_vfe`'s `if not occ:`
        # guard, detector3d_template.py:160-162), and even there OccVFE
        # never reads its maxprob kwarg — MAX_VFE is dead config in the
        # flagship. We previously enabled maxprob here; the full-forward
        # golden chain (tests/test_golden_full.py) caught the mismatch
        # at the occ backbone input.
        self.vfe = vfe.MeanVFE(num_raw_features=4, maxprob=False)
        bb_name = self.model_cfg.get("BACKBONE_3D", {}).get(
            "NAME", "VoxelBackBoneDeconv")
        bb_cls = {
            "VoxelBackBoneDeconv": backbones_3d.VoxelBackBoneDeconv,
            "VoxelBackBoneDeconvRes": backbones_3d.VoxelBackBoneDeconvRes,
            "VoxelBackBoneInverseRes": backbones_3d.VoxelBackBoneInverseRes,
        }[bb_name]
        self.backbone = bb_cls(
            input_channels=4, axis_name=self.axis_name, name="backbone_3d",
            channels=tuple(self.model_cfg.get("BACKBONE_3D", {}).get(
                "CHANNELS", (16, 32, 64))),
        )
        cls_ch = 2 if self.is_softmax else 1
        # focal-style prior init (RetinaNet, pi=0.01): the occupied logit
        # starts ~logit(0.01) so an untrained net predicts *sparse*
        # occupancy -- matching trained behavior (and the det head's own
        # bias init) instead of flooding PassOccVox with ~0.5-prob noise.
        # The reference leaves torch's default init here; this changes
        # nothing once trained.
        prior = float(self.model_cfg.OCC_DENSE_HEAD.get("PRIOR_PROB", 0.01))
        prior_logit = float(np.log(prior / (1.0 - prior)))

        self.cls_ch = cls_ch
        if self.head_name == "OccHead2D":
            nz = self.spec.grid_size[2]

            def cls_bias_init(key, shape, dtype=jnp.float32):
                # channels laid out [nz, cls_ch]; occupied = last of each
                b = jnp.zeros(shape, dtype).reshape(nz, cls_ch)
                return b.at[:, -1].set(prior_logit).reshape(shape)

            self.conv_cls = nn.Conv(
                nz * cls_ch, (3, 3), padding=1, use_bias=True,
                bias_init=cls_bias_init, name="conv_cls",
            )
            if self.reg:
                # reference init_weights: res conv weights ~N(0, 0.001)
                self.conv_res = nn.Conv(
                    nz * self.res_num_dim, (3, 3), padding=1, use_bias=False,
                    kernel_init=nn.initializers.normal(0.001), name="conv_res",
                )
        else:
            def cls_bias_init(key, shape, dtype=jnp.float32):
                b = jnp.zeros(shape, dtype)
                return b.at[-1].set(prior_logit)  # last channel = occupied

            self.conv_cls = nn.Conv(
                cls_ch, (3, 3, 3), padding=1, use_bias=True,
                bias_init=cls_bias_init, name="conv_cls",
            )
            if self.reg:
                self.conv_res = nn.Conv(
                    self.res_num_dim, (3, 3, 3), padding=1, use_bias=False, name="conv_res"
                )

    def __call__(self, batch: dict, train: bool = False):
        spec = self.spec
        nx, ny, nz = spec.grid_size
        voxels = batch["occ_voxels"]              # (N, P, 4) world-frame uvd + inten
        vcoords = batch["occ_voxel_coords"]       # (N, 4) (b, z, y, x)
        vnum = batch["occ_voxel_num_points"]      # (N,)
        gt_boxes = batch["gt_boxes"]              # (B, G, 8)
        rot_z = batch.get("rot_z")
        B = gt_boxes.shape[0]
        if rot_z is None:
            rot_z = jnp.zeros((B,), jnp.float32)
        mirr_flag = batch.get(
            "box_mirr_flag", jnp.ones(gt_boxes.shape[:2], jnp.float32)
        )

        N, P, C = voxels.shape

        # voxel dropout augmentation (reference `occ_targets_template.py`
        # dropout:305-328): per-frame ratio r~U(0,DROPOUT_RATE), then
        # int(n*r) rows sampled with replacement are zeroed before the
        # VFE; masks keep the rows as "observed". Static-shape version:
        # per-row bernoulli at the same expected fraction.
        drop_rows = None
        if train and self.dropout_rate > 1e-3:
            r_rng, d_rng = jax.random.split(self.make_rng("dropout"))
            ratios = jax.random.uniform(r_rng, (B,), maxval=self.dropout_rate)
            drop_rows = (
                jax.random.uniform(d_rng, (vcoords.shape[0],))
                < ratios[jnp.clip(vcoords[:, 0], 0, B - 1)]
            ) & (vcoords[:, 0] >= 0)

        def point_chain(vox_w, vc_w, vn_w, drop_w):
            """Targets + VFE + dense scatter at an occ-voxel table width.
            Every output is a dense (B, nz, ny, nx[, C]) grid (or None),
            so prefix widths >= the per-frame nnz produce IDENTICAL
            results: rows beyond nnz are padding (b < 0) that no-ops in
            every scatter and zeroes out of the VFE."""
            P_w = vox_w.shape[1]
            slot_w = jnp.arange(P_w)[None, :] < vn_w[:, None]
            cvalid = vc_w[:, 0] >= 0
            slot_w = slot_w & cvalid[:, None]
            pts_abs_w = coords.occ_uvd_to_absxyz(
                vox_w[..., 0], vox_w[..., 1], vox_w[..., 2], spec.coord_type
            )
            occ_pnts_w = jnp.concatenate([pts_abs_w, vox_w[..., 3:]], axis=-1)
            vfe_w = occ_pnts_w if self.use_absxyz in (True, "absxyz") else vox_w
            if self.use_absxyz == "both":
                vfe_w = jnp.concatenate([pts_abs_w, vox_w], axis=-1)
            tgt = self._make_targets(
                occ_pnts_w, slot_w, vc_w, gt_boxes, mirr_flag, batch, rot_z,
                B, train, drop_rows=drop_w,
            )
            if drop_w is not None:
                vfe_w = jnp.where(drop_w[:, None, None], 0.0, vfe_w)
            feat = self.vfe(vfe_w, jnp.where(cvalid, vn_w, 0))
            ncell = nz * ny * nx
            lin = (vc_w[:, 1] * ny + vc_w[:, 2]) * nx + vc_w[:, 3]
            idx = jnp.where(cvalid, vc_w[:, 0] * ncell + lin, B * ncell)
            dense = jnp.zeros(
                (B * ncell + 1, feat.shape[-1]), feat.dtype
            ).at[idx].set(jnp.where(cvalid[:, None], feat, 0.0))[:-1].reshape(
                B, nz, ny, nx, -1)
            return tgt, dense

        # Width tiering of the POINT-side chain (the occlusion scatter,
        # point-in-box and VFE costs scale with the static occ voxel cap,
        # not live occupancy; real KITTI FOV runs ~16k of the 40k eval
        # cap). Voxel rows are per-frame contiguous [valid | pad] blocks
        # (collate contract, same layout mirror_points_in_boxes_blocked
        # relies on), so a per-frame prefix >= the max per-frame nnz is
        # exact. lax.cond (not nn.cond) is safe here: the chain creates
        # no flax variables and draws no rngs at eval.
        cap_pf = N // B
        if (train or drop_rows is not None or self.is_initializing()
                or cap_pf < OCC_POINT_TIER_MIN_CAPACITY):
            targets, dense = point_chain(voxels, vcoords, vnum, drop_rows)
        else:
            vox_b = voxels.reshape(B, cap_pf, P, C)
            vc_b = vcoords.reshape(B, cap_pf, 4)
            vn_b = vnum.reshape(B, cap_pf)
            nnz_pf = jnp.max(jnp.sum(vc_b[:, :, 0] >= 0, axis=1))

            def rup(w):
                return -(-w // 1024) * 1024

            tiers = list(dict.fromkeys(
                w for w in (rup(cap_pf // 4), rup(cap_pf // 2))
                if w < cap_pf))

            def at_width(W):
                def f():
                    if W >= cap_pf:
                        return point_chain(voxels, vcoords, vnum, None)
                    return point_chain(
                        vox_b[:, :W].reshape(B * W, P, C),
                        vc_b[:, :W].reshape(B * W, 4),
                        vn_b[:, :W].reshape(B * W), None)
                return f

            def chain(i):
                if i == len(tiers):
                    return at_width(cap_pf)
                return lambda: jax.lax.cond(
                    nnz_pf <= tiers[i], at_width(tiers[i]), chain(i + 1))

            targets, dense = chain(0)()

        x, mask = self.backbone(dense, targets["voxelwise_mask"], train=train)
        if self.head_name == "OccHead2D":
            # fold z into channels, predict the full column per BEV pixel
            # with 2D convs (reference `occ_head_2D.dim_transfrom` semantics
            # at stride 1), unfold back to (B, nz, ny, nx, ch)
            Bx, nzx, nyx, nxx, Cx = x.shape
            bev = x.transpose(0, 2, 3, 1, 4).reshape(Bx, nyx, nxx, nzx * Cx)
            logits = self.conv_cls(bev).reshape(
                Bx, nyx, nxx, nzx, self.cls_ch
            ).transpose(0, 3, 1, 2, 4)
        else:
            logits = self.conv_cls(x)
        if self.is_softmax:
            prob = jax.nn.softmax(logits, axis=-1)[..., -1]
        else:
            prob = jax.nn.sigmoid(logits[..., -1])
        masked_prob = prob * targets["general_cls_loss_mask"].astype(prob.dtype)

        out = dict(targets)
        out["probs"] = masked_prob
        if self.reg:
            if self.head_name == "OccHead2D":
                Bx, nzx, nyx, nxx, Cx = x.shape
                bev = x.transpose(0, 2, 3, 1, 4).reshape(Bx, nyx, nxx, nzx * Cx)
                res_pred = self.conv_res(bev).reshape(
                    Bx, nyx, nxx, nzx, self.res_num_dim
                ).transpose(0, 3, 1, 2, 4)
            else:
                res_pred = self.conv_res(x)  # (B, nz, ny, nx, 3)
            out["res_pred"] = res_pred
        else:
            res_pred = None

        if train:
            out["loss"] = self._get_loss(logits, res_pred, targets)

        # ---- PassOccVox
        self._pass_occ_vox(batch, out, masked_prob, res_pred, rot_z, B, train)

        if not self.pass_grad:
            for k in ("det_voxels", "det_voxel_features", "det_occ_code",
                      "occ_points"):
                if k in out:
                    out[k] = jax.lax.stop_gradient(out[k])
        return out

    # ------------------------------------------------------------ targets

    def _make_targets(self, occ_pnts, slot_mask, vcoords, gt_boxes, mirr_flag, batch, rot_z, B, train, drop_rows=None):
        spec = self.spec
        nx, ny, nz = spec.grid_size
        grid = (nx, ny, nz)
        centers = jnp.asarray(spec.voxel_centers_xyz)

        voxelwise = T.scatter_mask(vcoords, vcoords[:, 0] >= 0, B, grid)
        if self.targets_name == "OccTargetsPillar":
            # pillar predict area (reference `occ_targets_pillar.py:14`):
            # dilate the BEV occupancy footprint in (y, x) only and apply
            # it to the whole z column
            bev = jnp.any(voxelwise, axis=1, keepdims=True)  # (B, 1, ny, nx)
            kz, ky, kx = spec.dist_kern
            vcc2d = T.dilate_predict_area(bev, (1, ky, kx), spec.concede_x)
            vcc = jnp.broadcast_to(vcc2d, voxelwise.shape)
        else:
            vcc = T.dilate_predict_area(voxelwise, spec.dist_kern, spec.concede_x)

        # flat point list
        N, P, _ = occ_pnts.shape
        pts = occ_pnts[..., :3].reshape(N * P, 3)
        pvalid = slot_mask.reshape(N * P)
        pb = jnp.repeat(vcoords[:, 0], P)
        pb = jnp.where(pvalid, pb, 0)
        pcoords = jnp.repeat(vcoords, P, axis=0)  # (N*P, 4)

        occluded = T.occlusion_mask(spec, pts, pvalid, pb, rot_z, B)
        occluded = T.z_filter(spec, occluded, voxelwise)

        # fore / mirror, per frame
        gt7 = gt_boxes[..., :7]
        gt_valid = gt_boxes[..., 7] > 1e-2

        # voxel rows are per-frame contiguous capacity blocks (collate
        # contract) -> blocked vmap instead of the O(B^2) frame loop
        fore_p, mirr_pts, mirr_val = T.mirror_points_in_boxes_blocked(
            pts, pvalid, gt_boxes, gt_valid, mirr_flag, B
        )

        fore_mask = T.scatter_mask(pcoords, fore_p, B, grid)
        fore_res = T.scatter_mean_res(
            pts, pcoords, fore_p, self._centers_world(rot_z, B), B, grid
        ) if train else None

        mirr_occ = T.world_to_occ_coords(mirr_pts, rot_z[pb], spec)
        mirr_cell, mirr_inr = T.points_to_grid_coords(mirr_occ, spec)
        mirr_coords = jnp.concatenate(
            [pb[:, None], mirr_cell[:, ::-1]], axis=1
        )  # (b, z, y, x)
        mirr_ok = mirr_val & mirr_inr
        mirr_mask = T.scatter_mask(mirr_coords, mirr_ok, B, grid)
        mirr_mask = mirr_mask & ~voxelwise
        if train:
            mirr_res = T.scatter_mean_res(
                mirr_pts, mirr_coords, mirr_ok, self._centers_world(rot_z, B), B, grid
            )
            mirr_res = mirr_res * (~voxelwise[..., None])
        else:
            mirr_res = None

        # bm points
        bm_pts = batch.get("bm_points")
        if bm_pts is not None:
            bm_mask_in = batch["bm_points_mask"]  # (B, Nbm)
            Bb, Nbm, _ = bm_pts.shape
            bmp = bm_pts.reshape(B * Nbm, 3)
            bmb = jnp.repeat(jnp.arange(B, dtype=jnp.int32), Nbm)
            bmv = bm_mask_in.reshape(B * Nbm)
            in_gt = T.points_in_gt_blocked(bmp, bmv, gt_boxes, gt_valid, B)
            bm_occ = T.world_to_occ_coords(bmp, rot_z[bmb], spec)
            bm_cell, bm_inr = T.points_to_grid_coords(bm_occ, spec)
            bm_coords = jnp.concatenate([bmb[:, None], bm_cell[:, ::-1]], axis=1)
            bm_ok = in_gt & bm_inr
            bm_mask = T.scatter_mask(bm_coords, bm_ok, B, grid)
            excl = (~voxelwise) & (~mirr_mask)
            bm_mask = bm_mask & excl
            if train:
                bm_res = T.scatter_mean_res(
                    bmp, bm_coords, bm_ok, self._centers_world(rot_z, B), B, grid
                )
                bm_res = bm_res * excl[..., None]
            else:
                bm_res = None
        else:
            bm_mask = jnp.zeros_like(voxelwise)
            bm_res = jnp.zeros(voxelwise.shape + (3,), jnp.float32) if train else None

        # forebox label (BOX_WEIGHT != 1); loss-only, so skipped at eval
        forebox = None
        if self.box_weight != 1.0 and train:
            cw = self._centers_world(rot_z, B)  # (B, nz, ny, nx, 3)

            def boxes_of(cw_f, gt_f, gv_f):
                from ...utils import box_utils
                m = box_utils.points_in_boxes_mask(cw_f.reshape(-1, 3), gt_f[:, :7])
                return jnp.any(m & gv_f[None, :], axis=1).reshape(nz, ny, nx)

            forebox = jax.vmap(boxes_of)(cw, gt_boxes, gt_valid)

        # loss maps (reference prepare_cls_loss_map / prepare_reg_loss_map)
        general_cls = vcc & occluded
        fore_cls = fore_mask & general_cls
        mirr_cls = mirr_mask & general_cls
        bm_cls = bm_mask & general_cls
        pos = fore_cls | mirr_cls | bm_cls
        neg = general_cls & ~pos
        w = self.w
        drop_mask = fore_drop = None
        if drop_rows is not None:
            drop_mask = T.scatter_mask(vcoords, drop_rows, B, grid)
            fore_drop = fore_mask & drop_mask
        if train:
            cls_f = (
                fore_cls * w["occ_fore_cls_weight"]
                + mirr_cls * w["occ_mirr_cls_weight"]
                + bm_cls * w["occ_bm_cls_weight"]
                + neg * w["occ_neg_cls_weight"]
            ).astype(jnp.float32)
            # dropped-foreground voxel up-weighting (reference
            # prepare_cls/reg_loss_map `occ_targets_template.py:342-343,393`)
            if fore_drop is not None and w.get("fore_dropout_cls_weight", 0.0) > 1e-4:
                cls_f = cls_f + (general_cls & fore_drop) * w["fore_dropout_cls_weight"]
            if forebox is not None:
                cls_f = cls_f + (neg & forebox) * (self.box_weight - w["occ_neg_cls_weight"])

            reg_f = (
                fore_cls * w.get("occ_fore_res_weight", 0.1)
                + mirr_cls * w.get("occ_mirr_res_weight", 0.1)
                + bm_cls * w.get("occ_bm_res_weight", 0.1)
            ).astype(jnp.float32)
            reg_m = reg_f > 0
            if fore_drop is not None and w.get("fore_dropout_reg_weight", 0.0) > 1e-4:
                reg_f = reg_f + (reg_m & fore_drop) * w["fore_dropout_reg_weight"]
            res_mtrx = (fore_res + mirr_res + bm_res) * reg_m[..., None]
        else:
            # Loss-weight maps and residual targets feed only the training
            # loss (reference prepare_cls/reg_loss_map run at eval too, but
            # their outputs are unused there); skip them to keep the eval
            # step lean. pos/neg masks stay: eval P/R/F1 diagnostics read
            # them (train/eval_utils.py).
            cls_f = reg_f = res_mtrx = None
            reg_m = None

        return {
            "voxelwise_mask": voxelwise,
            "vcc_mask": vcc,
            "occ_voxelwise_mask": occluded,
            "fore_voxelwise_mask": fore_mask,
            "mirr_voxelwise_mask": mirr_mask,
            "bm_voxelwise_mask": bm_mask,
            "pos_mask": pos,
            "neg_mask": neg,
            "general_cls_loss_mask": general_cls,
            "general_cls_loss_mask_float": cls_f,
            "general_reg_loss_mask": reg_m,
            "general_reg_loss_mask_float": reg_f,
            "res_mtrx": res_mtrx,
            "voxel_drop_mask": drop_mask,
            "fore_voxel_drop_mask": fore_drop,
            "forebox_label": forebox,  # box-interior weight mask (BOX_VIEW)
        }

    def _centers_world(self, rot_z, B):
        """Occ voxel centers in the (rotated) world frame per batch elem
        (reference `get_voxel_center_xyz` with rot=True)."""
        spec = self.spec
        c = jnp.asarray(spec.voxel_centers_xyz)  # sensor frame (nz, ny, nx, 3)
        if spec.coord_type == "cartesian":
            flat = c.reshape(1, -1, 3)
            rot = jnp.broadcast_to(flat, (B,) + flat.shape[1:])
            from ...utils import common
            return common.rotate_points_along_z(rot, rot_z * (np.pi / 180.0)).reshape(
                (B,) + c.shape
            )
        # cylinder/sphere: azimuth shift on the uvd center then convert;
        # equivalently rotate the cartesian center by +rot_z
        from ...utils import common
        flat = jnp.broadcast_to(c.reshape(1, -1, 3), (B, c.size // 3, 3))
        return common.rotate_points_along_z(flat, rot_z * (np.pi / 180.0)).reshape(
            (B,) + c.shape
        )

    # ------------------------------------------------------------- loss

    def _get_loss(self, logits, res_pred, targets):
        mask = targets["general_cls_loss_mask"]
        wf = targets["general_cls_loss_mask_float"]
        pos = targets["pos_mask"].astype(logits.dtype)
        if self.is_softmax:
            onehot = jnp.stack([1.0 - pos, pos], axis=-1)
            el = loss_utils.softmax_focal_loss(logits, onehot, alpha=1.0, gamma=2.0)
        else:
            el = loss_utils.sigmoid_focal_loss(
                logits[..., -1], pos, alpha=self.w.get("cls_alpha", 0.25)
            )
        el = el * wf * mask
        cls_loss = el.sum() / jnp.clip((wf * mask).sum(), 1.0, None)
        cls_loss = cls_loss * self.w.get("occ_fore_cls_weight", 1.0)
        loss = cls_loss
        if self.reg and res_pred is not None:
            rm = targets["general_reg_loss_mask"]
            rf = targets["general_reg_loss_mask_float"]
            diff = res_pred - targets["res_mtrx"]
            rl = loss_utils.smooth_l1_loss(diff, beta=self.w.get("res_beta", 0.025))
            rl = (rl.sum(-1) * rf * rm).sum() / jnp.clip((rf * rm).sum(), 1.0, None)
            loss = loss + rl * self.w.get("occ_fore_res_weight", 0.1)
        return loss

    # ------------------------------------------------------- PassOccVox

    def _pass_occ_vox(self, batch, out, masked_prob, res_pred, rot_z, B, train):
        spec = self.spec
        nx, ny, nz = spec.grid_size
        K = self.max_occ_pnts if train else self.eval_max_occ_pnts
        use_gate = batch.get("use_occ_prob", jnp.ones((B,), bool))

        flat = masked_prob.reshape(B, -1)
        sel = jnp.where(flat > self.occ_thresh, flat, 0.0)  # train thresh always
        if train and self.remain_percentage is not None:
            # keep each candidate w.p. ~U(r2, r1), one rate per frame
            # (reference add_occ_template.py:110-117: a fresh
            # get_rand_range draw inside the per-frame loop)
            r1, r2 = self.remain_percentage
            rate_rng, use_rng = jax.random.split(self.make_rng("sampling"))
            rates = jax.random.uniform(rate_rng, (B, 1), minval=min(r1, r2),
                                       maxval=max(r1, r2))
            sel = jnp.where(jax.random.uniform(use_rng, sel.shape) <= rates,
                            sel, 0.0)
        K = min(K, flat.shape[1])
        # exact lax.top_k wins at every K here (at K=40000 over 295k
        # cells: top_k 5.7 ms vs full argsort 51 ms vs radix-select
        # compaction 24 ms -- tools/microbench_topk.py)
        top_prob, top_idx = jax.lax.top_k(sel, K)
        valid = (top_prob > 0) & use_gate[:, None]

        zc = top_idx // (ny * nx)
        yc = (top_idx - zc * (ny * nx)) // nx
        xc = top_idx - zc * (ny * nx) - yc * nx
        pcr = spec.point_cloud_range
        vs = spec.voxel_size
        cu = pcr[0] + (xc.astype(jnp.float32) + 0.5) * vs[0]
        cv = pcr[1] + (yc.astype(jnp.float32) + 0.5) * vs[1]
        cd = pcr[2] + (zc.astype(jnp.float32) + 0.5) * vs[2]
        if spec.coord_type == "cartesian":
            from ...utils import common
            xyz = jnp.stack([cu, cv, cd], -1)
            xyz = common.rotate_points_along_z(xyz, rot_z * (np.pi / 180.0))
        else:
            cv = cv - rot_z[:, None]  # sensor -> world azimuth
            xyz = coords.occ_uvd_to_absxyz(cu, cv, cd, spec.coord_type)  # (B, K, 3)
        if self.reg and res_pred is not None:
            res_flat = res_pred.reshape(B, -1, self.res_num_dim)
            res_sel = jnp.take_along_axis(res_flat, top_idx[..., None], axis=1)
            xyz = xyz + res_sel[..., :3]

        occ_points = jnp.concatenate([xyz, top_prob[..., None]], axis=-1)  # (B, K, 4)
        occ_points = jnp.where(valid[..., None], occ_points, 0.0)
        out["occ_points"] = occ_points
        out["occ_points_mask"] = valid

        # merge with the det voxel point set, re-voxelize at static capacity
        det_voxels = batch["det_voxels"]          # (Nd, Pd, Cd)
        det_coords = batch["det_voxel_coords"]
        det_num = batch["det_voxel_num_points"]
        Nd, Pd, Cd = det_voxels.shape
        per_frame_vox = Nd // B

        inten = jnp.full(occ_points.shape[:-1] + (1,), self.default_inten, jnp.float32)
        pad_feats = [inten]
        if Cd > 4:
            pad_feats.append(jnp.zeros_like(inten))
        occ_feats = [xyz, *pad_feats, top_prob[..., None]]
        if self.code_num_dim > 1:
            occ_feats.append(jnp.ones_like(top_prob[..., None]))
        occ_pts6 = jnp.concatenate(occ_feats, axis=-1)
        occ_pts6 = jnp.where(valid[..., None], occ_pts6, 0.0)

        merge_pts, merge_valid = occ_pts6, valid
        if self.db_proj:
            # DB_PROJ expansion feeds only the MERGE (the reference sets
            # batch_dict["occ_pnts"] -- the ConvHead occ_points source --
            # before db_proj_func runs, pass_occ_vox.py:36-43)
            p = self.model_cfg.OCC_PNT_UPDATE
            merge_pts, merge_valid = db_proj_expand(
                xyz, occ_pts6[..., 3:], valid,
                jnp.stack([xc, yc, zc], axis=-1), rot_z,
                det_lo=self.point_cloud_range[:3], det_vs=self.det_voxel_size,
                det_grid=voxelizer.compute_grid_size(
                    self.point_cloud_range, self.det_voxel_size),
                occ_lo=spec.point_cloud_range[:3], occ_vs=spec.voxel_size,
                coord_type=spec.coord_type,
                expand=tuple(p.get("DB_PROJ_EXPAND", (1.0, 5.0, 3.0))),
                stride=tuple(p.get("DB_PROJ_STRIDE", (1.0, 2.5, 1.5))),
            )

        # ---- incremental merge -------------------------------------------
        # The reference re-voxelizes the union of raw det points + occ
        # points (`combine_gt_occ_voxel_point`, torch.unique + scatter
        # pad). Re-voxelizing ~140k point slots per frame costs a 140k
        # sort; but the det table is ALREADY voxelized and key-sorted, so
        # we only voxel-bin the K occ points (one 40k sort), binary-search
        # their cells in the det key table, append hits into existing
        # voxel slots, and give misses a fresh capacity-bounded block.
        #
        # Static capacity: per_frame_vox + extra. K//4 headroom assumes
        # occ points share det voxels ~4:1 -- override via
        # OCC_PNT_UPDATE.MERGED_CAP_EXTRA for trained models that emit
        # many isolated occupancy points.
        # default headroom stays K//4 even under DB_PROJ (a lattice-
        # expanded candidate set would otherwise inflate static merge +
        # det-backbone capacity ~E-fold); set MERGED_CAP_EXTRA explicitly
        # when enabling DB_PROJ
        extra = int(self.model_cfg.OCC_PNT_UPDATE.get("MERGED_CAP_EXTRA", K // 4))
        merged_cap = per_frame_vox + extra
        Pd_m = self.det_max_points_merged
        C6 = occ_pts6.shape[-1]
        nxd, nyd, nzd = voxelizer.compute_grid_size(
            self.point_cloud_range, self.det_voxel_size
        )
        lo = jnp.asarray(self.point_cloud_range[:3], jnp.float32)
        vs = jnp.asarray(self.det_voxel_size, jnp.float32)

        det_vox_b = det_voxels.reshape(B, per_frame_vox, Pd, Cd)
        det_numc_pre = jnp.clip(det_num.reshape(B, per_frame_vox), 0, Pd)
        if train and self.real_drop and out.get("voxel_drop_mask") is not None:
            det_vox_b, det_numc_pre = real_drop_det_points(
                det_vox_b, det_numc_pre, out["voxel_drop_mask"], rot_z,
                occ_lo=spec.point_cloud_range[:3], occ_vs=spec.voxel_size,
                occ_grid=spec.grid_size, coord_type=spec.coord_type,
            )
        det_coords_b = det_coords.reshape(B, per_frame_vox, 4)
        det_numc = det_numc_pre

        if self.fused_vfe_nrf > 0:
            # fused merge + OccVFE (ops/voxelizer.py): the merged point
            # table's only consumer is the det VFE reduction, so skip
            # materializing it and scatter per-voxel sums/counts/maxes
            fused = functools.partial(
                voxelizer.merge_points_into_voxel_features,
                grid_size=(nxd, nyd, nzd), lo=lo, vs=vs,
                extra=extra, max_points=Pd_m,
                num_raw_features=self.fused_vfe_nrf,
            )
            # Tiered occ-point width: the table is capacity-padded
            # (eval K=40k at reference caps vs ~3k live points on
            # trained models) and the merge's sort/scan/search all
            # scale with K. Output shapes are K-independent
            # (per_frame_vox + extra rows), and dropping rows past the
            # last valid index is exact: invalid rows carry
            # okey=INT32_MAX, sort to the end, and are excluded from
            # every kept/scan contribution (regression:
            # tests/test_voxelizer.py::test_fused_merge_tier_truncation
            # _is_exact). Batch-level cond like the tiered ball query
            # (ops/group_ops.py multi_ball_query).
            K_m = merge_pts.shape[1]
            tiers_m = ([t for t in (4096, 16384) if t < K_m]
                       if K_m >= MERGE_TIER_MIN else [])
            iota_k = jnp.arange(K_m, dtype=jnp.int32)
            nvalid_m = jnp.max(jnp.where(merge_valid, iota_k[None, :], -1)) + 1

            def run_merge(W):
                return lambda: jax.vmap(fused)(
                    det_vox_b, det_coords_b, det_numc,
                    merge_pts[:, :W], merge_valid[:, :W])

            def chain_m(i):
                if i == len(tiers_m):
                    return run_merge(K_m)
                return lambda: jax.lax.cond(
                    nvalid_m <= tiers_m[i], run_merge(tiers_m[i]),
                    chain_m(i + 1))

            feat, occ_code, num, coords_zyx, row_valid = chain_m(0)()
            out["det_voxel_features"] = jnp.where(
                row_valid[..., None], feat, 0.0).reshape(B * merged_cap, -1)
            out["det_occ_code"] = jnp.where(
                row_valid[..., None], occ_code, 0.0).reshape(B * merged_cap, -1)
        else:
            det_vox6 = jnp.concatenate([
                det_vox_b,
                jnp.zeros(det_vox_b.shape[:-1] + (C6 - Cd,), det_vox_b.dtype),
            ], axis=-1)
            # pad point slots Pd -> Pd_m (extra slots receive occ points)
            det_vox6 = jnp.concatenate([
                det_vox6,
                jnp.zeros((B, per_frame_vox, Pd_m - Pd, C6), det_vox6.dtype),
            ], axis=2)

            merge_fn = {
                "v1": voxelizer.merge_points_into_voxels,
                "v2": voxelizer.merge_points_into_voxels_v2,  # single-sort
            }[self.model_cfg.OCC_PNT_UPDATE.get("MERGE_IMPL", "v1")]
            merge = functools.partial(
                merge_fn,
                grid_size=(nxd, nyd, nzd), lo=lo, vs=vs,
                extra=extra, max_points=Pd_m,
            )
            vox, num, coords_zyx, row_valid = jax.vmap(merge)(
                det_vox6, det_coords_b, det_numc, merge_pts, merge_valid
            )
            out["det_voxels"] = vox.reshape(B * merged_cap, Pd_m, -1)

        bidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32)[:, None], merged_cap, axis=1)
        bcol = jnp.where(row_valid[..., None], bidx[..., None], -1)
        coords_zyx = jnp.where(row_valid[..., None], coords_zyx, -1)
        coords4 = jnp.concatenate([bcol, coords_zyx], axis=-1).reshape(B * merged_cap, 4)
        out["det_voxel_coords"] = coords4
        out["det_voxel_num_points"] = jnp.where(
            row_valid, num, 0).reshape(B * merged_cap)
