"""Deterministic synthetic reference weights for the full-forward golden
chain (VERDICT r4 next #1).

Both sides of the golden test need the SAME reference state dict — the
torch generator (tools/gen_golden_full.py) loads it into the executed
reference model, and tests/test_golden_full.py feeds it through
`ref_import.map_reference_state` into our flax model. Storing ~10M
random f32 in git would cost ~40 MB, so instead each tensor is
synthesized deterministically from its NAME (crc32 seed) and shape; the
committed manifest (tests/fixtures/reference_state_dict_manifest.json)
provides the name->shape map on the test side.

Distributions: BN stats/affine are perturbed away from identity so the
running-stat math is exercised (same rationale as
tools/gen_golden_fixtures.py `_randomize`); conv/linear weights are
fan-in scaled so the 20-deep chain neither explodes nor vanishes.
"""

from __future__ import annotations

import zlib

import numpy as np


def synth_tensor(name: str, shape) -> np.ndarray:
    rs = np.random.RandomState(zlib.crc32(name.encode()) & 0xFFFFFFFF)
    shape = tuple(int(s) for s in shape)
    if name.endswith("num_batches_tracked"):
        return np.zeros(shape, np.int64)
    if name.endswith("running_var"):
        return rs.uniform(0.5, 1.5, shape).astype(np.float32)
    if name.endswith("running_mean"):
        return rs.normal(0.0, 0.3, shape).astype(np.float32)
    if len(shape) <= 1:
        if name.endswith(".weight"):  # BN gamma
            return rs.normal(1.0, 0.2, shape).astype(np.float32)
        return rs.normal(0.0, 0.05, shape).astype(np.float32)  # biases
    # conv / linear weights; co is shape[-1] for spconv layout (k,k,k,ci,co),
    # shape[0] for torch Conv/Linear layouts
    co = shape[-1] if len(shape) == 5 else shape[0]
    fan_in = int(np.prod(shape)) // co
    return rs.normal(0.0, np.sqrt(2.0 / fan_in), shape).astype(np.float32)


# tensors whose reference values are structural constants, not learned
# weights (kept at their reference-initialized values by the generator;
# ref_import ignores them on our side)
FIXED_CONSTANT_KEYS = (
    "occ_modules.occ_targets.fix_conv_2dzy.weight",
)


def synth_state_dict(manifest: dict) -> dict:
    """manifest: {name: shape_list} -> {name: np.ndarray} (fixed
    structural constants excluded)."""
    return {
        name: synth_tensor(name, shape)
        for name, shape in manifest.items()
        if name not in FIXED_CONSTANT_KEYS
    }


# ------------------------------------------------------ golden-mini config

# Shrunk scene geometry for the full-forward golden chain: flagship
# channel widths (so every manifest tensor exists and is exercised) on a
# 16 m scene small enough for dense-emulated spconv on CPU. The det
# z-chain keeps the flagship 41(+1)->21->11->5->2 strides. Values mirror
# btcdet_tpu/datasets/mini_config.py. Applied IDENTICALLY to the
# reference cfg (tools/gen_golden_full.py) and ours
# (tests/test_golden_full.py).
GOLDEN_MINI_DATA = {
    "POINT_CLOUD_RANGE": [0.0, -8.0, -3.0, 16.0, 8.0, 1.1],
    "OCC_VOXEL_SIZE": [0.5, 2.0, 0.45],
    # occ grid dims must be ≡1 (mod 4) for the reference deconv chain to
    # restore the grid exactly ((d-1)/2+1 must stay odd twice; flagship
    # 209x157x9 all satisfy this). 29 x 41 x 9 here.
    "OCC_POINT_CLOUD_RANGE": [2.0, -41.0, -2.6, 16.5, 41.0, 1.45],
    # sphere azimuth binning OFFSET by half a bin from the occ grid's, so
    # every sphere cell corner sits 1.0 deg inside a cylinder bin: the
    # reference's f32 corner roundtrip (occ_from_cylin_ocp) then truncates
    # to the same cell as exact f64 math — verified f64 == torch-f32 ==
    # numpy-f32 bitwise at this geometry. (At the flagship's SHARED
    # binning, corners sit ON boundaries and the reference's map is
    # implementation-defined at ~4% of cells — numpy-f32, torch-f32 CPU
    # and CUDA each give a different jitter set; our analytic map is the
    # bit-stable choice, see docs/PARITY_RISKS.md.)
    "SUPPORT_SPHERE_RANGE": [2.0, -42.0, -16.6, 16.5, 42.0, 4.0, 2.0],
    "DET_VOXEL_SIZE": [0.1, 0.1, 0.1],
    "DET_MAX_POINTS_PER_VOXEL": 5,
    "DET_MAX_VOXELS": 4000,
    "OCC_MAX_POINTS_PER_VOXEL": 8,
    "OCC_MAX_VOXELS": 3000,
    # model-side caps kept small so the padded CPU tables stay tiny
    "MAX_NUM_OCC_PNTS": 512,
    "NMS_PRE": 256,
    "NMS_POST": 32,
}


def apply_golden_mini(cfg, is_reference: bool):
    """Patch a loaded flagship config tree (reference EasyDict or ours —
    both are attribute-dicts) down to the golden-mini geometry."""
    g = GOLDEN_MINI_DATA
    d = cfg.DATA_CONFIG
    d.POINT_CLOUD_RANGE = list(g["POINT_CLOUD_RANGE"])
    d.OCC.VOXEL_SIZE = list(g["OCC_VOXEL_SIZE"])
    d.OCC.POINT_CLOUD_RANGE = list(g["OCC_POINT_CLOUD_RANGE"])
    d.OCC.SUPPORT_SPHERE_RANGE = list(g["SUPPORT_SPHERE_RANGE"])
    for proc in d.DATA_PROCESSOR:
        if proc.NAME == "transform_points_to_sphere_voxels":
            proc.VOXEL_SIZE = list(g["OCC_VOXEL_SIZE"])
            proc.MAX_POINTS_PER_VOXEL = g["OCC_MAX_POINTS_PER_VOXEL"]
            proc.MAX_NUMBER_OF_VOXELS = {
                "train": g["OCC_MAX_VOXELS"], "test": g["OCC_MAX_VOXELS"]}
        if proc.NAME == "det_transform_points_to_voxels":
            proc.VOXEL_SIZE = list(g["DET_VOXEL_SIZE"])
            proc.MAX_POINTS_PER_VOXEL = g["DET_MAX_POINTS_PER_VOXEL"]
            proc.MAX_NUMBER_OF_VOXELS = {
                "train": g["DET_MAX_VOXELS"], "test": g["DET_MAX_VOXELS"]}
    m = cfg.MODEL
    m.OCC.PARAMS.MAX_NUM_OCC_PNTS = g["MAX_NUM_OCC_PNTS"]
    m.OCC.PARAMS.EVAL_MAX_NUM_OCC_PNTS = g["MAX_NUM_OCC_PNTS"]
    # full headroom for the merged det+occ voxel table: random-weight occ
    # nets emit spatially-spread points, so the shipped K//4 heuristic
    # (real occ points cluster on objects) would silently truncate here
    # (ours-only key; the reference re-voxelizes without a cap)
    m.OCC.OCC_PNT_UPDATE.MERGED_CAP_EXTRA = g["MAX_NUM_OCC_PNTS"]
    m.ROI_HEAD.NMS_CONFIG.TEST.NMS_PRE_MAXSIZE = g["NMS_PRE"]
    m.ROI_HEAD.NMS_CONFIG.TEST.NMS_POST_MAXSIZE = g["NMS_POST"]
    m.POST_PROCESSING.NMS_CONFIG.NMS_PRE_MAXSIZE = g["NMS_PRE"]
    m.POST_PROCESSING.NMS_CONFIG.NMS_POST_MAXSIZE = g["NMS_POST"]
    if not is_reference:
        # ours-only keys: flagship per-level capacities are sized for the
        # real scene; shrink so CPU tables stay small (reference ignores)
        if "LEVEL_CAPACITIES" in m.BACKBONE_3D:
            del m.BACKBONE_3D["LEVEL_CAPACITIES"]
    return cfg
