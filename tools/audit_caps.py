"""Runtime truncation / overflow audit at flagship shapes (VERDICT r1
next #4; SURVEY §7.3.1 headroom asserts).

Static capacities silently truncate when undersized. This audit runs
the flagship config on N synthetic frames and reports, as one JSON
line per mode:
  - voxelizer drops (points beyond MAX_POINTS_PER_VOXEL / voxels beyond
    MAX_NUMBER_OF_VOXELS), from the host pipeline's own bookkeeping
  - per-level strided-conv site counts measured UNCAPPED vs the shipped
    LEVEL_CAPACITIES (headroom %; negative = truncation)
  - PassOccVox occ-point count vs the cap and merge-extra utilization
  - exact Pallas fused-conv window-overflow counts for every conv call
    (via the ops.pallas_conv overflow sink)

Exit code 1 if anything truncates at the shipped caps.

Runs on CPU (the tunneled-TPU plugin lacks host callbacks; the measured
quantities are static-shape properties, identical across backends).

Usage: python tools/audit_caps.py [n_frames] [test|train]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
# always CPU: the overflow sink uses jax.debug.callback, which the
# tunneled-TPU (axon) PJRT plugin does not support; capacities and
# overflow counts are static-shape properties, identical on CPU.
# The env var must be set BEFORE jax import (config.update alone does
# not stop the axon plugin from claiming the backend here).
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from btcdet_tpu.config import cfg_from_yaml_file
from btcdet_tpu.datasets import make_synthetic_batch
from btcdet_tpu.models import build_network
from btcdet_tpu.ops import pallas_conv, sparse

UNCAPPED = 200_000  # far above any observed level count


def probe_fn(net, is_train):
    @jax.jit
    def probe(v, b):
        def run(m, bb, train):
            out = m.occ(bb, train=train) if m.use_occ else dict(bb)
            merged = {**bb, **out}
            vfeat, occ_code = m.det_vfe(
                merged["det_voxels"], merged["det_voxel_num_points"])
            nz, ny, nx = (m.det_grid_size[2] + 1, m.det_grid_size[1],
                          m.det_grid_size[0])
            st = sparse.from_coords(
                vfeat, merged["det_voxel_coords"], (nz, ny, nx),
                bb["gt_boxes"].shape[0])
            r = m.backbone_3d(st, occ_code, train=train)
            B = bb["gt_boxes"].shape[0]
            res = {
                "occ_pnts": out["occ_points_mask"].sum() if m.use_occ else 0,
                "levels": {
                    "in": st.nnz,
                    "x_conv2": r["x_conv2"].nnz,
                    "x_conv3": r["x_conv3"].nnz,
                    "x_conv4": r["x_conv4"].nnz,
                    "out": r["encoded"].nnz,
                },
            }
            if m.use_occ:
                mc = merged["det_voxel_coords"].shape[0] // B
                pf = bb["det_voxels"].shape[0] // B
                cc = merged["det_voxel_coords"].reshape(B, mc, 4)
                res["mrg_extra"] = (cc[:, pf:, 0] >= 0).sum(axis=1).max()
            return res

        if is_train:
            out, _ = net.apply(
                v, b, train=True, method=run, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(3),
                      "sampling": jax.random.PRNGKey(4)})
            return out
        return net.apply(v, b, train=False, method=run)
    return probe


def main(n_frames=4, mode="test"):
    n_frames = int(n_frames)
    is_train = mode == "train"
    cfg = cfg_from_yaml_file("tools/cfgs/model_configs/btcdet_kitti_car.yaml")
    # these diagnostics inspect the materialized merged point table
    cfg.MODEL.OCC.OCC_PNT_UPDATE["FUSED_VFE"] = False
    lc = cfg.MODEL.BACKBONE_3D.get("LEVEL_CAPACITIES")
    if hasattr(lc, "get") and not isinstance(lc, (list, tuple)):
        lc = lc.get(mode)
    shipped_caps = [int(c) for c in lc] if lc else []
    occ_cap_key = "MAX_NUM_OCC_PNTS" if is_train else "EVAL_MAX_NUM_OCC_PNTS"
    occ_cap = int(cfg.MODEL.OCC.PARAMS[occ_cap_key]) if cfg.MODEL.get("OCC") else 0

    overflow = []
    pallas_conv.set_overflow_sink(
        lambda ov, **kw: overflow.append(
            {"dropped": int(ov),
             **{k: (int(v) if not isinstance(v, str) else v)
                for k, v in kw.items() if v is not None}}))

    # uncapped run: true per-level site counts
    cfg.MODEL.BACKBONE_3D.LEVEL_CAPACITIES = [UNCAPPED] * max(len(shipped_caps), 4)
    net = build_network(cfg.MODEL, cfg.DATA_CONFIG, cfg.CLASS_NAMES)
    batch0 = {k: jnp.asarray(v) for k, v in make_synthetic_batch(
        cfg.DATA_CONFIG, 1, 16384, 10, mode=mode, seed=0).items()}
    rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = jax.jit(lambda r, b: net.init(r, b, train=is_train))(rngs, batch0)
    probe = probe_fn(net, is_train)

    level_max = {}
    occ_max = mrg_max = 0
    vox_drop_max = {"occ": 0, "det": 0}
    for i in range(n_frames):
        raw = make_synthetic_batch(cfg.DATA_CONFIG, 1, 16384, 10,
                                   mode=mode, seed=100 + i)
        # host-side voxelizer drop bookkeeping: points not binned
        for pref in ("occ", "det"):
            nv = raw.get(f"{pref}_voxel_num_points")
            if nv is not None:
                binned = int(np.sum(nv))
                total = int(np.sum(raw["points_mask"])) if "points_mask" in raw \
                    else raw["points"].shape[1]
                vox_drop_max[pref] = max(vox_drop_max[pref], total - binned)
        b = {k: jnp.asarray(v) for k, v in raw.items()}
        r = jax.device_get(probe(variables, b))
        for k, v in r["levels"].items():
            level_max[k] = max(level_max.get(k, 0), int(v))
        occ_max = max(occ_max, int(r.get("occ_pnts", 0)))
        mrg_max = max(mrg_max, int(r.get("mrg_extra", 0)))

    # shipped-cap comparison (caps are per-frame; probe runs B=1)
    cap_keys = ["x_conv2", "x_conv3", "x_conv4", "out"]
    report = {"mode": mode, "frames": n_frames, "levels": {},
              "voxelizer_dropped_points": vox_drop_max,
              "occ_points": {"max": occ_max, "cap": occ_cap},
              "merge_extra_max": mrg_max,
              "pallas_overflow_total": int(sum(o["dropped"] for o in overflow)),
              "pallas_conv_calls": len(overflow)}
    by_tag = {}
    for o in overflow:
        d = by_tag.setdefault(o.get("tag", "?"),
                              {"calls": 0, "dropped": 0, "span_max": 0,
                               "coverage": o["win"] * o["nblocks"],
                               "tile": o.get("tile", 0)})
        d["calls"] += 1
        d["dropped"] = max(d["dropped"], o["dropped"])  # worst single call
        d["span_max"] = max(d["span_max"], o.get("span_max", 0))
    report["pallas_conv_spans"] = dict(
        sorted(by_tag.items(), key=lambda kv: -kv[1]["dropped"]))
    ok = True
    for j, k in enumerate(cap_keys):
        true_n = level_max.get(k, 0)
        cap = shipped_caps[j] if j < len(shipped_caps) else None
        head = None if cap is None else round(100.0 * (cap - true_n) / max(cap, 1), 1)
        report["levels"][k] = {"true_max": true_n, "cap": cap, "headroom_pct": head}
        if cap is not None and true_n > cap:
            ok = False
    # occ points are top-k capped by construction; saturation (== cap)
    # means the threshold produced more candidates than fit -> truncation
    if occ_cap and occ_max >= occ_cap:
        ok = False
    if report["pallas_overflow_total"] > 0:
        ok = False
    report["ok"] = ok
    print(json.dumps(report))
    pallas_conv.set_overflow_sink(None)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
