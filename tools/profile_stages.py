"""Stage-by-stage latency profile of the flagship model on the current
device. Each stage is jitted separately and timed with forced
device_get syncs (block_until_ready is unreliable over the tunneled
transport)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from btcdet_tpu.config import cfg_from_yaml_file
from btcdet_tpu.datasets import make_synthetic_batch
from btcdet_tpu.models import build_network
from btcdet_tpu.models.detectors.btcnet import post_processing
from btcdet_tpu.ops import sparse
from btcdet_tpu.models import vfe as vfe_mod


# v5e single-chip peaks for the roofline columns (public spec:
# 197 TFLOP/s bf16 on the MXU, 819 GB/s HBM bandwidth)
PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_GBS = 819.0
COST = os.environ.get("PROFILE_COST", "") == "1"


def _cost_analysis(compiled):
    """flops + bytes from XLA's cost model for a compiled executable
    (VERDICT r3 next #8: make 'near SOL' a measurement, not a claim)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def timeit(name, fn, *args, iters=5):
    # fetch a SCALAR, not the stage output: device_get of a multi-MB
    # array pays ~4.8 ms/MB tunnel transfer and corrupts the timing
    @jax.jit
    def red(*a):
        leaves = jax.tree_util.tree_leaves(fn(*a))
        return sum(l.sum().astype(jnp.float32) for l in leaves if hasattr(l, "dtype"))

    flops = byts = 0.0
    if COST:
        compiled = red.lower(*args).compile()
        flops, byts = _cost_analysis(compiled)
        red = compiled

    _ = jax.device_get(red(*args))  # compile+sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = red(*args)
    _ = jax.device_get(out)
    dt = (time.perf_counter() - t0) / iters
    if COST and (flops or byts):
        tf = flops / dt / 1e12
        gbs = byts / dt / 1e9
        # roofline: attainable TFLOP/s at this arithmetic intensity
        ai = flops / max(byts, 1.0)
        attain = min(PEAK_BF16_TFLOPS, ai * PEAK_HBM_GBS / 1e3)
        print(f"{name:30s} {dt*1000:9.1f} ms  {flops/1e9:8.1f} GF "
              f"{byts/1e9:7.2f} GB  {tf:6.2f} TF/s ({100*tf/PEAK_BF16_TFLOPS:4.1f}% MXU) "
              f"{gbs:6.1f} GB/s ({100*gbs/PEAK_HBM_GBS:4.1f}% HBM) "
              f"{100*tf/max(attain,1e-9):5.1f}% of roofline", flush=True)
    else:
        print(f"{name:30s} {dt*1000:9.1f} ms", flush=True)
    return out


def main(mode="test", batch_size=1, occ_vox_cap=0, det_vox_cap=0):
    cfg = cfg_from_yaml_file("tools/cfgs/model_configs/btcdet_kitti_car.yaml")
    for proc in cfg.DATA_CONFIG.DATA_PROCESSOR:
        if occ_vox_cap and proc.NAME == "transform_points_to_sphere_voxels":
            proc.MAX_NUMBER_OF_VOXELS[mode] = occ_vox_cap
        if det_vox_cap and proc.NAME == "det_transform_points_to_voxels":
            proc.MAX_NUMBER_OF_VOXELS[mode] = det_vox_cap
    net = build_network(cfg.MODEL, cfg.DATA_CONFIG, cfg.CLASS_NAMES)
    batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(
        cfg.DATA_CONFIG, batch_size, 16384, 10, mode=mode).items()}
    rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = jax.jit(lambda r, b: net.init(r, b, train=False))(rngs, batch)
    print("params ready", flush=True)

    # full model
    @jax.jit
    def full(v, b):
        out = net.apply(v, b, train=False)
        return post_processing(out, cfg.MODEL.POST_PROCESSING, 1)["pred_scores"]

    timeit("FULL eval forward", full, variables, batch, iters=3)

    # prefix probes: returning an intermediate lets XLA DCE the tail, so
    # deltas between these are trustworthy stage costs (the standalone
    # stage probes below re-enter the model and carry extra overhead)
    def prefix(key):
        @jax.jit
        def f(v, b):
            return net.apply(v, b, train=False)[key]
        return f

    for key, label in [
        ("occ_probs", "occ (no merge)"),
        ("occ_points", "occ points"),
        ("encoded_features", "+merge+det 3D bb"),
        ("spatial_features", "+ height compression"),
        ("spatial_features_2d", "+ BEV 2D bb"),
        ("rpn_box_preds", "+ RPN head"),
        ("rois", "+ proposal NMS"),
        ("batch_box_preds", "+ ConvHead"),
    ]:
        timeit(f"prefix: {label}", prefix(key), variables, batch, iters=5)

    # ConvHead sub-stages via sown intermediates: each probe keeps only
    # the prefix of the head needed to produce that branch (DCE drops the
    # rest), so deltas vs the "+ proposal NMS" prefix are branch costs
    def roi_probe(name):
        @jax.jit
        def f(v, b):
            _, st = net.apply(v, b, train=False, mutable=["intermediates"])
            return st["intermediates"]["det_roi_head"][name][0]
        return f

    # branches are independent given `rois`: each probe's time is
    # (prefix up to proposal NMS) + that single branch
    for name, label in [
        ("sa_rawpoints", "ConvHead branch: SA raw"),
        ("sa_occpoints", "ConvHead branch: SA occ"),
        ("xc_pool", "ConvHead branch: xc pool"),
    ]:
        try:
            timeit(f"prefix: {label}", roi_probe(name), variables, batch, iters=5)
        except KeyError:
            pass

    # occ subnet alone
    @jax.jit
    def occ_only(v, b):
        out = net.apply(v, b, train=False, method=lambda m, bb, train: m.occ(bb, train=train))
        return out.get("det_voxel_features", out.get("det_voxels"))

    timeit("occ subnet (+merge)", occ_only, variables, batch, iters=3)

    # occ subnet sub-stage: target/mask generation alone
    from btcdet_tpu.utils import coords as coords_utils

    @jax.jit
    def occ_targets_only(v, b):
        def run(m, bb, train):
            o = m.occ
            spec = o.spec
            voxels = bb["occ_voxels"]; vcoords = bb["occ_voxel_coords"]
            vnum = bb["occ_voxel_num_points"]
            gt_boxes = bb["gt_boxes"]
            B = gt_boxes.shape[0]
            rot_z = bb.get("rot_z", jnp.zeros((B,), jnp.float32))
            mirr = bb.get("box_mirr_flag", jnp.ones(gt_boxes.shape[:2], jnp.float32))
            slot = (jnp.arange(voxels.shape[1])[None, :] < vnum[:, None]) & (vcoords[:, :1] >= 0)
            pts_abs = coords_utils.occ_uvd_to_absxyz(
                voxels[..., 0], voxels[..., 1], voxels[..., 2], spec.coord_type)
            occ_pnts = jnp.concatenate([pts_abs, voxels[..., 3:]], axis=-1)
            tgt = o._make_targets(occ_pnts, slot, vcoords, gt_boxes, mirr, bb, rot_z, B, train)
            return tgt["general_cls_loss_mask"]
        return net.apply(v, b, train=False, method=run)

    timeit("occ targets only", occ_targets_only, variables, batch, iters=3)

    # det path from merged voxels: run the occ subnet once (untimed) and
    # feed its real PassOccVox-merged voxel set, so channel counts and
    # occupancy match the in-model call exactly
    nz, ny, nx = net.det_grid_size[2] + 1, net.det_grid_size[1], net.det_grid_size[0]

    @jax.jit
    def merged_inputs(v, b):
        def run(m, bb, train):
            o = m.occ(bb, train=train)
            if "det_voxel_features" in o:  # fused merge+VFE path
                vfeat, occ_code = o["det_voxel_features"], o["det_occ_code"]
            else:
                vfeat, occ_code = m.det_vfe(
                    o["det_voxels"], o["det_voxel_num_points"])
            return vfeat, occ_code, o["det_voxel_coords"]
        return net.apply(v, b, train=False, method=run)

    mv, mo, mc = merged_inputs(variables, batch)
    b2 = dict(batch)
    b2["det_vfeat"], b2["det_occ_code"], b2["det_voxel_coords"] = mv, mo, mc

    @jax.jit
    def det_backbone(v, b):
        def run(m, b, train):
            st, occ = sparse.from_coords(
                b["det_vfeat"], b["det_voxel_coords"], (nz, ny, nx),
                batch_size, aux=b["det_occ_code"]
            )
            return m.backbone_3d(st, occ, train=train)["encoded"].features
        return net.apply(v, b, train=False, method=run)

    timeit("det 3D backbone (merged vox)", det_backbone, variables, b2, iters=3)

    # --- split rulebook construction vs gather-GEMM compute -------------
    def _run_backbone(m, b, train, cache):
        st, occ = sparse.from_coords(
            b["det_vfeat"], b["det_voxel_coords"], (nz, ny, nx), 1,
            aux=b["det_occ_code"])
        out = m.backbone_3d(st, occ, train=train, cache=cache)
        return out["encoded"].features

    static_store = {}  # name -> (static vals, is_array mask); filled at trace time
    key_store = {}     # name -> original (possibly nested-tuple) cache key

    def _is_arr(x):
        return hasattr(x, "dtype")

    @jax.jit
    def build_cache(v, b):
        cache = {}

        def run(m, bb, train):
            _ = _run_backbone(m, bb, train, cache)
            out = {}
            for k, vals in cache.items():
                if not isinstance(vals, tuple):
                    vals = tuple(vals)
                name = "|".join(str(x) for x in k)
                key_store[name] = k
                static_store[name] = (
                    tuple(x for x in vals if not _is_arr(x)),
                    tuple(_is_arr(x) for x in vals),
                )
                out[name] = tuple(x for x in vals if _is_arr(x))
            return out

        return net.apply(v, b, train=False, method=run)

    arrs = build_cache(variables, b2)
    _ = jax.device_get(jax.tree_util.tree_leaves(arrs)[0])

    def rebuild_cache(arrs):
        cache = {}
        for name, avals in arrs.items():
            stat, mask = static_store[name]
            ai, si, merged = 0, 0, []
            for is_a in mask:
                if is_a:
                    merged.append(avals[ai]); ai += 1
                else:
                    merged.append(stat[si]); si += 1
            cache[key_store[name]] = tuple(merged)
        return cache

    def timed_build(v, b):
        return build_cache(v, b)

    timeit("det rulebooks only (build_cache)", timed_build, variables, b2, iters=3)

    @jax.jit
    def apply_only(v, b, arrs):
        def run(m, bb, train):
            return _run_backbone(m, bb, train, rebuild_cache(arrs))
        return net.apply(v, b, train=False, method=run)

    timeit("det backbone compute-only", apply_only, variables, b2, arrs, iters=3)

    @jax.jit
    def rulebook_only(b):
        st = sparse.from_coords(b["det_vfeat"], b["det_voxel_coords"], (nz, ny, nx), 1)
        idx, found = sparse.subm_rulebook(st, 3)
        return idx.sum() + found.sum()

    timeit("one subm rulebook (searchsorted)", rulebook_only, b2, iters=5)

    @jax.jit
    def conv_sites(b):
        st = sparse.from_coords(b["det_vfeat"], b["det_voxel_coords"], (nz, ny, nx), 1)
        keys, coords, nnz, shape = sparse.conv_output_sites(st, 3, 2, 1, st.capacity)
        return keys.sum()

    timeit("one strided conv site-gen", conv_sites, b2, iters=5)

    # rotated NMS at proposal scale
    from btcdet_tpu.ops import iou3d as iou_mod

    A = 70400
    boxes = jnp.asarray(np.random.RandomState(0).uniform(0, 1, (A, 7)).astype(np.float32))
    boxes = boxes.at[:, 3:6].set(boxes[:, 3:6] * 3 + 1)
    scores = jnp.asarray(np.random.RandomState(1).rand(A).astype(np.float32))
    valid = jnp.ones((A,), bool)

    @jax.jit
    def nms_eval(b, s, v):
        idx, keep = iou_mod.nms_rotated(b, s, v, thresh=0.7, pre_max_size=1024, post_max_size=100)
        return idx.sum() + keep.sum()

    timeit("proposal NMS (pre=1024)", nms_eval, boxes, scores, valid, iters=5)

    @jax.jit
    def nms_train(b, s, v):
        idx, keep = iou_mod.nms_rotated(b, s, v, thresh=0.8, pre_max_size=9000, post_max_size=256)
        return idx.sum() + keep.sum()

    timeit("proposal NMS (pre=9000)", nms_train, boxes, scores, valid, iters=3)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "test",
         int(sys.argv[2]) if len(sys.argv) > 2 else 1,
         int(sys.argv[3]) if len(sys.argv) > 3 else 0,
         int(sys.argv[4]) if len(sys.argv) > 4 else 0)
