"""Train-side perf tracking (VERDICT r4 next #8): time the flagship
train step (reference train caps, bs2) and the train-mode stage costs
that eval profiling cannot see — at train the occ-targets mask chain
feeds the loss, so XLA cannot DCE the metric-only masks it drops from
the eval bench.

Writes docs/runs/r5/train_profile.json. Run on the real TPU:
    python tools/profile_train.py [--batch_size 2] [--iters 5]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.chdir(Path(__file__).resolve().parent.parent)
sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp

OUT = Path("docs/runs/r5/train_profile.json")


def timeit(fn, *args, iters=5):
    r = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(r)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from btcdet_tpu.config import cfg_from_yaml_file
    from btcdet_tpu.datasets import make_synthetic_batch
    from btcdet_tpu.models import build_network
    from btcdet_tpu.train import trainer as trainer_mod

    cfg = cfg_from_yaml_file("tools/cfgs/model_configs/btcdet_kitti_car.yaml")
    net = build_network(cfg.MODEL, cfg.DATA_CONFIG, cfg.CLASS_NAMES)
    B = args.batch_size
    batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(
        cfg.DATA_CONFIG, B, 16384, 10, mode="train").items()}
    state, tx = trainer_mod.create_train_state(
        net, batch, jax.random.PRNGKey(0),
        det_opt_cfg=cfg.OPTIMIZATION, occ_opt_cfg=cfg.OCC_OPTIMIZATION,
        total_steps=100)
    res = {"batch_size": B}

    step = jax.jit(trainer_mod.make_train_step(net, tx))
    t = timeit(lambda s, b: step(s, b, jax.random.PRNGKey(1))[1]["loss"],
               state, batch, iters=args.iters)
    res["train_step_ms"] = round(t, 2)
    res["train_frames_per_sec"] = round(B / (t / 1e3), 3)

    # train-mode forward only (no grad): isolates fwd vs bwd
    rngs = {"sampling": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    fwd = jax.jit(lambda v, b: net.apply(
        v, b, train=True, rngs=rngs, mutable=["batch_stats"])[0]["loss"])
    v0 = {"params": state.params, "batch_stats": state.batch_stats}
    res["train_forward_ms"] = round(timeit(fwd, v0, batch, iters=args.iters), 2)

    # occ subnet train-mode prefix (targets chain + backbone + head +
    # merge, loss path live so no mask DCE)
    occ_fwd = jax.jit(lambda v, b: net.apply(
        v, b, train=True, rngs=rngs, mutable=["batch_stats"],
        method=lambda m, bb, train: m.occ(bb, train=train))[0]["loss"])
    res["occ_subnet_train_fwd_ms"] = round(
        timeit(occ_fwd, v0, batch, iters=args.iters), 2)

    # occ targets chain alone, train mode
    def tgt_only(m, bb, train):
        spec = m.occ.spec
        import btcdet_tpu.models.occ.occ_targets as T  # noqa
        voxels = bb["occ_voxels"]
        vcoords = bb["occ_voxel_coords"]
        vnum = bb["occ_voxel_num_points"]
        from btcdet_tpu.utils import coords as coords_utils
        pts_abs = coords_utils.occ_uvd_to_absxyz(
            voxels[..., 0], voxels[..., 1], voxels[..., 2], spec.coord_type)
        occ_pnts = jnp.concatenate([pts_abs, voxels[..., 3:]], axis=-1)
        P = voxels.shape[1]
        slot = (jnp.arange(P)[None, :] < vnum[:, None]) & (vcoords[:, :1] >= 0)
        Bn = bb["gt_boxes"].shape[0]
        tgt = m.occ._make_targets(
            occ_pnts, slot, vcoords, bb["gt_boxes"],
            bb.get("box_mirr_flag"), bb, jnp.zeros((Bn,), jnp.float32),
            Bn, True)
        return tgt["general_cls_loss_mask_float"].sum() + tgt["res_mtrx"].sum()

    tgt_fn = jax.jit(lambda v, b: net.apply(
        v, b, train=True, rngs=rngs, method=tgt_only))
    res["occ_targets_train_ms"] = round(
        timeit(tgt_fn, v0, batch, iters=args.iters), 2)

    res["train_backward_ms_approx"] = round(
        res["train_step_ms"] - res["train_forward_ms"], 2)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(res, indent=1))
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
