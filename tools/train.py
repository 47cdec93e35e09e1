"""Training CLI (reference `tools/train.py`).

Examples:
  python tools/train.py --cfg_file tools/cfgs/model_configs/btcdet_kitti_car.yaml
  python tools/train.py --cfg_file ... --synthetic --epochs 1 --steps 5   # smoke
  python tools/train.py --cfg_file ... --pre_occ ckpts/occ_run            # staged

Auto-resumes from the newest checkpoint in the output dir (reference
`train.py:157-163`); dual optimizers (det + occ) with OneCycle; orbax
checkpoints with rotation.
"""

import argparse
import datetime
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

# tests / CI force the backend via env (the axon TPU plugin overrides
# JAX_PLATFORMS, so only jax.config reliably selects CPU)
import os as _os
if _os.environ.get("BTCDET_PLATFORM"):
    jax.config.update("jax_platforms", _os.environ["BTCDET_PLATFORM"])
import jax.numpy as jnp
import numpy as np

from btcdet_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file, log_config_to_file
from btcdet_tpu.models import build_network
from btcdet_tpu.train import checkpoint as ckpt_mod
from btcdet_tpu.train import trainer as trainer_mod
from btcdet_tpu.utils.common import create_logger


def parse_config():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--cache_items", action="store_true",
                        help="memoize dataset items (deterministic-aug runs only)")
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--pre_occ", type=str, default=None,
                        help="load occ params only from this ckpt dir")
    parser.add_argument("--pre_det", type=str, default=None,
                        help="load det params only from this ckpt dir")
    parser.add_argument("--ckpt_save_interval", type=int, default=1)
    parser.add_argument("--max_ckpt_save_num", type=int, default=30)
    parser.add_argument("--set", dest="set_cfgs", nargs=argparse.REMAINDER, default=None)
    parser.add_argument("--synthetic", action="store_true",
                        help="train on synthetic data (no KITTI needed)")
    parser.add_argument("--steps", type=int, default=None,
                        help="cap steps per epoch (smoke tests)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--profile_steps", type=str, default=None,
                        help="capture a jax.profiler trace over steps A-B "
                             "(e.g. '10-15') into <output_dir>/profile")
    parser.add_argument("--vis_stride", type=int, default=0,
                        help="dump every Nth batch as a cloud .npy for "
                             "tools/visual_utils/visualize_pc.py (0=off)")
    parser.add_argument("--num_epochs_to_eval", type=int, default=30,
                        help="after training, eval this many newest "
                             "checkpoints on the val split (reference "
                             "train.py:202-222; 0=off, auto-off for "
                             "--synthetic)")
    parser.add_argument("--launcher", choices=["none", "pod", "slurm"],
                        default="none",
                        help="multi-host init: 'slurm'/'pod' call "
                             "jax.distributed.initialize() (auto-detects "
                             "SLURM_* env / Cloud TPU metadata) -- the "
                             "reference's init_dist_{pytorch,slurm} role")
    args = parser.parse_args()
    if args.launcher != "none":
        jax.distributed.initialize()

    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def make_dataloader(args, cfg, logger):
    if args.synthetic:
        from btcdet_tpu.datasets import make_synthetic_batch

        bs = args.batch_size or int(cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU)
        steps = args.steps or 10

        def loader(epoch):
            for i in range(steps):
                yield make_synthetic_batch(
                    cfg.DATA_CONFIG, batch_size=bs, num_points=16384,
                    num_gt=10, seed=epoch * 10000 + i,
                )

        return loader, steps, None

    from btcdet_tpu.datasets.kitti.kitti_dataset import KittiDataset

    dataset = KittiDataset(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, training=True,
        root_path=cfg.DATA_CONFIG.DATA_PATH, logger=logger,
    )
    bs = args.batch_size or int(cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU)
    from btcdet_tpu.datasets.loader import CachedDataset, make_loader

    ds_for_loader = dataset
    if args.cache_items:
        # sound only with stochastic augmentation disabled (overfit proof)
        ds_for_loader = CachedDataset(dataset)
        logger.info("item cache ON (deterministic __getitem__ assumed)")
    dl = make_loader(
        ds_for_loader, bs, shuffle=True,
        num_workers=0 if args.cache_items else args.workers,
        collate_fn=dataset.collate_batch, drop_last=True,
    )
    steps = args.steps or len(dl)

    def loader(epoch):
        dataset._epoch = epoch
        for i, b in enumerate(dl):
            if i >= steps:
                break
            yield b

    return loader, steps, dataset


def main():
    args, _ = parse_config()
    output_dir = Path("output") / cfg.TAG / args.extra_tag
    ckpt_dir = output_dir / "ckpt"
    output_dir.mkdir(parents=True, exist_ok=True)
    logger = create_logger(output_dir / ("train_%s.log" % datetime.datetime.now().strftime("%Y%m%d-%H%M%S")))
    log_config_to_file(cfg, logger=logger)
    # config snapshot into the run dir (reference train.py:113)
    import shutil
    shutil.copy(args.cfg_file, output_dir / Path(args.cfg_file).name)
    tb = None
    try:
        from torch.utils.tensorboard import SummaryWriter

        tb = SummaryWriter(str(output_dir / "tensorboard"))
    except Exception:
        logger.info("tensorboard unavailable; scalar logging to console only")

    epochs = args.epochs or int(cfg.OPTIMIZATION.NUM_EPOCHS)
    loader, steps_per_epoch, _ = make_dataloader(args, cfg, logger)
    total_steps = epochs * steps_per_epoch

    net = build_network(cfg.MODEL, cfg.DATA_CONFIG, cfg.CLASS_NAMES)
    example = next(iter(loader(0)))
    example = {k: jnp.asarray(v) for k, v in example.items() if k != "frame_id"}
    state, tx = trainer_mod.create_train_state(
        net, example, jax.random.PRNGKey(args.seed),
        det_opt_cfg=cfg.OPTIMIZATION,
        occ_opt_cfg=cfg.get("OCC_OPTIMIZATION", None),
        total_steps=total_steps,
    )
    n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(state.params))
    logger.info(f"model parameters: {n_params/1e6:.2f}M, total steps: {total_steps}")

    mgr = ckpt_mod.CheckpointManager(ckpt_dir, max_to_keep=args.max_ckpt_save_num)
    start_epoch = 0
    if args.pre_occ:
        state, n = ckpt_mod.load_partial(args.pre_occ, state, want_occ=True)
        logger.info(f"loaded {n} occ params from {args.pre_occ}")
    if args.pre_det:
        state, n = ckpt_mod.load_partial(args.pre_det, state, want_occ=False)
        logger.info(f"loaded {n} det params from {args.pre_det}")
    restored, step = mgr.restore(state)
    if restored is not None:
        state = restored
        start_epoch = step // steps_per_epoch
        logger.info(f"auto-resumed from step {step} (epoch {start_epoch})")

    frozen = trainer_mod.frozen_partitions(
        cfg.OPTIMIZATION, cfg.get("OCC_OPTIMIZATION", None)
    )
    if frozen:
        logger.info(f"frozen partitions (LR==0, backward skipped): {frozen}")
    step_fn = jax.jit(trainer_mod.make_train_step(net, tx, frozen=frozen))
    rng = jax.random.PRNGKey(args.seed + 1)

    # jax.profiler trace window (SURVEY.md §5.1: the reference has no
    # tracing; TPU build uses the XLA profiler -- view with tensorboard
    # or xprof on <output_dir>/profile)
    prof_lo = prof_hi = -1
    if args.profile_steps:
        lo_s, _, hi_s = args.profile_steps.partition("-")
        prof_lo, prof_hi = int(lo_s), int(hi_s or int(lo_s) + 1)

    cloud_dir = output_dir / "cloud"
    # occ-debug view dumps (reference add_occ_template.visualize:290-422,
    # gated by OCC_PNT_UPDATE.VIS; STEP_STRIDE = dump cadence)
    vis_cfg = cfg.MODEL.get("OCC", {}).get("OCC_PNT_UPDATE", {}).get("VIS", None)
    occ_vis_every = int(vis_cfg.get("STEP_STRIDE", 1000)) if vis_cfg else 0
    occ_vis_fwd = None
    if occ_vis_every:
        from btcdet_tpu.models.occ import occ_targets as occ_T
        from btcdet_tpu.utils import vis_utils
        occ_spec = occ_T.build_grid_spec(cfg.DATA_CONFIG)
        from btcdet_tpu.models.detectors.btcnet import VIS_MASK_KEYS
        _vis_keys = VIS_MASK_KEYS + ("probs", "occ_probs", "occ_points",
                                     "occ_points_mask")

        @jax.jit
        def occ_vis_fwd(v, b, r):
            # return ONLY the collector's keys: XLA then dead-code
            # eliminates the det subnet, and device_get stays small
            # (CLAUDE.md: tunnel transfer ~4.8 ms/MB)
            o = net.apply(v, b, train=True,
                          rngs={"sampling": r, "dropout": r},
                          mutable=["batch_stats"])[0]
            return {k: o[k] for k in _vis_keys if o.get(k) is not None}
    gstep_count = 0
    for epoch in range(start_epoch, epochs):
        for i, batch in enumerate(loader(epoch)):
            if gstep_count == prof_lo:
                jax.profiler.start_trace(str(output_dir / "profile"))
            jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "frame_id"}
            if args.vis_stride and i % args.vis_stride == 0:
                # training cloud dumps for tools/visual_utils/visualize_pc.py
                # (reference train_utils.py:153-154 pc_{epoch}_{iter}.npy)
                cloud_dir.mkdir(parents=True, exist_ok=True)
                d = {}
                if "points" in batch:
                    p = np.asarray(batch["points"][0])
                    d["gt_points"] = p[np.abs(p[:, :3]).sum(1) > 0][:, :3]
                if "bm_points" in batch:
                    bm = np.asarray(batch["bm_points"][0])
                    bmm = np.asarray(batch["bm_points_mask"][0]).astype(bool)
                    d["boxvoxel_center"] = bm[bmm][:, :3]
                if "gt_boxes" in batch:
                    gb = np.asarray(batch["gt_boxes"][0])
                    d["gt_boxes"] = gb[np.abs(gb[:, 3:6]).sum(1) > 0][:, :7]
                np.save(cloud_dir / f"pc_{epoch}_{i}.npy", d)
            state, metrics = step_fn(state, jb, rng)
            gstep_count += 1
            if occ_vis_fwd is not None and gstep_count % occ_vis_every == 0:
                vout = occ_vis_fwd(
                    {"params": state.params, "batch_stats": state.batch_stats},
                    jb, jax.random.fold_in(rng, gstep_count))
                vout = jax.device_get(vout)
                tb_imgs, pc = vis_utils.collect_occ_vis_clouds(
                    vout, batch, occ_spec, vis_cfg)
                if pc:
                    cloud_dir.mkdir(parents=True, exist_ok=True)
                    np.save(cloud_dir / f"occ_vis_{gstep_count}.npy", pc)
                if tb is not None:
                    for k, img in tb_imgs.items():
                        tb.add_image(f"occ/{k}", img, gstep_count,
                                     dataformats="HWC")
            if gstep_count == prof_hi:
                jax.device_get(metrics["loss"])  # sync before stopping
                jax.profiler.stop_trace()
                logger.info(f"profiler trace saved to {output_dir / 'profile'}")
            if i % 10 == 0 or args.steps:
                m = jax.device_get(metrics)
                msg = "  ".join(f"{k}={float(v):.4f}" for k, v in sorted(m.items()))
                logger.info(f"epoch {epoch} it {i}/{steps_per_epoch}  {msg}")
                if tb is not None:
                    gstep = epoch * steps_per_epoch + i
                    for k, v in m.items():
                        prefix = "occ/" if k.startswith("occ") else "train/"
                        tb.add_scalar(prefix + k, float(v), gstep)
        if (epoch + 1) % args.ckpt_save_interval == 0 or epoch == epochs - 1:
            mgr.save(int(state.step), state)
            logger.info(f"saved checkpoint at step {int(state.step)}")
    logger.info("training done")

    # trailing eval of the newest checkpoints on the val split
    # (reference train.py:202-222: always evaluates the last 30 epochs
    # after training via repeat_eval_ckpt)
    if args.num_epochs_to_eval > 0 and not args.synthetic:
        from btcdet_tpu.datasets.kitti.kitti_dataset import KittiDataset
        from btcdet_tpu.datasets.loader import make_loader
        from btcdet_tpu.train import eval_utils

        eval_dir = output_dir / "eval" / "eval_with_train"
        eval_dir.mkdir(parents=True, exist_ok=True)
        val_ds = KittiDataset(
            cfg.DATA_CONFIG, cfg.CLASS_NAMES, training=False,
            root_path=cfg.DATA_CONFIG.DATA_PATH, logger=logger,
        )
        bs = args.batch_size or int(cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU)
        vdl = make_loader(
            val_ds, bs, shuffle=False, num_workers=args.workers,
            collate_fn=val_ds.collate_batch,
        )
        steps = sorted(mgr.mgr.all_steps())[-args.num_epochs_to_eval:]
        best = {}
        # one jitted eval fn for all checkpoints (a per-checkpoint
        # closure would recompile the full model every iteration)
        infer_fn = eval_utils.make_infer(
            net, cfg.MODEL.POST_PROCESSING, len(cfg.CLASS_NAMES))
        for s in steps:
            restored, _ = mgr.restore(state, s)
            logger.info(f"eval_with_train: checkpoint step {s}")
            # per-checkpoint result dir (reference keeps epoch_N/val dirs)
            step_dir = eval_dir / f"step_{s}" / "val"
            step_dir.mkdir(parents=True, exist_ok=True)
            _, result_dict, _ = eval_utils.eval_one_epoch(
                net,
                {"params": restored.params, "batch_stats": restored.batch_stats},
                vdl, val_ds, cfg.MODEL.POST_PROCESSING, cfg.CLASS_NAMES,
                logger=logger, result_dir=step_dir,
                recall_thresh_list=cfg.MODEL.POST_PROCESSING.RECALL_THRESH_LIST,
                infer_fn=infer_fn,
            )
            for k, v in result_dict.items():
                if tb is not None and isinstance(v, (int, float)):
                    tb.add_scalar(f"eval/{k}", float(v), s)
                if k.endswith("_R40") and v > best.get(k, -1):
                    best[k] = v
                    logger.info(f"new best {k}: {v:.4f} (step {s})")
            with open(eval_dir / "eval_list_val.txt", "a") as f:
                f.write(f"{s}\n")
        logger.info(f"eval_with_train best results: {best}")


if __name__ == "__main__":
    main()
