"""Evaluation CLI (reference `tools/test.py`).

Single-checkpoint eval or `--eval_all` polling over a checkpoint dir,
tracking the per-class best-mAP incumbents (reference
`repeat_eval_ckpt:84`, `update_3d_map:141`).
"""

import argparse
import datetime
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

# tests / CI force the backend via env (the axon TPU plugin overrides
# JAX_PLATFORMS, so only jax.config reliably selects CPU)
import os as _os
if _os.environ.get("BTCDET_PLATFORM"):
    jax.config.update("jax_platforms", _os.environ["BTCDET_PLATFORM"])
import jax.numpy as jnp

from btcdet_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
from btcdet_tpu.models import build_network
from btcdet_tpu.train import checkpoint as ckpt_mod
from btcdet_tpu.train import eval_utils, trainer as trainer_mod
from btcdet_tpu.utils.common import create_logger


def parse_config():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--ckpt_dir", type=str, default=None)
    parser.add_argument("--eval_all", action="store_true")
    parser.add_argument("--max_waiting_mins", type=int, default=30)
    parser.add_argument("--save_to_file", action="store_true")
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard eval batches over all devices (dp mesh)")
    parser.add_argument("--vis_stride", type=int, default=0,
                        help="dump every Nth batch as a cloud .npy for "
                             "tools/visual_utils/visualize_pc.py (0=off)")
    parser.add_argument("--launcher", choices=["none", "pod", "slurm"],
                        default="none",
                        help="multi-host init via jax.distributed.initialize()")
    parser.add_argument("--set", dest="set_cfgs", nargs=argparse.REMAINDER, default=None)
    args = parser.parse_args()
    if args.launcher != "none":
        jax.distributed.initialize()
    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def build_eval(args, cfg, logger):
    from btcdet_tpu.datasets.kitti.kitti_dataset import KittiDataset
    from btcdet_tpu.datasets.loader import make_loader

    dataset = KittiDataset(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, training=False,
        root_path=cfg.DATA_CONFIG.DATA_PATH, logger=logger,
    )
    dl = make_loader(
        dataset, args.batch_size, shuffle=False,
        num_workers=args.workers, collate_fn=dataset.collate_batch,
    )
    net = build_network(cfg.MODEL, cfg.DATA_CONFIG, cfg.CLASS_NAMES)
    return net, dl, dataset


def eval_ckpt(net, dl, dataset, state, args, result_dir, logger, infer_fn=None):
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    mesh = None
    if args.data_parallel:
        from btcdet_tpu.parallel import make_mesh
        mesh = make_mesh(("dp",))
    return eval_utils.eval_one_epoch(
        net, variables, dl, dataset, cfg.MODEL.POST_PROCESSING, cfg.CLASS_NAMES,
        logger=logger,
        result_dir=result_dir if args.save_to_file else None,
        recall_thresh_list=cfg.MODEL.POST_PROCESSING.RECALL_THRESH_LIST,
        cloud_dir=(result_dir / "cloud") if args.vis_stride else None,
        vis_stride=args.vis_stride,
        mesh=mesh,
        infer_fn=infer_fn,
    )


class BestMapTracker:
    """Per-class / per-difficulty / per-metric best-mAP incumbents with
    step provenance (reference `update_3d_map`/`update_bev_map`,
    `tools/test.py:141-218` -- extended to all metric families and with
    the winning checkpoint recorded)."""

    FAMILIES = ("3d", "bev", "image", "aos")
    DIFFS = ("easy", "moderate", "hard")

    def __init__(self, class_names):
        self.class_names = list(class_names)
        self.best = {}  # key -> (value, step)

    def update(self, result_dict, step):
        improved = []
        for cls in self.class_names:
            for fam in self.FAMILIES:
                for diff in self.DIFFS:
                    for key in (f"{cls}_{fam}/{diff}_R40",
                                f"{cls}_{fam}/11R_{diff}"):
                        v = result_dict.get(key)
                        if v is None:
                            continue
                        cur = self.best.get(key, (-1.0, None))[0]
                        if v > cur:
                            self.best[key] = (float(v), step)
                            improved.append(key)
        return improved

    def summary(self):
        lines = []
        for fam in self.FAMILIES:
            for cls in self.class_names:
                row = []
                for metric in ("R40", "11R"):
                    for diff in self.DIFFS:
                        key = (f"{cls}_{fam}/{diff}_R40" if metric == "R40"
                               else f"{cls}_{fam}/11R_{diff}")
                        if key in self.best:
                            v, s = self.best[key]
                            row.append(f"{metric}_{diff}={v:.2f}@{s}")
                if row:
                    lines.append(f"best {cls}_{fam}: " + "  ".join(row))
        return "\n".join(lines)


def main():
    args, _ = parse_config()
    output_dir = Path("output") / cfg.TAG / args.extra_tag / "eval"
    output_dir.mkdir(parents=True, exist_ok=True)
    logger = create_logger(output_dir / ("eval_%s.log" % datetime.datetime.now().strftime("%Y%m%d-%H%M%S")))
    ckpt_dir = Path(args.ckpt_dir or (Path("output") / cfg.TAG / args.extra_tag / "ckpt"))

    net, dl, dataset = build_eval(args, cfg, logger)
    example = next(iter(dl))
    example = {k: jnp.asarray(v) for k, v in example.items() if k != "frame_id"}
    state, _ = trainer_mod.create_train_state(
        net, example, jax.random.PRNGKey(0),
        det_opt_cfg=cfg.OPTIMIZATION,
        occ_opt_cfg=cfg.get("OCC_OPTIMIZATION", None),
        total_steps=1,
    )

    mgr = ckpt_mod.CheckpointManager(ckpt_dir)
    evaluated = set()
    best = BestMapTracker(cfg.CLASS_NAMES)
    # one jitted eval fn across the --eval_all polling loop (per-ckpt
    # closures would recompile the full model every 30 s poll hit)
    infer_fn = eval_utils.make_infer(
        net, cfg.MODEL.POST_PROCESSING, len(cfg.CLASS_NAMES))
    wait_start = time.time()
    while True:
        step = mgr.latest_step()
        todo = (
            [s for s in (mgr.mgr.all_steps() if args.eval_all else [step])
             if s is not None and s not in evaluated]
        )
        if not todo:
            if not args.eval_all or time.time() - wait_start > args.max_waiting_mins * 60:
                break
            time.sleep(30)
            continue
        for s in sorted(todo):
            restored, _ = mgr.restore(state, s)
            logger.info(f"evaluating checkpoint step {s}")
            # per-checkpoint result dir (reference keeps epoch_N/val)
            step_dir = output_dir / f"step_{s}" / "val"
            if args.save_to_file or args.vis_stride:
                step_dir.mkdir(parents=True, exist_ok=True)
            result_str, result_dict, _ = eval_ckpt(
                net, dl, dataset, restored, args, step_dir, logger,
                infer_fn=infer_fn,
            )
            for k in best.update(result_dict, s):
                v, _ = best.best[k]
                logger.info(f"new best {k}: {v:.4f} (step {s})")
            evaluated.add(s)
            with open(output_dir / "eval_list_val.txt", "a") as f:
                f.write(f"{s}\n")  # reference test.py:86-88 eval record
            wait_start = time.time()
        if not args.eval_all:
            break
    summary = best.summary()
    if summary:
        logger.info("best results (value@step):\n" + summary)


if __name__ == "__main__":
    main()
