"""Dissect the overfit-proof eval: per-frame detections, IoU vs gt,
duplicate analysis, and batch-size sensitivity (VERDICT r2 next #1).

    python tools/debug_overfit_eval.py [--batch_size 1] [--step 2000]

Loads the overfit run's checkpoint, runs the jitted eval forward over
the 10 memorized frames, and prints for every frame: number of valid
final dets, their scores, and the 3D IoU of each det against each gt —
so score-calibration, duplicate-survival, and batch-slot bugs are
directly visible instead of inferred from AP shapes.
"""

import argparse
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
os.chdir(REPO)
sys.path.insert(0, str(REPO))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--run_dir", type=str,
                    default="output/btcdet_overfit/overfit")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from btcdet_tpu.config import cfg, cfg_from_yaml_file
    from btcdet_tpu.datasets.kitti.kitti_dataset import KittiDataset
    from btcdet_tpu.datasets.loader import make_loader
    from btcdet_tpu.models import build_network
    from btcdet_tpu.ops import iou3d
    from btcdet_tpu.train import checkpoint as ckpt_mod
    from btcdet_tpu.train import eval_utils, trainer as trainer_mod
    from btcdet_tpu.utils.common import create_logger

    run = Path(args.run_dir)
    cfg_from_yaml_file(str(run / "btcdet_overfit.yaml"), cfg)
    logger = create_logger(None)

    dataset = KittiDataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES, training=False,
                           root_path=cfg.DATA_CONFIG.DATA_PATH, logger=logger)
    dl = make_loader(dataset, args.batch_size, shuffle=False, num_workers=0,
                     collate_fn=dataset.collate_batch)
    net = build_network(cfg.MODEL, cfg.DATA_CONFIG, cfg.CLASS_NAMES)

    example = next(iter(dl))
    jexample = {k: jnp.asarray(v) for k, v in example.items() if k != "frame_id"}
    state, _ = trainer_mod.create_train_state(
        net, jexample, jax.random.PRNGKey(0),
        det_opt_cfg=cfg.OPTIMIZATION,
        occ_opt_cfg=cfg.get("OCC_OPTIMIZATION", None), total_steps=1)
    mgr = ckpt_mod.CheckpointManager(run / "ckpt")
    state, step = mgr.restore(state, args.step)
    print(f"restored step {step}")
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    infer = eval_utils.make_infer(net, cfg.MODEL.POST_PROCESSING,
                                  len(cfg.CLASS_NAMES))

    det_annos = []
    for batch in dl:
        jbatch = {k: jnp.asarray(v) for k, v in batch.items() if k != "frame_id"}
        post = jax.device_get(infer(variables, jbatch))
        B = post["pred_boxes"].shape[0]
        for b in range(B):
            fid = batch["frame_id"][b]
            valid = post["pred_valid"][b].astype(bool)
            boxes = post["pred_boxes"][b][valid]
            scores = post["pred_scores"][b][valid]
            gt = np.asarray(batch["gt_boxes"][b])
            gt = gt[gt[:, 7] > 0][:, :7]
            print(f"\n=== frame {fid}  (slot {b}/{B})  "
                  f"n_det={len(boxes)} n_gt={len(gt)}")
            if len(boxes):
                iou = np.asarray(iou3d.boxes_iou3d(gt, boxes)) if len(gt) \
                    else np.zeros((0, len(boxes)))
                for j in range(len(boxes)):
                    col = iou[:, j] if len(gt) else []
                    best = float(col.max()) if len(gt) else -1.0
                    arg = int(col.argmax()) if len(gt) else -1
                    x, y, z = boxes[j, :3]
                    print(f"  det {j}: score={scores[j]:.4f} "
                          f"xyz=({x:.2f},{y:.2f},{z:.2f}) ry={boxes[j,6]:.2f} "
                          f"best_iou={best:.3f} vs gt{arg}")
                # det-vs-det IoU: duplicates that survived final NMS
                dd = np.asarray(iou3d.boxes_iou3d(boxes, boxes))
                np.fill_diagonal(dd, 0)
                if dd.max() > 0.05:
                    pairs = np.argwhere(dd > 0.05)
                    for a, c in pairs[pairs[:, 0] < pairs[:, 1]]:
                        print(f"  DUP: det{a}~det{c} iou={dd[a, c]:.3f}")
            pred_dicts = [{k: post[k][b] for k in
                           ("pred_boxes", "pred_scores", "pred_labels",
                            "pred_valid")}]
            det_annos += dataset.generate_prediction_dicts(
                {"frame_id": [fid]}, pred_dicts, cfg.CLASS_NAMES)

    result_str, result_dict, _ = dataset.evaluation(det_annos, cfg.CLASS_NAMES)
    print("\n" + result_str)


if __name__ == "__main__":
    main()
