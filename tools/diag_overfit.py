"""Diagnose the overfit-proof recall gap: run the trained overfit
checkpoint on its own training frames and print, per gt box, the best
prediction / RoI IoU and score, to localize whether misses come from
the RPN proposals, the RCNN refinement, or scoring.

    python tools/diag_overfit.py
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from btcdet_tpu.config import cfg, cfg_from_yaml_file
from btcdet_tpu.datasets.kitti.kitti_dataset import KittiDataset
from btcdet_tpu.datasets.loader import make_loader
from btcdet_tpu.models import build_network
from btcdet_tpu.train import checkpoint as ckpt_mod
from btcdet_tpu.train import eval_utils, trainer as trainer_mod
from btcdet_tpu.ops import iou3d


def main():
    cfg_from_yaml_file("output/overfit/btcdet_overfit.yaml", cfg)
    ckpt_dir = "output/btcdet_overfit/overfit/ckpt"

    dataset = KittiDataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES, training=False,
                           root_path=cfg.DATA_CONFIG.DATA_PATH)
    dl = make_loader(dataset, int(os.environ.get("DIAG_BS","1")), shuffle=False, num_workers=1,
                     collate_fn=dataset.collate_batch)
    net = build_network(cfg.MODEL, cfg.DATA_CONFIG, cfg.CLASS_NAMES)
    example = next(iter(dl))
    example = {k: jnp.asarray(v) for k, v in example.items() if k != "frame_id"}
    state, _ = trainer_mod.create_train_state(
        net, example, jax.random.PRNGKey(0),
        det_opt_cfg=cfg.OPTIMIZATION,
        occ_opt_cfg=cfg.get("OCC_OPTIMIZATION", None), total_steps=1)
    mgr = ckpt_mod.CheckpointManager(ckpt_dir)
    step = mgr.latest_step()
    restored, _ = mgr.restore(state, step)
    print(f"ckpt step {step}", flush=True)
    variables = {"params": restored.params, "batch_stats": restored.batch_stats}
    infer = eval_utils.make_infer(net, cfg.MODEL.POST_PROCESSING,
                                  len(cfg.CLASS_NAMES))

    tot_gt = tot_m_pred = tot_m_roi = 0
    for batch in dl:
        jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "frame_id"}
        out = jax.device_get(infer(variables, jb))
        B = out["pred_boxes"].shape[0]
        for b in range(B):
            fid = batch.get("frame_id", ["?"] * B)[b]
            gt = np.asarray(batch["gt_boxes"])[b]
            gt = gt[np.abs(gt[:, 3]) > 1e-3]
            boxes = np.asarray(out["pred_boxes"])[b]
            scores = np.asarray(out["pred_scores"])[b]
            valid = np.asarray(out["pred_valid"])[b].astype(bool)
            rois = np.asarray(out["rois"])[b] if out.get("rois") is not None else None
            rv = (np.asarray(out["roi_valid"])[b].astype(bool)
                  if out.get("roi_valid") is not None else None)
            bl, sl = boxes[valid], scores[valid]
            print(f"\n== frame {fid} (b={b}): {len(gt)} gt, {valid.sum()} preds, "
                  f"{int(rv.sum()) if rv is not None else '?'} rois")
            if not len(gt):
                continue
            g7 = jnp.asarray(gt[:, :7], jnp.float32)
            ious = (np.asarray(iou3d.boxes_iou3d(g7, jnp.asarray(bl[:, :7], jnp.float32)))
                    if len(bl) else np.zeros((len(gt), 0)))
            riou = (np.asarray(iou3d.boxes_iou3d(g7, jnp.asarray(rois[rv][:, :7], jnp.float32)))
                    if rois is not None and rv.sum() else np.zeros((len(gt), 0)))
            for gi, g in enumerate(gt):
                bi = ious[gi].argmax() if ious.shape[1] else -1
                best = ious[gi, bi] if bi >= 0 else 0.0
                rbest = riou[gi].max() if riou.shape[1] else 0.0
                sc = sl[bi] if bi >= 0 else 0.0
                dry = (bl[bi, 6] - g[6]) if bi >= 0 else 0.0
                print(f"  gt{gi} xyz=({g[0]:6.1f},{g[1]:6.1f},{g[2]:5.1f}) "
                      f"roiIoU {rbest:.3f} | predIoU {best:.3f} score {sc:.3f} "
                      f"d_ry {np.mod(dry + np.pi, 2 * np.pi) - np.pi:+.2f}")
            tot_gt += len(gt)
            tot_m_pred += int((ious.max(axis=1) > 0.7).sum()) if ious.shape[1] else 0
            tot_m_roi += int((riou.max(axis=1) > 0.7).sum()) if riou.shape[1] else 0
            fp = [(round(float(sl[k]), 3), bl[k, :3].round(1).tolist())
                  for k in range(len(sl))
                  if (ious[:, k].max() if ious.shape[1] else 0) < 0.1 and sl[k] > 0.3]
            if fp:
                print(f"  high-score FPs (IoU<0.1): {fp[:6]}")
    print(f"\nTOTAL: gt {tot_gt}, roi matched@0.7 {tot_m_roi}, "
          f"pred matched@0.7 {tot_m_pred}")


if __name__ == "__main__":
    main()
