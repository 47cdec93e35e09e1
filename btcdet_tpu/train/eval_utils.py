"""Evaluation loop + occ metrics (reference `tools/eval_utils/eval_utils.py`
and `detector3d_template.py:479-591`)."""

from __future__ import annotations

import pickle
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..models.detectors.btcnet import post_processing
from ..ops import iou3d


def _dump_cloud(cloud_dir: Path, batch_idx: int, batch: dict, post: dict):
    """Write a named point-set dict `.npy` per frame for
    tools/visual_utils/visualize_pc.py (reference cloud dumps,
    `eval_utils.py:119-120`)."""
    cloud_dir.mkdir(parents=True, exist_ok=True)
    B = post["pred_boxes"].shape[0]
    pts = batch.get("points")  # collated (M, 1+C) with batch column
    for b in range(B):
        d = {}
        if pts is not None:
            p = np.asarray(pts)
            d["gt_points"] = p[p[:, 0] == b][:, 1:4]
        if "occ_points" in post:
            op = np.asarray(post["occ_points"][b])
            om = np.asarray(post["occ_points_mask"][b]).astype(bool)
            d["addpnt_view"] = op[om][:, :3]
        if "gt_boxes" in batch:
            gb = np.asarray(batch["gt_boxes"][b])
            d["gt_boxes"] = gb[np.abs(gb[:, 3:6]).sum(1) > 0][:, :7]
        pv = np.asarray(post["pred_valid"][b]).astype(bool)
        d["pred_boxes"] = np.asarray(post["pred_boxes"][b])[pv][:, :7]
        d["pred_scores"] = np.asarray(post["pred_scores"][b])[pv]
        np.save(cloud_dir / f"pc_eval_{batch_idx}_{b}.npy", d)


def occ_match_stats(probs, targets, thresholds=(0.3, 0.5, 0.7)):
    """Voxel occupancy precision/recall/F1 at thresholds (reference
    `occ_post_processing:479` + `eval_utils.get_match_stats:23`)."""
    pos = np.asarray(targets["pos_mask"], bool)
    mask = np.asarray(targets["general_cls_loss_mask"], bool)
    p = np.asarray(probs)
    out = {}
    for t in thresholds:
        pred = (p > t) & mask
        tp = (pred & pos).sum()
        prec = tp / max(pred.sum(), 1)
        rec = tp / max((pos & mask).sum(), 1)
        f1 = 2 * prec * rec / max(prec + rec, 1e-9)
        out[f"occ_precision@{t}"] = float(prec)
        out[f"occ_recall@{t}"] = float(rec)
        out[f"occ_f1@{t}"] = float(f1)
    return out


def occ_box_coverage(occ_points, occ_mask, gt_boxes,
                     thresholds=tuple(t / 10.0 for t in range(1, 10))):
    """Per-occ-threshold gt-box coverage (reference `occ_post_processing`
    `detector3d_template.py:515-535`): for each threshold, the count of
    gt boxes containing at least one predicted occupancy point whose
    prob >= threshold. occ_points: (K, >=4) xyz+prob; gt_boxes: (M, 7+)
    zero-padded rows ignored."""
    from ..utils import box_utils

    gb = np.asarray(gt_boxes)
    gb = gb[np.abs(gb[:, 3:6]).sum(-1) > 0]
    pts = np.asarray(occ_points)[np.asarray(occ_mask).astype(bool)]
    out = {"box_num_sum": int(len(gb))}
    if len(gb) == 0 or len(pts) == 0:
        out["occ_box_num"] = [0] * len(thresholds)
        return out
    inbox = np.asarray(box_utils.points_in_boxes_mask(pts[:, :3], gb[:, :7]))
    prob = pts[:, 3]
    out["occ_box_num"] = [
        int(inbox[prob >= t].any(axis=0).sum()) for t in thresholds
    ]
    return out


def recall_record(pred_boxes, pred_valid, rois, roi_valid, gt_boxes, thresh_list):
    """roi/rcnn recall vs gt at IoU thresholds (reference
    `generate_recall_record:548`). All numpy, per frame."""
    out = {f"roi_{t}": 0 for t in thresh_list}
    out.update({f"rcnn_{t}": 0 for t in thresh_list})
    gt7 = gt_boxes[:, :7][gt_boxes[:, 7] > 0]
    out["gt"] = len(gt7)
    if len(gt7) == 0:
        return out
    if roi_valid.any():
        iou_roi = np.asarray(iou3d.boxes_iou3d(gt7, rois[roi_valid]))
        best = iou_roi.max(axis=1) if iou_roi.shape[1] else np.zeros(len(gt7))
        for t in thresh_list:
            out[f"roi_{t}"] = int((best > t).sum())
    if pred_valid.any():
        iou_rcnn = np.asarray(iou3d.boxes_iou3d(gt7, pred_boxes[pred_valid]))
        best = iou_rcnn.max(axis=1) if iou_rcnn.shape[1] else np.zeros(len(gt7))
        for t in thresh_list:
            out[f"rcnn_{t}"] = int((best > t).sum())
    return out


def make_infer(net, post_cfg, num_classes):
    """Jitted eval forward + post-processing. Build ONCE and pass as
    `infer_fn` when evaluating many checkpoints (tools/test.py
    --eval_all, tools/train.py trailing eval): a fresh closure per
    checkpoint would recompile the full model every time (~1-2 min on
    TPU each)."""

    @jax.jit
    def infer(variables, batch):
        out = net.apply(variables, batch, train=False)
        post = post_processing(out, post_cfg, num_classes)
        post["rois"] = out.get("rois")
        post["roi_valid"] = out.get("roi_valid")
        for k in ("occ_probs", "occ_pos_mask", "occ_cls_mask",
                  "occ_points", "occ_points_mask"):
            if k in out:
                post[k] = out[k]
        return post

    return infer


def eval_one_epoch(
    net, variables, dataloader, dataset, post_cfg, class_names,
    logger=None, result_dir=None, recall_thresh_list=(0.3, 0.5, 0.7),
    cloud_dir=None, vis_stride: int = 0, mesh=None, infer_fn=None,
):
    """reference `eval_one_epoch:41`. dataloader yields collated batches.

    `mesh`: optional jax.sharding.Mesh with a 'dp' axis — batches are
    sharded over it and inference runs data-parallel (the reference's
    DDP eval, `eval_utils.py:77-83`, without the filesystem gather:
    results come back to the host already merged).

    When `cloud_dir` is set and `vis_stride > 0`, every vis_stride-th
    batch is dumped as a named point-set dict `.npy` (reference
    `eval_utils.py:119-120` cloud dumps) for
    tools/visual_utils/visualize_pc.py."""
    det_annos = []
    recall_dict = {}
    n_frames = 0
    t_start = time.time()

    infer = infer_fn if infer_fn is not None else make_infer(
        net, post_cfg, len(class_names))

    occ_stats_acc = {}
    cov_acc = {}
    batch_idx = -1
    for batch in dataloader:
        batch_idx += 1
        jbatch = {k: jnp.asarray(v) for k, v in batch.items() if k != "frame_id"}
        if mesh is not None:
            from . import trainer as _trainer
            jbatch = _trainer.shard_batch(jbatch, mesh)
        post = jax.device_get(infer(variables, jbatch))
        if cloud_dir is not None and vis_stride > 0 and batch_idx % vis_stride == 0:
            _dump_cloud(Path(cloud_dir), batch_idx, batch, post)
        if "occ_probs" in post:
            stats = occ_match_stats(
                post["occ_probs"],
                {"pos_mask": post["occ_pos_mask"],
                 "general_cls_loss_mask": post["occ_cls_mask"]},
            )
            for k, v in stats.items():
                occ_stats_acc.setdefault(k, []).append(v)
        B = post["pred_boxes"].shape[0]
        n_frames += B
        pred_dicts = [
            {k: post[k][b] for k in ("pred_boxes", "pred_scores", "pred_labels", "pred_valid")}
            for b in range(B)
        ]
        batch_for_annos = {"frame_id": batch["frame_id"]}
        det_annos += dataset.generate_prediction_dicts(
            batch_for_annos, pred_dicts, class_names,
            output_path=result_dir,
        )
        if "gt_boxes" in batch and "occ_points" in post:
            # per-threshold box coverage (reference occ_post_processing)
            for b in range(B):
                cov = occ_box_coverage(
                    post["occ_points"][b], post["occ_points_mask"][b],
                    np.asarray(batch["gt_boxes"][b]))
                cov_acc["box_num_sum"] = cov_acc.get("box_num_sum", 0) + cov["box_num_sum"]
                prev = cov_acc.get("occ_box_num", [0] * len(cov["occ_box_num"]))
                cov_acc["occ_box_num"] = [a + c for a, c in zip(prev, cov["occ_box_num"])]
        if "gt_boxes" in batch:
            for b in range(B):
                rec = recall_record(
                    post["pred_boxes"][b], post["pred_valid"][b],
                    np.asarray(post["rois"][b]) if post["rois"] is not None else np.zeros((0, 7)),
                    np.asarray(post["roi_valid"][b]) if post["roi_valid"] is not None else np.zeros(0, bool),
                    np.asarray(batch["gt_boxes"][b]), recall_thresh_list,
                )
                for k, v in rec.items():
                    recall_dict[k] = recall_dict.get(k, 0) + v

    sec_per_example = (time.time() - t_start) / max(n_frames, 1)
    if logger:
        logger.info(f"eval: {n_frames} frames, {sec_per_example:.4f} s/frame")
        gt_cnt = max(recall_dict.get("gt", 1), 1)
        for t in recall_thresh_list:
            logger.info(
                f"recall_roi_{t}: {recall_dict.get(f'roi_{t}', 0) / gt_cnt:.4f}  "
                f"recall_rcnn_{t}: {recall_dict.get(f'rcnn_{t}', 0) / gt_cnt:.4f}"
            )
    # coverage-bucket difficulty axis (reference eval_utils.py:179
    # CVRG_RATES); needs kitti_cvrg_infos_* gt annos
    result_str, result_dict, pr_rc_details = dataset.evaluation(
        det_annos, class_names,
        coverage_rates=post_cfg.get("CVRG_RATES", None),
    )
    if result_dir is not None and pr_rc_details:
        # PR-curve detail export read by visualize_pcrc_curve.py
        # (reference eval_utils.py:175-192 pc_rc.pkl)
        with open(Path(result_dir) / "pc_rc.pkl", "wb") as f:
            pickle.dump(pr_rc_details, f)
    result_dict["sec_per_example"] = sec_per_example
    result_dict["frames_per_sec"] = 1.0 / max(sec_per_example, 1e-9)
    for k, vals in occ_stats_acc.items():
        result_dict[k] = float(np.mean(vals))
    if cov_acc.get("box_num_sum", 0) > 0:
        for i, n in enumerate(cov_acc["occ_box_num"]):
            result_dict[f"occ_box_cvrg@{(i + 1) / 10:.1f}"] = (
                n / cov_acc["box_num_sum"])
    if logger:
        logger.info("\n" + result_str)
    return result_str, result_dict, det_annos
