"""Overfit-to-convergence proof through the FULL CLI stack (VERDICT r1
next #6): the 20-step soak shows the loss decreases; this shows the
loss/target plumbing can actually SOLVE the task.

Pipeline: synthetic on-disk KITTI tree -> create_kitti_infos ->
create_groundtruth_database -> best-match db -> tools/train.py (real
dataloader + augmentor, world aug disabled so frames are memorizable)
-> trailing eval on the SAME frames through eval_one_epoch ->
kitti_eval official AP. Success = near-zero loss and high AP on the
memorized frames.

    python tools/overfit_proof.py [--epochs 150] [--frames 25] [--fresh]

Results land in output/overfit/ and are summarized on stdout; record
them in docs/ROUND2.md.
"""

import argparse
import json
import os
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
os.chdir(REPO)
sys.path.insert(0, str(REPO))


def build_data(root: Path, n_frames: int, cars_per_frame: int = 4,
               class_names=("Car",)):
    from btcdet_tpu.datasets import bestmatch
    from btcdet_tpu.datasets.kitti import kitti_infos
    from btcdet_tpu.datasets.synthetic_kitti import make_raw_kitti

    root.mkdir(parents=True, exist_ok=True)
    # train == val == all frames: we overfit and evaluate on the same set.
    # The official get_thresholds() fills at most one PR slot per tp, so a
    # perfect detector on num_gt ground truths scores at most
    # ~num_gt/40*100 AP_R40: num_gt must be >= ~41 for the 41-point AP to
    # be able to reach 100 (reference eval.py get_thresholds/get_mAP_R40;
    # with r2's 10 frames x 2 cars the ceiling was 47.5 — the observed
    # 42.5 "failure" was this protocol artifact, not a model failure).
    # x <= 26 m keeps every gt's image bbox height > 40 px so no gt is
    # ignored at the 'easy' difficulty.
    objects = None
    if len(class_names) > 1:
        # multi-class proof (VERDICT r3 next #6): every class needs
        # >= ~41 gt for the 41-slot AP_R40 to be able to reach 100
        objects = {c: cars_per_frame for c in class_names}
    make_raw_kitti(root, n_frames=n_frames, n_train=n_frames, seed=7,
                   cars_per_frame=cars_per_frame, x_range=(8, 26),
                   objects_per_frame=objects)
    (root / "ImageSets" / "val.txt").write_text(
        (root / "ImageSets" / "train.txt").read_text())
    kitti_infos.create_kitti_infos(root, workers=2)
    bestmatch.create_best_match_db(root, class_names=class_names,
                                   splits=("train",))


def write_cfg(root: Path, out_cfg: Path, base_yaml: str =
              "tools/cfgs/model_configs/btcdet_kitti_car.yaml"):
    """Flagship config with the data rooted at the synthetic tree, val
    split = train split, and world augmentation disabled (memorization
    needs deterministic frames; the bm querier stays on for occ
    supervision)."""
    import yaml

    from btcdet_tpu.config import cfg_from_yaml_file

    cfg = cfg_from_yaml_file(base_yaml)
    d = json.loads(json.dumps(cfg))  # EasyDict -> plain dict
    dc = d["DATA_CONFIG"]
    dc.pop("_BASE_CONFIG_", None)
    dc["DATA_PATH"] = str(root)
    dc["DATA_SPLIT"] = {"train": "train", "test": "val"}
    dc["INFO_PATH"] = {"train": ["kitti_infos_train.pkl"],
                       "test": ["kitti_infos_val.pkl"]}
    dc["FOV_POINTS_ONLY"] = False
    dc["DATA_AUGMENTOR"]["DISABLE_AUG_LIST"] = [
        "gt_sampling", "random_world_flip", "random_world_rotation",
        "random_world_scaling",
    ]
    # the synthetic frames carry dense car interiors (4 cars/frame), so
    # their strided-conv active sets run ~30% past the KITTI-sized level
    # caps (stage probe: x_conv3 wants ~21.5k/frame vs the 16k test cap);
    # truncation drops the largest-y sites, which can eat planted cars.
    d["MODEL"]["BACKBONE_3D"]["LEVEL_CAPACITIES"] = {
        "train": [36000, 26000, 13000, 10000],
        "test": [36000, 26000, 13000, 10000],
    }
    out_cfg.write_text(yaml.safe_dump(d, sort_keys=False))
    return out_cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--cars_per_frame", type=int, default=4)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--fresh", action="store_true",
                    help="wipe previous overfit run first")
    ap.add_argument("--three_classes", action="store_true",
                    help="3-class proof on btcdet_kitti_3classes.yaml "
                         "(VERDICT r3 next #6)")
    args = ap.parse_args()

    if args.three_classes:
        tag = "overfit3"
        class_names = ("Car", "Pedestrian", "Cyclist")
        base_yaml = "tools/cfgs/model_configs/btcdet_kitti_3classes.yaml"
    else:
        tag = "overfit"
        class_names = ("Car",)
        base_yaml = "tools/cfgs/model_configs/btcdet_kitti_car.yaml"
    work = REPO / "output" / tag
    run_dir = REPO / "output" / f"btcdet_{tag}"  # cfg.TAG of the written cfg
    if args.fresh:
        import shutil
        # wipe BOTH the data work dir and the train run dir: train.py
        # auto-resumes from the newest ckpt, so a stale run dir silently
        # skips training (auto-resumed epoch >= --epochs) and evaluates
        # the old model on the new data
        for p in (work, run_dir):
            if p.exists():
                shutil.rmtree(p)
    data_root = work / "data"
    if not (data_root / "kitti_infos_train.pkl").exists():
        print("building synthetic KITTI tree ...", flush=True)
        build_data(data_root, args.frames, args.cars_per_frame, class_names)
    cfg_path = write_cfg(data_root, work / f"btcdet_{tag}.yaml", base_yaml)

    cmd = [
        sys.executable, "tools/train.py",
        "--cfg_file", str(cfg_path),
        "--extra_tag", "overfit",
        "--epochs", str(args.epochs),
        "--batch_size", str(args.batch_size),
        "--workers", "2",
        "--ckpt_save_interval", str(args.epochs),
        "--max_ckpt_save_num", "1",
        "--num_epochs_to_eval", "1",
        "--cache_items",  # aug disabled -> deterministic items
    ]
    print("running:", " ".join(cmd), flush=True)
    proc = subprocess.run(cmd, capture_output=True, text=True)
    log = proc.stdout + proc.stderr
    (work / "train_eval.log").write_text(log)
    if proc.returncode != 0:
        print(log[-4000:])
        raise SystemExit(f"train/eval failed rc={proc.returncode}")

    losses = [float(m) for m in re.findall(r"\bloss=([0-9.]+)", log)]
    aps = dict(re.findall(
        r"(\w+_(?:3d|bev|image|aos)/\w+_R40)[=: ]+([0-9.]+)", log))
    summary = {
        "epochs": args.epochs,
        "frames": args.frames,
        "classes": list(class_names),
        "cars_per_frame": args.cars_per_frame,
        "first_loss": losses[0] if losses else None,
        "final_loss": losses[-1] if losses else None,
        "min_loss": min(losses) if losses else None,
        "ap": {k: float(v) for k, v in aps.items()},
    }
    print(json.dumps(summary, indent=1))
    (work / "summary.json").write_text(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
