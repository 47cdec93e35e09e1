"""Parity-risk study v2 (VERDICT r3 next #3): measure the AP deltas of
the two deliberate approximations (approx_max_k SA queries, bf16
activations) on a protocol that can actually SEE a delta.

The r3 study evaluated on the fully memorized overfit set, where every
configuration scored exactly 100.0 — a saturated metric has no
discriminative power. v2 uses a HELD-OUT split of a harder synthetic
tree (train != eval frames; size-jittered cars, range-dependent point
sparsity, unlabeled clutter blobs — synthetic_kitti.make_raw_kitti
hard=True) so the baseline lands in the discriminating 60-90 AP band
and a material approximation error shows up as a real AP shift.

    python tools/parity_study.py [--epochs 60] [--fresh]

Writes docs/runs/r4/parity_v2.json. Reference exact kernels this
quantifies against: ball/shell query
(`/root/reference/btcdet/ops/pointnet2/pointnet2_stack/src/ball_query_gpu.cu:16`),
f32 torch activations end-to-end.
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

WORK = REPO / "output" / "parity_v2"
RUN_DIR = REPO / "output" / "btcdet_parity_v2"  # cfg.TAG of written cfg
OUT_JSON = REPO / "docs" / "runs" / "r5" / "parity_v3.json"


def build_data(root: Path, n_frames=40, n_train=30, cars_per_frame=6,
               objects_per_frame=None, class_names=("Car",)):
    from btcdet_tpu.datasets import bestmatch
    from btcdet_tpu.datasets.kitti import kitti_infos
    from btcdet_tpu.datasets.synthetic_kitti import make_raw_kitti

    root.mkdir(parents=True, exist_ok=True)
    # x <= 26 m keeps gt bbox heights above the easy-difficulty 40 px
    # cut; 10 held-out frames x 6 cars = 60 gt, enough PR slots for the
    # 41-point AP to resolve deltas of ~1.7 AP
    make_raw_kitti(root, n_frames=n_frames, n_train=n_train, seed=11,
                   cars_per_frame=cars_per_frame, x_range=(8, 26),
                   y_range=(-8, 8), hard=True,
                   objects_per_frame=objects_per_frame)
    kitti_infos.create_kitti_infos(root, workers=2)
    bestmatch.create_best_match_db(root, class_names=class_names,
                                   splits=("train",))


def write_cfg(root: Path, out_cfg: Path,
              base_yaml="tools/cfgs/model_configs/btcdet_kitti_car.yaml",
              tag="btcdet_parity_v2"):
    """Flagship config rooted at the hard tree, val = held-out split.
    World aug stays ON (generalization run, not memorization); gt
    sampling stays off (the 6-car frames are already dense and the
    sampler's road-plane snap adds no difficulty here)."""
    import yaml

    from btcdet_tpu.config import cfg_from_yaml_file

    cfg = cfg_from_yaml_file(base_yaml)
    d = json.loads(json.dumps(cfg))
    dc = d["DATA_CONFIG"]
    dc.pop("_BASE_CONFIG_", None)
    dc["DATA_PATH"] = str(root)
    dc["DATA_SPLIT"] = {"train": "train", "test": "val"}
    dc["INFO_PATH"] = {"train": ["kitti_infos_train.pkl"],
                       "test": ["kitti_infos_val.pkl"]}
    dc["FOV_POINTS_ONLY"] = False
    dc["DATA_AUGMENTOR"]["DISABLE_AUG_LIST"] = ["gt_sampling"]
    d["MODEL"]["BACKBONE_3D"]["LEVEL_CAPACITIES"] = {
        "train": [36000, 26000, 13000, 10000],
        "test": [36000, 26000, 13000, 10000],
    }
    d["TAG"] = tag
    out_cfg.write_text(yaml.safe_dump(d, sort_keys=False))
    return out_cfg


def parse_aps(log: str):
    fams = {}
    for cls in ("Car", "Pedestrian", "Cyclist"):
        for fam in ("3d", "bev", "image", "aos"):
            m = re.findall(rf"({cls}_{fam}/\w+_R40)[=: ]+([0-9.]+)", log)
            for k, v in m:
                fams[k] = float(v)
    return fams


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--n_frames", type=int, default=100)
    ap.add_argument("--n_train", type=int, default=60)
    ap.add_argument("--cars", type=int, default=8,
                    help="cars per frame; v3 default gives 40 held-out "
                         "frames x 8 = 320 gt (VERDICT r4 next #3)")
    ap.add_argument("--three_classes", action="store_true",
                    help="held-out 3-class run (VERDICT r4 next #10): "
                         "4 Car + 3 Pedestrian + 3 Cyclist per frame on "
                         "btcdet_kitti_3classes.yaml")
    ap.add_argument("--seed", type=int, default=0,
                    help="train seed; seed!=0 runs land in parity_s<N> "
                         "tags and parity_v2_s<N>.json (noise-floor "
                         "estimate: same data, different init/order)")
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument("--skip_train", action="store_true",
                    help="reuse the existing checkpoint, only re-eval")
    args = ap.parse_args()

    stem = "parity3c" if args.three_classes else "parity"
    tag = stem if args.seed == 0 else f"{stem}_s{args.seed}"
    base = "parity3c_v1" if args.three_classes else "parity_v3"
    out_json = OUT_JSON.parent / (
        f"{base}.json" if args.seed == 0 else f"{base}_s{args.seed}.json")
    work = WORK.parent / ("parity3c" if args.three_classes else "parity_v3")
    if args.fresh:
        import shutil
        for p in (work, REPO / "output" / f"btcdet_{stem}"):
            if p.exists():
                shutil.rmtree(p)
    data_root = work / "data"
    if args.three_classes:
        objs = {"Car": 4, "Pedestrian": 3, "Cyclist": 3}
        classes = ("Car", "Pedestrian", "Cyclist")
        base_yaml = "tools/cfgs/model_configs/btcdet_kitti_3classes.yaml"
    else:
        objs = None
        classes = ("Car",)
        base_yaml = "tools/cfgs/model_configs/btcdet_kitti_car.yaml"
    if not (data_root / "kitti_infos_train.pkl").exists():
        print("building hard synthetic KITTI tree ...", flush=True)
        build_data(data_root, n_frames=args.n_frames, n_train=args.n_train,
                   cars_per_frame=args.cars, objects_per_frame=objs,
                   class_names=classes)
    cfg_path = write_cfg(data_root, work / f"btcdet_{stem}.yaml",
                         base_yaml=base_yaml, tag=f"btcdet_{stem}")
    globals()["WORK"] = work

    if not args.skip_train:
        cmd = [
            sys.executable, "tools/train.py",
            "--cfg_file", str(cfg_path),
            "--extra_tag", tag,
            "--seed", str(args.seed),
            "--epochs", str(args.epochs),
            "--batch_size", str(args.batch_size),
            "--workers", "2",
            # save every 20 epochs so a TPU-worker crash mid-run
            # resumes instead of restarting (train.py auto-resume)
            "--ckpt_save_interval", "20",
            "--max_ckpt_save_num", "3",
            "--num_epochs_to_eval", "0",
        ]
        print("running:", " ".join(cmd), flush=True)
        proc = subprocess.run(cmd, capture_output=True, text=True)
        (WORK / f"train_{tag}.log").write_text(proc.stdout + proc.stderr)
        if proc.returncode != 0:
            print((proc.stdout + proc.stderr)[-4000:])
            raise SystemExit(f"train failed rc={proc.returncode}")

    configs = [
        ("shipped", [], {}),
        # matched-population row (VERDICT r4 next #2): eval with the
        # train occ-point cap, isolating the reference's half-applied
        # EVAL_OCC_THRESH population shift from everything else
        ("shipped_cap2048",
         ["--set", "MODEL.OCC.PARAMS.EVAL_MAX_NUM_OCC_PNTS", "2048"], {}),
        ("exact_query", ["--set", "MODEL.ROI_HEAD.APPROX_QUERY", "False"], {}),
        ("f32", [], {"BTCDET_F32": "1"}),
    ]
    if args.three_classes:
        configs = [c for c in configs if c[0] in ("shipped", "shipped_cap2048")]
    results = {}
    for name, extra, env in configs:
        cmd = [
            sys.executable, "tools/test.py",
            "--cfg_file", str(cfg_path),
            "--extra_tag", tag,
            "--batch_size", str(args.batch_size),
            "--workers", "2",
        ] + extra
        e = dict(os.environ, **env)
        print(f"eval [{name}]:", " ".join(cmd), flush=True)
        proc = subprocess.run(cmd, capture_output=True, text=True, env=e)
        log = proc.stdout + proc.stderr
        (WORK / f"eval_{tag}_{name}.log").write_text(log)
        if proc.returncode != 0:
            print(log[-4000:])
            raise SystemExit(f"eval {name} failed rc={proc.returncode}")
        results[name] = parse_aps(log)
        print(name, json.dumps(results[name]), flush=True)

    out_json.parent.mkdir(parents=True, exist_ok=True)
    out_json.write_text(json.dumps({
        "protocol": {
            "frames": args.n_frames, "train_frames": args.n_train,
            "val_frames": args.n_frames - args.n_train,
            "objects_per_frame": objs or {"Car": args.cars},
            "hard": True, "epochs": args.epochs, "seed": args.seed,
        },
        "results": results,
    }, indent=1))
    print("wrote", out_json)


if __name__ == "__main__":
    main()
