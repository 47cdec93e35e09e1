#!/usr/bin/env bash
# One-command KITTI-val parity run: import a reference BtcDet torch
# checkpoint and evaluate it on KITTI val with the official metric.
#
#   tools/run_kitti_val.sh <kitti_root> <reference.pth> [cfg_file] [batch_size]
#
# <kitti_root> must hold the standard layout (reference README.md:90-110):
#   ImageSets/{train,val}.txt  training/{velodyne,calib,label_2[,planes]}
# Missing info pkls are generated in place (create_kitti_infos; reference
# kitti_dataset.py:463). The best-match db is NOT required: it feeds the
# train-time augmentor only (reference flow: tools/test.py:55-83 never
# touches it).
set -euo pipefail

KITTI_ROOT=${1:?usage: run_kitti_val.sh <kitti_root> <reference.pth> [cfg] [bs]}
REF_PTH=${2:?usage: run_kitti_val.sh <kitti_root> <reference.pth> [cfg] [bs]}
CFG=${3:-tools/cfgs/model_configs/btcdet_kitti_car.yaml}
BS=${4:-8}

cd "$(dirname "$0")/.."
OUT=output/kitti_val_parity
mkdir -p "$OUT"

if [ ! -f "$KITTI_ROOT/kitti_infos_val.pkl" ]; then
  echo "== generating kitti infos under $KITTI_ROOT =="
  python -m btcdet_tpu.datasets.kitti.kitti_infos "$KITTI_ROOT"
fi

echo "== importing reference checkpoint $REF_PTH =="
python tools/import_reference_ckpt.py --ckpt "$REF_PTH" --cfg_file "$CFG" \
  --out "$OUT/ckpt" --strict

echo "== evaluating on KITTI val =="
python tools/test.py --cfg_file "$CFG" --ckpt_dir "$OUT/ckpt" \
  --extra_tag kitti_val_parity --batch_size "$BS" \
  --set DATA_CONFIG.DATA_PATH "$KITTI_ROOT"

echo "== done: AP report in output/<tag>/kitti_val_parity/eval/ =="
