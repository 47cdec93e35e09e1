#!/usr/bin/env bash
# Multi-host evaluation launcher (the reference's dist_test.sh role).
set -euo pipefail
CFG=${1:-tools/cfgs/model_configs/btcdet_kitti_car.yaml}
shift || true
python tools/test.py --cfg_file "$CFG" "$@"
