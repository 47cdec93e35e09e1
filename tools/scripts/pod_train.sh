#!/usr/bin/env bash
# Multi-host TPU-pod training launcher (the reference's dist_train.sh /
# slurm_train.sh role). Run the SAME command on every host of the pod
# slice; the JAX distributed runtime discovers peers via the TPU
# metadata (no rendezvous flags needed on Cloud TPU), e.g.:
#
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all \
#     --command "cd btcdet_tpu && bash tools/scripts/pod_train.sh CFG [extra args]"
#
# Data parallelism runs over ICI within the slice; per-process batch =
# BATCH_SIZE_PER_GPU x local chip count.
set -euo pipefail
CFG=${1:-tools/cfgs/model_configs/btcdet_kitti_car.yaml}
shift || true
python tools/train.py --cfg_file "$CFG" "$@"
