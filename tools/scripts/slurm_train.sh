#!/usr/bin/env bash
# Slurm multi-host TPU training launcher (reference
# `tools/scripts/slurm_train.sh` role). One srun task per TPU host;
# jax.distributed.initialize() derives rank/world/coordinator from the
# SLURM_* environment -- no TCP port juggling needed.
#
#   bash tools/scripts/slurm_train.sh <partition> <job_name> <num_hosts> \
#        --cfg_file tools/cfgs/model_configs/btcdet_kitti_car.yaml [...]
set -euo pipefail

PARTITION=$1
JOB_NAME=$2
NUM_HOSTS=$3
PY_ARGS=${@:4}

CPUS_PER_TASK=${CPUS_PER_TASK:-16}
SRUN_ARGS=${SRUN_ARGS:-""}

srun -p ${PARTITION} \
    --job-name=${JOB_NAME} \
    --ntasks=${NUM_HOSTS} \
    --ntasks-per-node=1 \
    --cpus-per-task=${CPUS_PER_TASK} \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u tools/train.py --launcher slurm ${PY_ARGS}
