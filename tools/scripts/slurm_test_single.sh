#!/usr/bin/env bash
# Slurm single-host TPU evaluation (reference `slurm_test_single.sh`).
#
#   bash tools/scripts/slurm_test_single.sh <partition> --cfg_file ... [...]
set -euo pipefail

PARTITION=$1
PY_ARGS=${@:2}

CPUS_PER_TASK=${CPUS_PER_TASK:-16}
SRUN_ARGS=${SRUN_ARGS:-""}

srun -p ${PARTITION} \
    --job-name=btcdet_eval \
    --ntasks=1 \
    --cpus-per-task=${CPUS_PER_TASK} \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u tools/test.py ${PY_ARGS}
