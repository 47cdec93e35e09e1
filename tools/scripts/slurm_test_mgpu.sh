#!/usr/bin/env bash
# Slurm multi-host TPU evaluation (reference `slurm_test_mgpu.sh` role):
# every host evaluates its shard of the val split (--data_parallel),
# results merged on process 0.
#
#   bash tools/scripts/slurm_test_mgpu.sh <partition> <num_hosts> \
#        --cfg_file ... --eval_all [...]
set -euo pipefail

PARTITION=$1
NUM_HOSTS=$2
PY_ARGS=${@:3}

CPUS_PER_TASK=${CPUS_PER_TASK:-16}
SRUN_ARGS=${SRUN_ARGS:-""}

srun -p ${PARTITION} \
    --job-name=btcdet_eval \
    --ntasks=${NUM_HOSTS} \
    --ntasks-per-node=1 \
    --cpus-per-task=${CPUS_PER_TASK} \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u tools/test.py --launcher slurm --data_parallel ${PY_ARGS}
