#!/bin/bash
# Launch a training job on a TPU VM / pod slice.
# TPU-native counterpart of the reference's sbatch_run.sh (SLURM job synthesis).
# Env knobs:
#   TPU_NAME       - tpu vm name (for gcloud ssh fanout; empty = run locally)
#   NUM_HOSTS      - number of hosts in the slice (default 1)
# Usage: ./scripts/tpu_run.sh scripts/train.py job_name --cfg_file configs/...py [...]

PY_FILE=$1
JOB_NAME=$2
shift 2

if [ -z "$TPU_NAME" ]; then
    # single-host: the mesh spans all local chips automatically
    python "$PY_FILE" "$@" 2>&1 | tee "${JOB_NAME}.log"
else
    # multi-host: run the same command on every host; jax.distributed
    # coordinates via the TPU runtime
    gcloud compute tpus tpu-vm ssh "$TPU_NAME" --worker=all \
        --command="cd $(pwd) && python $PY_FILE $*" 2>&1 | tee "${JOB_NAME}.log"
fi
