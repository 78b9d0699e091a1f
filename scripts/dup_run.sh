#!/bin/bash
# Repeat one training config with different seeds (reference dup_run_sbatch.sh:
# copies the config REPEAT times as -dupN and submits each; here each dup runs
# sequentially with MPA_SEED=N so the runs actually differ -- the reference
# relies on torch's unseeded init for that).
# Usage: REPEAT=3 ./scripts/dup_run.sh scripts/train.py job cfg_file [args...]

REPEAT=${REPEAT:-3}
PY_FILE=$1
JOB_NAME=$2
CFG=$3
shift 3

for i in $(seq 1 $REPEAT); do
    CKP_DIR="checkpoint/$(basename ${CFG%.py})-dup${i}"
    MPA_SEED=$i python "$PY_FILE" --cfg_file "$CFG" --ckp_dir "$CKP_DIR" "$@" \
        2>&1 | tee "${JOB_NAME}-dup${i}.log"
done
